package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sinks.UpsertSink

/** Differential property sweep of the lake sink's merge: random batch
  * sequences — out-of-order and tied commit timestamps, D/U/I chains,
  * optional T9 seq columns, DDL barriers cutting batches into ordered
  * sub-slices, null values, replayed batch ids — drive [[UpsertSink]]
  * and an independently-written per-key model side by side, comparing
  * the materialized state after every batch.
  *
  * The shared spec both implement: a batch applies as ordered
  * (lower, upper] slices between DDL-ts barriers; within a slice, each
  * key's winner is the maximum of (commit_ts, seq, opRank D>U>I, value)
  * over incoming rows plus the materialized row (op I, seq −∞ when the
  * frame carries seq); a winning D removes the key, anything else
  * stores (ts, value). The model keeps plain per-key tuples and a
  * sort — none of the window/bucket/swap machinery whose bookkeeping
  * the implementation uses — so any divergence is a finding. */
class UpsertSinkPropSpec extends SparkSpec {

  private case class R(pk: Long, ts: Long, op: String, value: Option[Double],
    seq: Option[Long])

  private def opRank(op: String): Int =
    op match { case "D" => 2; case "U" => 1; case _ => 0 }

  /** Model state: pk -> (ts, value). */
  private def modelBatch(state: Map[Long, (Long, Option[Double])],
      rows: Seq[R], ddlTs: Seq[Long], hasSeq: Boolean):
      Map[Long, (Long, Option[Double])] = {
    val barriers = ddlTs.distinct.sorted :+ Long.MaxValue
    var st = state
    var lower = Long.MinValue
    barriers.foreach { upper =>
      val slice = rows.filter(r => r.ts > lower && r.ts <= upper)
      val byPk = slice.groupBy(_.pk)
      byPk.foreach { case (pk, incoming) =>
        val existing = st.get(pk).map { case (ts, v) =>
          R(pk, ts, "I", v, if (hasSeq) Some(Long.MinValue) else None) }
        // the impl coalesces a null incoming seq to MinValue + 1: above
        // the materialized row, below any real statement sequence
        def seqKey(r: R): Long =
          if (!hasSeq) 0L else r.seq.getOrElse(Long.MinValue + 1)
        val winner = (incoming ++ existing).maxBy(r =>
          (r.ts, seqKey(r), opRank(r.op),
            // value desc_nulls_last: null sorts below every real value
            r.value.isDefined, r.value.getOrElse(0.0)))
        if (winner.op == "D") st -= pk
        else st += pk -> ((winner.ts, winner.value))
      }
      lower = upper
    }
    st
  }

  private def frame(rows: Seq[R], ddlTs: Seq[Long], hasSeq: Boolean) = {
    val base = StructType(Seq(
      StructField("commit_ts", LongType), StructField("pk", LongType),
      StructField("op", StringType), StructField("value", DoubleType)))
    val schema = if (hasSeq) base.add(StructField("seq", LongType)) else base
    val data =
      rows.map(r => if (hasSeq)
          Row(r.ts, r.pk, r.op, r.value.map(Double.box).orNull,
            r.seq.map(Long.box).orNull)
        else Row(r.ts, r.pk, r.op, r.value.map(Double.box).orNull)) ++
      ddlTs.map(ts => if (hasSeq) Row(ts, 0L, "DDL", null, null)
                      else Row(ts, 0L, "DDL", null))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), schema)
  }

  private def runScenario(seed: Int): Unit = {
    val rnd = new Random(seed)
    val root = graft.util.Scratch.dir(s"graft_sink_prop_$seed")
    val nBuckets = 1 + rnd.nextInt(4)
    var sink = new UpsertSink(root, nBuckets)
    var model = Map.empty[Long, (Long, Option[Double])]
    var batchId = -1L
    val history = scala.collection.mutable.ArrayBuffer.empty[String]
    (1 to 3 + rnd.nextInt(2)).foreach { _ =>
      // a restart (fresh sink over the same root) must resume from the
      // pinned checkpoint + layout with no state effect
      if (rnd.nextInt(3) == 0) {
        history += "restart"
        sink = new UpsertSink(root, nBuckets)
      }
      // a crash between the swap renames leaves a bucket's ONLY copy at
      // the bucket_old name — healing on the next touch must restore it
      // transparently (state still equals the model afterwards)
      if (rnd.nextInt(3) == 0 && graft.util.MetaFs.exists(s"$root/state")) {
        val buckets = graft.util.MetaFs.listNames(s"$root/state")
          .filter(_.startsWith("bucket="))
        if (buckets.nonEmpty) {
          val b = buckets(rnd.nextInt(buckets.size)).stripPrefix("bucket=")
          history += s"crash-vacate bucket=$b"
          graft.util.MetaFs.rename(s"$root/state/bucket=$b", s"$root/bucket_old=$b")
        }
      }
      val hasSeq = rnd.nextBoolean()
      val rows = (0 until rnd.nextInt(16)).map { _ =>
        R(pk = 1 + rnd.nextInt(5),
          ts = 1 + rnd.nextInt(12), // small domain → frequent ts ties
          op = Seq("I", "U", "D")(rnd.nextInt(3)),
          value = if (rnd.nextInt(10) == 0) None
                  else Some((1 + rnd.nextInt(50)).toDouble),
          seq = if (!hasSeq) None
                else if (rnd.nextInt(8) == 0) None // stray null seq
                else Some(rnd.nextInt(6).toLong))
      }
      val ddlTs = (0 until rnd.nextInt(3)).map(_ => 1L + rnd.nextInt(12))
      val replay = batchId >= 0 && rnd.nextInt(4) == 0
      if (!replay) batchId += 1
      history += s"batch=$batchId hasSeq=$hasSeq replay=$replay " +
        s"ddl=$ddlTs rows=$rows"
      val applied = sink.applyBatch(frame(rows, ddlTs, hasSeq), batchId)
      assert(applied != replay,
        s"seed=$seed replay-skip mismatch\n${history.mkString("\n")}")
      if (!replay) model = modelBatch(model, rows, ddlTs, hasSeq)
      val got = sink.currentState(spark).collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
        .toMap
      assert(got == model,
        s"seed=$seed state diverged\nimpl=$got\nmodel=$model\nops:\n" +
          history.mkString("\n"))
    }
  }

  test("random batch sequences: materialized state matches the per-key model") {
    (1 to 10).foreach(runScenario)
  }
}
