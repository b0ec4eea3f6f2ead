package graft

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.sinks.{HistorySink, JdbcSchemaLoader, JdbcUpsertSink, UpsertSink}

/** ONE differential property sweep for EVERY sink apply path (the r18
  * verdict's ask: the four same-ts tie-break bugs survived r17 precisely
  * because only the lake sink had a randomized model sweep — the sibling
  * paths drifted unobserved).
  *
  * One generator produces random batch sequences — tied commit timestamps,
  * D/U/I chains, optional T9 seq, null values, DDL barriers cutting batches
  * into ordered sub-slices, replayed batch ids, restarts — and one
  * independently-written per-key model folds them; every path must land on
  * the model's state after every batch:
  *
  *  - [[UpsertSink]] (lake buckets + swap/heal machinery),
  *  - [[JdbcUpsertSink]] (the loader delegation through a real engine),
  *  - [[JdbcSchemaLoader]] merged path (catalog-keyed REPLACE fold),
  *  - [[JdbcSchemaLoader]] sequence path (per-DML causality replay,
  *    safe mode — requires the T9 seq, the mode's documented contract),
  *  - [[HistorySink]]'s CURRENT rows (the SCD2 open table).
  *
  * The shared spec: a batch applies as ordered (lower, upper] slices
  * between DDL-ts barriers; within a slice, each key's winner is the
  * maximum of (commit_ts, seq', opRank D>U>I, value) over incoming rows —
  * plus, for the lake sink, the materialized row (op I, seq −∞) — where a
  * null seq coalesces just above −∞; a winning D removes the key, anything
  * else stores (ts, value). The model keeps plain per-key tuples and a
  * sort — none of the window/bucket/checkpoint machinery the
  * implementations use — so any divergence is a finding.
  *
  * Two delivery modes, matching the paths' real contracts:
  *  - FREE order (late events, ts ties across batches): lake sink only —
  *    it alone merges against materialized state, so a late event loses to
  *    a newer stored row. Includes the crash-vacate injection (a bucket's
  *    only copy stranded at `bucket_old=`).
  *  - ORDERED delivery (each batch's ts strictly above the last — the
  *    drainer's ordered-merge guarantee every JDBC/history path assumes,
  *    like the reference loader): ALL paths, compared to the same model
  *    after every batch.
  */
class SinkSweepPropSpec extends SparkSpec {

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
        // the impls coalesce a null incoming seq to MinValue + 1: above
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

  // ---- path adapters: apply a frame, read the state back as the model's
  // ---- shape, survive a restart (fresh object over the same substrate)

  private trait Path {
    def name: String
    def apply(f: DataFrame, batchId: Long): Boolean
    def state(): Map[Long, (Long, Option[Double])]
    def restart(): Unit = ()
    /** Crash injection: the checkpoint write after batch `applied` was
      * LOST — the next delivery of that batch must replay (or, where a
      * second marker rode the state swap, skip) and converge to the same
      * state. Default: no durable point to regress. */
    def regressCheckpoint(applied: Long): Unit = ()
  }

  private def collectState(df: DataFrame): Map[Long, (Long, Option[Double])] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap

  /** Regress a Derby-held checkpoint row to `applied - 1` — the state a
    * crash between the apply and the checkpoint save leaves behind. */
  private def regressDerby(url: String, applied: Long): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.prepareStatement(
        "UPDATE GRAFT_CHECKPOINT SET BATCH_ID = ? WHERE CLUSTER_ID = 1")
      st.setLong(1, applied - 1)
      st.executeUpdate(); st.close()
    } finally c.close()
  }

  private class LakePath(root: String, nBuckets: Int) extends Path {
    private var sink = new UpsertSink(root, nBuckets)
    def name = "lake"
    def apply(f: DataFrame, id: Long) = sink.applyBatch(f, id)
    def state() = collectState(sink.currentState(spark))
    override def restart(): Unit = sink = new UpsertSink(root, nBuckets)
    override def regressCheckpoint(applied: Long): Unit =
      graft.util.MetaFs.writeString(s"$root/_committed_batch",
        s"${applied - 1} -1 -1 true")
  }

  private class JdbcPath(url: String) extends Path {
    private var sink = new JdbcUpsertSink(url, applyPartitions = 4)
    def name = "jdbc"
    def apply(f: DataFrame, id: Long) = sink.applyBatch(f, id)
    def state() = collectState(sink.currentState(spark))
    override def restart(): Unit =
      sink = new JdbcUpsertSink(url, applyPartitions = 4)
    override def regressCheckpoint(applied: Long): Unit =
      regressDerby(url, applied)
  }

  private class LoaderPath(url: String, merge: Boolean) extends Path {
    private var loader = new JdbcSchemaLoader(url, applyPartitions = 4)
    loader.createTable(
      "CREATE TABLE SWEEP (PK BIGINT PRIMARY KEY, COMMIT_TS BIGINT, VAL DOUBLE)")
    def name = if (merge) "loader-merged" else "loader-seq"
    def apply(f: DataFrame, id: Long) =
      loader.applyBatch(Map("SWEEP" -> f.withColumnRenamed("value", "val")),
        id, merge = merge, safeMode = !merge)
    def state() = collectState(
      loader.readTable(spark, "SWEEP", Some("PK"))
        .select("PK", "COMMIT_TS", "VAL"))
    override def restart(): Unit =
      loader = new JdbcSchemaLoader(url, applyPartitions = 4)
    override def regressCheckpoint(applied: Long): Unit =
      regressDerby(url, applied)
  }

  private class HistoryPath(root: String) extends Path {
    import org.apache.spark.sql.functions.col
    private var sink = new HistorySink(root)
    def name = "history"
    // DDL rows are outside the history sink's contract (barriers have no
    // interval meaning) — the generator's barrier-only rows drop here
    def apply(f: DataFrame, id: Long) =
      sink.applyBatch(f.filter(col("op") =!= "DDL"), id)
    def state() = collectState(sink.history(spark)
      .filter(col("is_current")).select("pk", "valid_from", "value"))
    override def restart(): Unit = sink = new HistorySink(root)

    /** Crash injection: a torn closed write for the UPCOMING (uncommitted)
      * batch — a poison row left under `closed/batch=<id>` where the crash
      * interrupted the append. The idempotent overwrite contract must
      * clobber it on the (re)apply; [[assertNoPoison]] proves it did. */
    def injectTornClosed(id: Long): Unit = {
      val poison = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(999L, -1L, -1L, 0.0)), 1),
        StructType(Seq(StructField("pk", LongType),
          StructField("valid_from", LongType), StructField("valid_to", LongType),
          StructField("value", DoubleType))))
      poison.write.mode("overwrite").parquet(s"$root/closed/batch=$id")
    }
    def assertNoPoison(ctx: => String): Unit =
      assert(sink.history(spark).filter(col("pk") === 999L).isEmpty,
        s"torn closed write survived the replay overwrite\n$ctx")
    // the batch marker RIDES the open swap here, so a lost ROOT marker
    // must make the re-delivery a SKIP (replaying against the advanced
    // open table would append inverted intervals) — convergence is the
    // assertion either way
    override def regressCheckpoint(applied: Long): Unit =
      graft.util.MetaFs.writeString(s"$root/_committed_batch",
        (applied - 1).toString)
  }

  // ---- FREE delivery order: the lake sink's contract (merge against
  // ---- materialized state; late events lose), with crash injection

  private def runFreeScenario(seed: Int): Unit = {
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
      val got = collectState(sink.currentState(spark))
      assert(got == model,
        s"seed=$seed state diverged\nimpl=$got\nmodel=$model\nops:\n" +
          history.mkString("\n"))
    }
  }

  // ---- ORDERED delivery: every apply path against the one model

  private def runOrderedScenario(seed: Int): Unit = {
    val rnd = new Random(seed)
    // seq presence is per SCENARIO: the sequence path's contract REQUIRES
    // the T9 seq (without it, same-ts statements have no defined statement
    // order to preserve — it replays them in content-hash order, which no
    // model can and should predict), so no-seq scenarios drive 4 paths
    val hasSeq = rnd.nextBoolean()
    val historyPath = new HistoryPath(graft.util.Scratch.dir(s"graft_sweep_hist_$seed"))
    val paths: Seq[Path] = Seq(
      new LakePath(graft.util.Scratch.dir(s"graft_sweep_lake_$seed"),
        1 + rnd.nextInt(4)),
      new JdbcPath(graft.util.Scratch.derbyMemUrl(s"graft_sweep_j_$seed")),
      new LoaderPath(graft.util.Scratch.derbyMemUrl(s"graft_sweep_m_$seed"),
        merge = true)) ++
      (if (hasSeq)
        Seq(new LoaderPath(graft.util.Scratch.derbyMemUrl(s"graft_sweep_s_$seed"),
          merge = false))
       else Nil) :+ historyPath
    var model = Map.empty[Long, (Long, Option[Double])]
    var batchId = -1L
    val history = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until 3 + rnd.nextInt(2)).foreach { k =>
      if (rnd.nextInt(3) == 0) { history += "restart"; paths.foreach(_.restart()) }
      // ordered delivery: batch k's timestamps sit strictly above batch
      // k-1's (the drainer's ordered merge) — ties stay COMMON within a
      // batch (one txn's statements share a commit ts)
      val base = k * 100L
      val raw = (0 until rnd.nextInt(16)).map { _ =>
        R(pk = 1 + rnd.nextInt(5),
          ts = base + 1 + rnd.nextInt(12),
          op = Seq("I", "U", "D")(rnd.nextInt(3)),
          value = if (rnd.nextInt(10) == 0) None
                  else Some((1 + rnd.nextInt(50)).toDouble),
          seq = None)
      }
      // the T9 seq is the statement order WITHIN a (pk, ts) txn chain:
      // unique per chain (generation order), at most one leading null —
      // exactly what a wire that restored the sequence carries
      val rows = if (!hasSeq) raw else
        raw.groupBy(r => (r.pk, r.ts)).valuesIterator.flatMap { chain =>
          chain.zipWithIndex.map { case (r, i) =>
            r.copy(seq = if (i == 0 && rnd.nextInt(8) == 0) None
                         else Some(i.toLong))
          }
        }.toSeq
      val ddlTs = (0 until rnd.nextInt(3)).map(_ => base + 1 + rnd.nextInt(12))
      val replay = batchId >= 0 && rnd.nextInt(4) == 0
      if (!replay) batchId += 1
      // a torn closed write can only exist for a batch whose marker never
      // advanced — i.e. a FRESH id about to (re)apply — and only for a
      // batch that writes closed rows at all (an empty batch advances the
      // marker without touching the closed table)
      if (!replay && rows.nonEmpty && rnd.nextInt(3) == 0) {
        history += s"torn-closed batch=$batchId"
        historyPath.injectTornClosed(batchId)
      }
      history += s"batch=$batchId hasSeq=$hasSeq replay=$replay " +
        s"ddl=$ddlTs rows=$rows"
      val f = frame(rows, ddlTs, hasSeq)
      paths.foreach { p =>
        val applied = p.apply(f, batchId)
        assert(applied != replay,
          s"seed=$seed path=${p.name} replay-skip mismatch\n" +
            history.mkString("\n"))
      }
      historyPath.assertNoPoison(s"seed=$seed\n${history.mkString("\n")}")
      if (!replay) model = modelBatch(model, rows, ddlTs, hasSeq)
      paths.foreach { p =>
        val got = p.state()
        assert(got == model,
          s"seed=$seed path=${p.name} state diverged\nimpl=$got\n" +
            s"model=$model\nops:\n${history.mkString("\n")}")
      }
      // crash between the apply and the checkpoint save: the durable point
      // regresses to batchId-1 and the SAME batch is delivered again —
      // every path must converge (a full replay for the REPLACE/merge
      // paths, a ride-along-marker skip for the history sink)
      if (!replay && rnd.nextInt(4) == 0) {
        history += s"lost-checkpoint redelivery batch=$batchId"
        paths.foreach(_.regressCheckpoint(batchId))
        paths.foreach { p => p.apply(f, batchId): Unit }
        paths.foreach { p =>
          val got = p.state()
          assert(got == model,
            s"seed=$seed path=${p.name} lost-checkpoint replay diverged\n" +
              s"impl=$got\nmodel=$model\nops:\n${history.mkString("\n")}")
        }
      }
    }
  }

  // ---- ORDERED delivery with mid-batch schema-CHANGE barriers: an ALTER
  // ---- that ADDs or DROPs a payload column between two DML sub-slices of
  // ---- one batch (ref: pkg/loader/load.go:845-866 — DDL flushes, runs
  // ---- alone, later DML sees the new shape), driven through the three
  // ---- delegated loader paths (JdbcUpsertSink, loader-merged, loader-seq)

  private sealed trait BKind
  private case object PlainB extends BKind
  private case class AddExtra(default: Option[Double]) extends BKind
  private case object DropExtra extends BKind

  private def sqlFor(kind: BKind, table: String): Option[String] = kind match {
    case PlainB => None
    case AddExtra(None) => Some(s"ALTER TABLE $table ADD COLUMN EXTRA DOUBLE")
    case AddExtra(Some(d)) =>
      Some(s"ALTER TABLE $table ADD COLUMN EXTRA DOUBLE DEFAULT $d")
    case DropExtra => Some(s"ALTER TABLE $table DROP COLUMN EXTRA")
  }

  private case class XR(pk: Long, ts: Long, op: String, value: Option[Double],
    seq: Option[Long], extra: Option[Double])

  /** pk -> (commit_ts, value, extra-while-the-column-exists). */
  private type ExtState = Map[Long, (Long, Option[Double], Option[Double])]

  /** One batch through the barrier-sliced model: per (key, slice) winner by
    * the shared merge order extended with the extra payload column; an
    * AddExtra barrier makes the column live — DEFAULT-FILLING every stored
    * row, the engine's ADD COLUMN semantics — and a DropExtra kills the
    * column and its data. `colExists` threads across batches: a winner
    * stored while the column does not exist yet keeps extra = None no
    * matter what its frame slot carried (the catalog∩frame column list). */
  private def extModelBatch(state: ExtState, rows: Seq[XR],
      barriers: Seq[(Long, BKind)], hasSeq: Boolean,
      colExists0: Boolean): (ExtState, Boolean) = {
    var colExists = colExists0
    var st = state
    var lower = Long.MinValue
    (barriers.sortBy(_._1) :+ ((Long.MaxValue, PlainB: BKind))).foreach {
      case (upper, kind) =>
        val slice = rows.filter(r => r.ts > lower && r.ts <= upper)
        slice.groupBy(_.pk).foreach { case (pk, incoming) =>
          def seqKey(r: XR): Long =
            if (!hasSeq) 0L else r.seq.getOrElse(Long.MinValue + 1)
          val w = incoming.maxBy(r => (r.ts, seqKey(r), opRank(r.op),
            r.value.isDefined, r.value.getOrElse(0.0),
            r.extra.isDefined, r.extra.getOrElse(0.0)))
          if (w.op == "D") st -= pk
          else st += pk -> ((w.ts, w.value, if (colExists) w.extra else None))
        }
        kind match {
          case AddExtra(d) =>
            colExists = true
            st = st.map { case (k, (t, v, _)) => k -> ((t, v, d)) }
          case DropExtra =>
            colExists = false
            st = st.map { case (k, (t, v, _)) => k -> ((t, v, None)) }
          case PlainB => ()
        }
        lower = upper
    }
    (st, colExists)
  }

  private def extFrame(rows: Seq[XR], barriers: Seq[(Long, Option[String])],
      hasSeq: Boolean, hasExtra: Boolean, valName: String): DataFrame = {
    val fields = Seq(
      StructField("commit_ts", LongType), StructField("pk", LongType),
      StructField("op", StringType), StructField(valName, DoubleType)) ++
      (if (hasSeq) Seq(StructField("seq", LongType)) else Nil) ++
      (if (hasExtra) Seq(StructField("extra", DoubleType)) else Nil) :+
      StructField("ddl_sql", StringType)
    val data = rows.map(r => Row.fromSeq(
        Seq(r.ts, r.pk, r.op, r.value.map(Double.box).orNull) ++
        (if (hasSeq) Seq(r.seq.map(Long.box).orNull) else Nil) ++
        (if (hasExtra) Seq(r.extra.map(Double.box).orNull) else Nil) :+ null)) ++
      barriers.map { case (ts, sql) => Row.fromSeq(
        Seq(ts, 0L, "DDL", null) ++
        (if (hasSeq) Seq(null) else Nil) ++
        (if (hasExtra) Seq(null) else Nil) :+ sql.orNull) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2), StructType(fields))
  }

  private trait ExtPath {
    def name: String; def table: String; def valName: String; def url: String
    def apply(f: DataFrame, id: Long): Boolean
    /** Read the table's CURRENT shape back — extra present only while the
      * column exists in the live catalog. */
    def state(): ExtState = {
      val df = new JdbcSchemaLoader(url, applyPartitions = 4)
        .readTable(spark, table, Some("PK"))
      val hasExtra = df.columns.contains("EXTRA")
      df.collect().map { r =>
        r.getAs[Long]("PK") -> ((r.getAs[Long]("COMMIT_TS"),
          Option(r.getAs[java.lang.Double]("VAL")).map(_.doubleValue()),
          if (hasExtra)
            Option(r.getAs[java.lang.Double]("EXTRA")).map(_.doubleValue())
          else None))
      }.toMap
    }
  }

  private class ExtJdbc(val url: String) extends ExtPath {
    val table = "GRAFT_STATE"; val valName = "value"; val name = "jdbc"
    private val sink = new JdbcUpsertSink(url, applyPartitions = 4)
    def apply(f: DataFrame, id: Long): Boolean = sink.applyBatch(f, id)
  }

  private class ExtLoader(val url: String, merge: Boolean) extends ExtPath {
    val table = "SWEEP"; val valName = "val"
    val name = if (merge) "loader-merged" else "loader-seq"
    private val loader = new JdbcSchemaLoader(url, applyPartitions = 4)
    loader.createTable(
      "CREATE TABLE SWEEP (PK BIGINT PRIMARY KEY, COMMIT_TS BIGINT, VAL DOUBLE)")
    def apply(f: DataFrame, id: Long): Boolean =
      loader.applyBatch(Map("SWEEP" -> f), id, merge = merge, safeMode = !merge)
  }

  /** Returns coverage flags: (add-with-default scenario, drop fired,
    * same-batch add+drop fired, seq path driven). */
  private def runSchemaChangeScenario(seed: Int): (Boolean, Boolean, Boolean, Boolean) = {
    val rnd = new Random(seed)
    val hasSeq = rnd.nextBoolean()
    val paths: Seq[ExtPath] = Seq(
      new ExtJdbc(graft.util.Scratch.derbyMemUrl(s"graft_ddlswp_j_$seed")),
      new ExtLoader(graft.util.Scratch.derbyMemUrl(s"graft_ddlswp_m_$seed"),
        merge = true)) ++
      (if (hasSeq)
        Seq(new ExtLoader(graft.util.Scratch.derbyMemUrl(s"graft_ddlswp_s_$seed"),
          merge = false))
       else Nil)
    val nBatches = 4
    val addBatch = rnd.nextInt(3)
    // seed-pinned (not drawn) so 10 seeds provably cover both arms
    val withDefault = seed % 2 == 0
    val sameBatchDrop = seed % 5 == 0 || rnd.nextInt(4) == 0
    val dropBatch: Option[Int] =
      if (sameBatchDrop) Some(addBatch)
      else if (rnd.nextBoolean() && addBatch < nBatches - 1)
        Some(addBatch + 1 + rnd.nextInt(nBatches - addBatch - 1))
      else None
    var model: ExtState = Map.empty
    var colExists = false
    var batchId = -1L
    val history = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until nBatches).foreach { k =>
      val base = k * 100L
      val frameHasExtra = k >= addBatch
      val raw = (0 until 2 + rnd.nextInt(14)).map { _ =>
        XR(pk = 1 + rnd.nextInt(5), ts = base + 1 + rnd.nextInt(12),
          op = Seq("I", "U", "D")(rnd.nextInt(3)),
          value = if (rnd.nextInt(10) == 0) None
                  else Some((1 + rnd.nextInt(50)).toDouble),
          seq = None,
          // pre-ADD-barrier rows CARRY non-null extra slots on purpose:
          // the catalog∩frame column list must drop them on first apply
          // AND keep them dropped on a redelivery after the ALTER ran
          extra = if (!frameHasExtra) None
                  else if (rnd.nextInt(5) == 0) None
                  else Some((1 + rnd.nextInt(30)).toDouble))
      }
      val rows = if (!hasSeq) raw else
        raw.groupBy(r => (r.pk, r.ts)).valuesIterator.flatMap { chain =>
          chain.zipWithIndex.map { case (r, i) =>
            r.copy(seq = if (i == 0 && rnd.nextInt(8) == 0) None
                         else Some(i.toLong)) }
        }.toSeq
      // distinct barrier timestamps; a same-batch add+drop orders ADD first
      val tsPool = rnd.shuffle((1 to 12).toList).map(base + _)
      var nextTs = 0
      def drawTs(): Long = { val t = tsPool(nextTs); nextTs += 1; t }
      val plainB = (0 until rnd.nextInt(2)).map(_ => (drawTs(), PlainB: BKind))
      val addB = if (k == addBatch)
        Seq((drawTs(), AddExtra(if (withDefault) Some(7.5) else None): BKind))
      else Nil
      val dropB = if (dropBatch.contains(k)) Seq((drawTs(), DropExtra: BKind))
                  else Nil
      val barriers = (addB ++ dropB) match {
        case Seq((a, ak), (d, dk)) if a > d => plainB ++ Seq((d, ak), (a, dk))
        case other => plainB ++ other
      }
      // schema-change batches never arrive as stale-id replays: a skipped
      // ALTER would just degrade the rest of the scenario's coverage
      val replay = batchId >= 0 && k != addBatch && !dropBatch.contains(k) &&
        rnd.nextInt(5) == 0
      if (!replay) batchId += 1
      history += s"batch=$batchId k=$k hasSeq=$hasSeq replay=$replay " +
        s"withDefault=$withDefault barriers=$barriers rows=$rows"
      def frameFor(p: ExtPath) = extFrame(rows,
        barriers.map { case (ts, kind) => ts -> sqlFor(kind, p.table) },
        hasSeq, frameHasExtra, p.valName)
      paths.foreach { p =>
        assert(p.apply(frameFor(p), batchId) != replay,
          s"seed=$seed path=${p.name} replay-skip mismatch\n" +
            history.mkString("\n"))
      }
      if (!replay) {
        val (m2, c2) = extModelBatch(model, rows, barriers, hasSeq, colExists)
        model = m2; colExists = c2
      }
      paths.foreach { p =>
        val got = p.state()
        assert(got == model,
          s"seed=$seed path=${p.name} state diverged\nimpl=$got\n" +
            s"model=$model\nops:\n${history.mkString("\n")}")
      }
      // lost-checkpoint redelivery — FORCED on every schema-change batch,
      // the case this sweep exists for: a redelivered batch whose ALTER
      // already executed must not re-apply its pre-barrier DML against the
      // post-DDL catalog (that would bind the old-shape rows' extra slots
      // where the first application dropped them — overwriting a
      // default-valued ADD COLUMN's fill with NULLs or stale values)
      if (!replay && (k == addBatch || dropBatch.contains(k) ||
          rnd.nextInt(3) == 0)) {
        history += s"lost-checkpoint redelivery batch=$batchId"
        paths.foreach { p =>
          regressDerby(p.url, batchId)
          p.apply(frameFor(p), batchId): Unit
          val got = p.state()
          assert(got == model,
            s"seed=$seed path=${p.name} DDL-batch redelivery diverged\n" +
              s"impl=$got\nmodel=$model\nops:\n${history.mkString("\n")}")
        }
      }
    }
    (withDefault, dropBatch.isDefined, sameBatchDrop, hasSeq)
  }

  test("free delivery: lake sink state matches the per-key model under late events and crashes") {
    (1 to 10).foreach(runFreeScenario)
  }

  test("ordered delivery: every sink apply path converges to the one per-key model") {
    (1 to 10).foreach(runOrderedScenario)
  }

  test("schema-change barriers: a mid-batch ALTER ADD/DROP COLUMN converges across the delegated loader paths, redelivery included") {
    val flags = (1 to 10).map(runSchemaChangeScenario)
    assert(flags.exists(_._1) && flags.exists(!_._1),
      "both default and no-default ADD arms must fire")
    assert(flags.exists(_._2), "no DROP COLUMN scenario fired")
    assert(flags.exists(_._3), "no same-batch ADD+DROP scenario fired")
    assert(flags.exists(_._4), "the sequence path was never driven")
  }
}
