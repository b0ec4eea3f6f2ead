package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.pipeline.{Arbiter, Reparo}
import graft.sinks.JdbcUpsertSink
import graft.sources.PbBinlogFile
import graft.streaming.CdcStream

/** Randomized differential sweep for the two e2e COMPOSITIONS — the
  * standalone replay binaries [[Reparo]] (wire files → range prune → JDBC
  * loader) and [[Arbiter]] (kafka-shaped frames → restart dedup → JDBC
  * loader). The sink sweep stops at the apply layer; these two stack a
  * transport and its crash/redelivery rules on top, and until this sweep
  * they rested on one oracle row + example specs each.
  *
  * One independently-written per-key model (plain tuples + maxBy — none of
  * the window/pruning/checkpoint machinery) folds what each composition is
  * CONTRACTED to land:
  *
  *  - Reparo: arbitrary — overlapping, disjoint, empty — recovery ranges
  *    replay idempotently into a possibly half-recovered target (ref:
  *    reparo/read.go:48-110 range file selection; syncer/mysql.go apply);
  *    a mid-replay crash (apply landed, checkpoint save lost) re-delivers
  *    the same range under a reused batch id and must converge.
  *  - Arbiter: a commit-ts-ordered single-partition transport re-delivers
  *    at-least-once — every phase ships a contiguous window ending at its
  *    frontier, rewound anywhere at or below the previous one — across
  *    restarts of the streaming query; frames at or below the target's
  *    checkpointed commit ts are dropped, INCLUDING a poisoned wrong-value
  *    frame crafted to win its key's merge if the restart filter ever
  *    breaks (ref: arbiter/server.go:293-298 restart rule).
  */
class PipelineSweepPropSpec extends SparkSpec {

  private case class C(pk: Long, ts: Long, op: String, value: Option[Double])

  private def opRank(op: String): Int =
    op match { case "D" => 2; case "U" => 1; case _ => 0 }

  /** Per-key winners over `rows`, REPLACE-folded into `state`: the merged
    * apply's contract — the batch winner overwrites, a winning D removes. */
  private def fold(state: Map[Long, (Long, Option[Double])], rows: Seq[C])
      : Map[Long, (Long, Option[Double])] = {
    var st = state
    rows.groupBy(_.pk).foreach { case (pk, incoming) =>
      val w = incoming.maxBy(r => (r.ts, opRank(r.op),
        r.value.isDefined, r.value.getOrElse(0.0)))
      if (w.op == "D") st -= pk else st += pk -> ((w.ts, w.value))
    }
    st
  }

  private def readState(url: String): Map[Long, (Long, Option[Double])] =
    new JdbcUpsertSink(url).currentState(spark).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    }.toMap

  /** The state a crash between the apply and the checkpoint save leaves. */
  private def regressCheckpoint(url: String): Unit = {
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.prepareStatement(
        "UPDATE GRAFT_CHECKPOINT SET BATCH_ID = BATCH_ID - 1 WHERE CLUSTER_ID = 1")
      st.executeUpdate(); st.close()
    } finally c.close()
  }

  // ---- Reparo: wire files, arbitrary ranges, crash/redelivery ----

  /** Returns coverage flags: (an empty range fired, a mid-replay crash
    * fired). */
  private def runReparoScenario(seed: Int): (Boolean, Boolean) = {
    val rnd = new Random(seed)
    val rows = (0 until 15 + rnd.nextInt(30)).map { _ =>
      C(pk = 1 + rnd.nextInt(6), ts = 1L + rnd.nextInt(50),
        op = Seq("I", "U", "D")(rnd.nextInt(3)),
        value = if (rnd.nextInt(10) == 0) None
                else Some((1 + rnd.nextInt(90)).toDouble))
    }
    // barrier-only DDL records ride the wire too: reparo counts them and
    // splits the apply at their ts (a null ddl_sql executes nothing)
    val ddlTs = (0 until rnd.nextInt(3)).map(_ => 1L + rnd.nextInt(50))
    val pbDir = graft.util.Scratch.dir(s"graft_reparo_swp_$seed")
    import spark.implicits._
    val frame = (rows.map(r => (r.ts, r.pk, r.op, "row",
        new java.sql.Timestamp(r.ts * 1000), r.value, null: String,
        null: String)) ++
      ddlTs.map(t => (t, 0L, "DDL", "ddl", new java.sql.Timestamp(0L),
        Option.empty[Double], null: String, null: String)))
      .toDF("commit_ts", "pk", "op", "event_type", "ts", "value", "props",
        "ddl_sql")
    PbBinlogFile.write(frame, pbDir, nFiles = 1 + rnd.nextInt(4))
    val url = graft.util.Scratch.derbyMemUrl(s"graft_reparo_swp_$seed")
    var model = Map.empty[Long, (Long, Option[Double])]
    var sawEmpty = false
    var sawCrash = false
    val history = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until 2 + rnd.nextInt(3)).foreach { phase =>
      // arbitrary recovery ranges — the half-recovered-target contract;
      // seed 1's first range is pinned past every ts so an EMPTY range
      // provably fires in the sweep
      val (a, b) = if (seed == 1 && phase == 0) (51L, 60L) else {
        val a0 = 1L + rnd.nextInt(55); (a0, a0 + rnd.nextInt(20))
      }
      val inRange = rows.filter(r => r.ts >= a && r.ts <= b)
      val ddlIn = ddlTs.filter(t => t >= a && t <= b)
      if (inRange.isEmpty && ddlIn.isEmpty) sawEmpty = true
      history += s"replay [$a,$b] rows=${inRange.size} ddl=${ddlIn.size}"
      val n = Reparo.replay(spark, pbDir, a, b, url)
      assert(n == inRange.size + ddlIn.size,
        s"seed=$seed replay count $n != ${inRange.size + ddlIn.size}\n" +
          history.mkString("\n"))
      model = fold(model, inRange)
      assert(readState(url) == model,
        s"seed=$seed state diverged after [$a,$b]\nimpl=${readState(url)}\n" +
          s"model=$model\nops:\n${history.mkString("\n")}")
      // mid-replay crash: the apply landed but the checkpoint save was
      // lost — the SAME range re-delivers under the reused batch id (the
      // wire's barrier-only DDL records are already logged for that id and
      // their sub-batches skip; everything else REPLACE-converges)
      if (rnd.nextInt(2) == 0 || (seed % 4 == 0 && phase == 0)) {
        sawCrash = true
        history += s"mid-replay crash + redelivery [$a,$b]"
        regressCheckpoint(url)
        Reparo.replay(spark, pbDir, a, b, url)
        assert(readState(url) == model,
          s"seed=$seed crash redelivery diverged\nimpl=${readState(url)}\n" +
            s"model=$model\nops:\n${history.mkString("\n")}")
      }
    }
    (sawEmpty, sawCrash)
  }

  // ---- Arbiter: frame transport, rewind redelivery, poison, restarts ----

  /** Returns coverage flags: (a poisoned redelivery fired, a rewound
    * at-least-once redelivery fired). */
  private def runArbiterScenario(seed: Int): (Boolean, Boolean) = {
    val rnd = new Random(seed)
    import spark.implicits._
    val rows = (0 until 15 + rnd.nextInt(25)).map { _ =>
      C(pk = 1 + rnd.nextInt(6), ts = 1L + rnd.nextInt(40),
        op = Seq("I", "U", "D")(rnd.nextInt(3)),
        value = if (rnd.nextInt(10) == 0) None
                else Some((1 + rnd.nextInt(90)).toDouble))
    }
    // the transport is a commit-ts-ordered single-partition topic: ties in
    // one ts always ship together, so frontiers cut only at ts boundaries
    val tsSorted = rows.map(_.ts).distinct.sorted
    val nPhases = math.min(2 + rnd.nextInt(2), tsSorted.size)
    val cuts = rnd.shuffle(tsSorted.dropRight(1).toList)
      .take(nPhases - 1).sorted :+ tsSorted.last
    val frameDir = graft.util.Scratch.dir(s"graft_arb_swp_$seed")
    val ckpt = graft.util.Scratch.dir(s"graft_arb_swp_ckpt_$seed")
    val url = graft.util.Scratch.derbyMemUrl(s"graft_arb_swp_$seed")
    def frames = spark.readStream
      .schema(CdcStream.kafkaFrameSchema).parquet(frameDir)
    var sawPoison = false
    var sawRewind = false
    var prevFrontier = Long.MinValue
    val history = scala.collection.mutable.ArrayBuffer.empty[String]
    cuts.zipWithIndex.foreach { case (frontier, i) =>
      // at-least-once: this phase ships a contiguous window ending at its
      // frontier, rewound to anywhere at or below the previous frontier
      val from = if (i == 0) Long.MinValue
        else if (rnd.nextInt(3) == 0 || (seed % 3 == 0 && i == 1)) {
          sawRewind = true; Long.MinValue // full redelivery from offset 0
        } else {
          val below = tsSorted.filter(_ <= prevFrontier)
          val f = below(rnd.nextInt(below.size))
          if (f < prevFrontier) sawRewind = true
          f
        }
      val window = rows.filter(r => r.ts > from && r.ts <= frontier)
      // the poison: a fabricated wrong-value frame at or below the
      // target's checkpointed commit ts, stamped one tick after its pk's
      // last REAL touch in the whole stream — if the restart filter ever
      // breaks, it wins that pk's final merge outright
      val ts0 = new JdbcUpsertSink(url).lastCommitTs
      val poison = if (i == 0) None else {
        val lastTouch = rows.groupBy(_.pk).map { case (pk, rs) =>
          pk -> rs.map(_.ts).max }
        lastTouch.filter(_._2 + 1 <= ts0).keys.toSeq.sorted.headOption
          .map { pk =>
            sawPoison = true
            C(pk, lastTouch(pk) + 1, "U", Some(-999.0))
          }
      }
      val delivered = window ++ poison.toSeq
      history += s"phase=$i from=$from frontier=$frontier " +
        s"delivered=${delivered.size} poison=${poison.nonEmpty} ts0=$ts0"
      CdcStream.toKafkaFrame(
          delivered.map(r => (r.ts, r.pk, r.op, r.value))
            .toDF("commit_ts", "pk", "op", "value"), "cdc")
        .write.mode("append").parquet(frameDir)
      // a RESTARTED arbiter each phase: same streaming checkpoint, fresh
      // query — the reference's crash/restart boundary
      val q = Arbiter.run(frames, url, ckpt)
      try q.processAllAvailable() finally q.stop()
      val model = fold(Map.empty, rows.filter(_.ts <= frontier))
      assert(readState(url) == model,
        s"seed=$seed phase=$i state diverged\nimpl=${readState(url)}\n" +
          s"model=$model\nops:\n${history.mkString("\n")}")
      prevFrontier = frontier
    }
    (sawPoison, sawRewind)
  }

  test("reparo sweep: random wire files + arbitrary ranges + crash redelivery converge to the per-key model") {
    val flags = (1 to 8).map(runReparoScenario)
    assert(flags.exists(_._1), "no empty recovery range fired")
    assert(flags.exists(_._2), "no mid-replay crash fired")
  }

  test("arbiter sweep: rewound at-least-once redelivery with poisoned frames converges across restarts") {
    val flags = (1 to 6).map(runArbiterScenario)
    assert(flags.exists(_._1), "no poisoned redelivery fired")
    assert(flags.exists(_._2), "no rewound redelivery fired")
  }
}
