package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sinks.JdbcUpsertSink
import graft.sources.PbBinlogFile
import graft.streaming.CdcStream

/** The reference's two standalone replay binaries, as compositions of the
  * real substrates this library now has — the binlog-file wire format
  * ([[graft.sources.PbBinlogFile]]) and the JDBC loader
  * ([[graft.sinks.JdbcUpsertSink]]). Nothing here is new machinery; that is
  * the point: reparo and arbiter ARE "source → loader" wiring in the
  * reference too.
  */
object Reparo {

  /** Offline point-in-time recovery (ref: reparo/reparo.go — read pb binlog
    * files range-filtered to [startTs, stopTs], apply to a SQL database;
    * read.go:48-110 file selection, syncer/mysql.go apply). File selection
    * prunes to the overlapping files before any byte is read; the apply is
    * the loader path: merge-by-pk, delete-first, batched REPLACE statements
    * — idempotent into a possibly half-recovered target, which is the
    * property reparo's safe mode exists to guarantee. DDL records carried
    * on the wire (op="DDL" + ddl_sql) re-execute at their commit-ts
    * position: the loader splits the batch at each DDL barrier and runs
    * the statement alone between the DML slices, exactly the reference's
    * replay ordering (reparo/syncer/mysql.go executes a DDL by itself
    * after flushing pending DML). Returns the number of records replayed,
    * DDL included. */
  def replay(spark: SparkSession, pbDir: String, startTs: Long, stopTs: Long,
      url: String): Long = {
    val changes = PbBinlogFile.read(spark, pbDir, startTs, stopTs)
      .select("pk", "commit_ts", "op", "value", "ddl_sql")
      .localCheckpoint(true) // counted and applied; decode once
    val sink = new JdbcUpsertSink(url)
    sink.applyBatch(changes, batchId = sink.lastCommitted + 1)
    changes.count()
  }

  /** Oracle-checked reparo composition, END TO END: encode the change
    * stream into real wire files, [[replay]] the [40%, 80%] commit-ts
    * window through file pruning + the JDBC loader into a fresh Derby
    * database, and read the recovered table back. Hash-matching DuckDB's
    * compaction over the same window pins the whole binary → prune →
    * merge → batched-REPLACE → SQL-engine round trip under the driver's
    * correctness gate, not just ScalaTest (ref: reparo/read.go:48-110 +
    * reparo/syncer/mysql.go:52-124). */
  def replayQuery(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val scratch = graft.util.Scratch.dir("graft_reparo_e2e")
    val changes = graft.ops.Cdc.changes(spark, dir)
    PbBinlogFile.write(changes, s"$scratch/pb", nFiles = 4)
    val maxTs = graft.ops.Cdc.maxCommitTs(changes)
    // wire files stay on disk (the binary format IS the substrate under
    // test); the recovery-target database is in-memory staging
    val url = graft.util.Scratch.derbyMemUrl("graft_reparo_e2e")
    replay(spark, s"$scratch/pb", maxTs * 4 / 10, maxTs * 8 / 10, url)
    new JdbcUpsertSink(url).currentState(spark)
  }

  def replaySql: String =
    s"""WITH c AS (${graft.ops.Cdc.changesCte}),
       |f AS (SELECT * FROM c
       |      WHERE commit_ts BETWEEN (SELECT max(commit_ts) * 4 // 10 FROM c)
       |                          AND (SELECT max(commit_ts) * 8 // 10 FROM c)),
       |r AS (SELECT pk, commit_ts, value, op,
       |        row_number() OVER (PARTITION BY pk ORDER BY commit_ts DESC) AS rn
       |      FROM f)
       |SELECT pk, commit_ts, value FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin
}

/** Kafka(open-protocol) → SQL applier (ref: arbiter/server.go — consume
  * the secondary binlog topic, decode, load to MySQL with a commit-ts
  * checkpoint; server.go:293-298 drops already-applied commit ts on
  * restart). Here: any frame stream with the Kafka sink's (key, value,
  * topic) shape — a real broker or a staged file stream, exactly like
  * [[CdcStream.kafkaTransport]]'s config switch — is decoded by the S7
  * inverse and applied through the JDBC loader; restart dedup comes from
  * the streaming checkpoint plus the sink's batch-id replay skip. */
object Arbiter {

  /** PRECONDITION, inherited from the reference: the frame stream must be
    * commit-ts-ordered across a restart boundary (the reference consumes a
    * single-partition Kafka topic, which guarantees it — arbiter/server.go
    * reads one partition in offset order). The checkpointed commit ts is a
    * WATERMARK: a frame at or below it is treated as already applied and
    * dropped. A transport that delivers late frames BELOW its own
    * checkpointed high-water mark (multi-partition topic without per-key
    * ordering, out-of-order file drops) would lose them — route such
    * sources through the k-way merge (T2) first, which is what the
    * reference's pump/drainer layer does upstream of the arbiter. */
  def run(frames: DataFrame, url: String, checkpoint: String): StreamingQuery = {
    // restart dedup (ref: arbiter/server.go:293-298): every frame at or
    // below the checkpointed commit ts was applied before the crash — an
    // at-least-once transport may re-deliver them in files the streaming
    // checkpoint has never seen, so the batch-id skip alone cannot catch
    // them; the ingest filter against the TARGET database's own savepoint
    // does, exactly like the reference compares against its checkpoint TS
    val ts0 = new JdbcUpsertSink(url).lastCommitTs
    CdcStream.applyToJdbc(
      CdcStream.fromKafkaFrame(frames)
        .filter(org.apache.spark.sql.functions.col("commit_ts") > ts0),
      url, checkpoint)
  }

  /** Oracle-checked arbiter composition, END TO END: encode a ts-bounded
    * slice of the change stream into Kafka-shaped binary frames (M2),
    * stream them through the arbiter's real path — S7 frame decode,
    * commit-ts restart dedup, JDBC loader — into an in-memory Derby
    * target ACROSS A CRASH: phase 1 applies half the slice, then the
    * at-least-once transport re-delivers EVERYTHING to a restarted
    * arbiter, including a POISONED frame — a fabricated wrong-value write
    * stamped one tick after its pk's last real touch, still at/below the
    * phase-1 checkpoint. A correct restart filter drops it with the rest
    * of the re-delivered prefix; a broken one lets it win that pk's merge
    * outright — so DuckDB hash-matching the CLEAN slice's compaction pins
    * transport encode → decode → restart dedup → merge → SQL round trip
    * in one gate, deterministically (verified by mutation: removing the
    * filter fails the oracle; ref: arbiter/server.go:99-115, 287-317,
    * restart rule 293-298). */
  def e2eQuery(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val scratch = graft.util.Scratch.dir("graft_arbiter_e2e")
    val in = s"$scratch/frames"
    val changes = graft.ops.Cdc.changes(spark, dir)
    val maxTs = graft.ops.Cdc.maxCommitTs(changes)
    val slice = changes.filter(col("commit_ts") <= maxTs / 20)
      .select("commit_ts", "pk", "op", "value")
    def frames = spark.readStream.schema(CdcStream.kafkaFrameSchema).parquet(in)
    val url = graft.util.Scratch.derbyMemUrl("graft_arbiter_e2e")
    // phase 1: the first half arrives and applies, then the arbiter crashes
    CdcStream.toKafkaFrame(slice.filter(col("commit_ts") <= maxTs / 40), "cdc")
      .write.mode("append").parquet(in)
    val ckpt = s"$scratch/ckpt"
    val q1 = run(frames, url, ckpt)
    try q1.processAllAvailable() finally q1.stop()
    // phase 2: the restarted arbiter resumes from the SAME checkpoint; the
    // at-least-once transport re-delivers EVERYTHING in a new file the
    // checkpoint has never seen — including a POISONED frame. The batch-id
    // guard sees a brand-new batch; only the commit-ts restart filter can
    // drop the re-delivered prefix. The poison must be DETERMINISTICALLY
    // visible if the filter is broken: target the pk whose last touch in
    // the WHOLE slice is earliest (so no later real row out-merges it) and
    // stamp it one tick after that touch — still at or below the phase-1
    // checkpoint, so a correct filter drops it, while a broken one lets it
    // win that pk's merge outright and fail the hash.
    val ts0 = new JdbcUpsertSink(url).lastCommitTs
    // degenerate slices (empty, or every pk last-touched at the checkpoint
    // itself) get no poison rather than a crash — the redelivery dedup is
    // still under the gate, just without the adversarial probe
    val victim = slice.groupBy("pk").agg(max("commit_ts").as("last_ts"))
      .orderBy(col("last_ts"), col("pk")).limit(1).collect().headOption
      .filter(_.getLong(1) + 1 <= ts0)
      .map(v => spark.range(0, 1, 1, 1).select( // 1 partition, not 32 empties
        lit(v.getLong(1) + 1).as("commit_ts"), lit(v.getLong(0)).as("pk"),
        lit("U").as("op"), lit(-999.0).as("value")))
    CdcStream.toKafkaFrame(
        victim.fold(slice)(p => slice.unionByName(p)), "cdc")
      .write.mode("append").parquet(in)
    val q2 = run(frames, url, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    new JdbcUpsertSink(url).currentState(spark)
  }

  def e2eSql: String =
    s"""WITH c AS (${graft.ops.Cdc.changesCte}),
       |f AS (SELECT * FROM c
       |      WHERE commit_ts <= (SELECT max(commit_ts) // 20 FROM c)),
       |r AS (SELECT pk, commit_ts, value, op,
       |        row_number() OVER (PARTITION BY pk ORDER BY commit_ts DESC) AS rn
       |      FROM f)
       |SELECT pk, commit_ts, value FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin
}
