package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.{Cdc, Filters}
import graft.sinks.UpsertSink
import graft.streaming.CdcStream

/** End-to-end composition of the drainer path (SURVEY §3.2 in miniature):
  * pump sources → k-way merge → rule filters → per-PK log compaction →
  * (optionally) checkpointed idempotent apply.
  *
  * This is the library's user-facing entry point: the reference's drainer
  * configuration (ignore-txn list, event filters, value thresholds) maps
  * onto [[DrainerConfig]]; everything else — ordering, shuffle layout,
  * pushdown — is decided by Catalyst from the declarative plan the
  * composition builds. Batch and streaming share the same filter/compaction
  * semantics; the streaming form adds watermarked dedup and the exactly-once
  * sink.
  */
case class DrainerConfig(
    ignoreCommitTs: Seq[Long] = Nil,
    dropEventTypes: Seq[String] = Nil,
    minValue: Option[Double] = None,
    compact: Boolean = true,
    /** Bidirectional-replication channel id: when set, transactions carrying
      * this channel's loopback mark are dropped on ingest (the cycle break)
      * and every outgoing transaction gets a fresh mark row injected (the
      * write half — ref: drainer/loopbacksync/loopbacksync.go). */
    loopbackChannel: Option[Long] = None)

object DrainerPipeline {

  private def applyFilters(changes: DataFrame, cfg: DrainerConfig): DataFrame = {
    var df = changes
    if (cfg.ignoreCommitTs.nonEmpty)
      df = df.filter(!col("commit_ts").isin(cfg.ignoreCommitTs: _*))
    if (cfg.dropEventTypes.nonEmpty)
      df = df.filter(!col("event_type").isin(cfg.dropEventTypes: _*))
    cfg.minValue.foreach(v => df = df.filter(col("value") >= v))
    df
  }

  /** Batch form: merged change stream → loopback break → filters → mark
    * injection → compacted final state. */
  def batch(spark: SparkSession, dir: String,
      cfg: DrainerConfig = DrainerConfig()): DataFrame = {
    val merged = Cdc.kwayMerge(Cdc.pumpSources(spark, dir)).drop("source_id")
    val unlooped = cfg.loopbackChannel
      .map(ch => Filters.dropMarkedTxns(merged, ch)).getOrElse(merged)
    val filtered = applyFilters(unlooped, cfg)
    val marked = cfg.loopbackChannel
      .map(ch => Filters.injectLoopbackMarks(filtered, ch)).getOrElse(filtered)
    if (cfg.compact) Cdc.compactByPk(marked) else marked
  }

  /** Oracle-checked drainer composition: the user-facing [[batch]] entry
    * under a non-trivial config — an ignore-commitTs list (F3, here the
    * stream's first and last txn, computed from a 2-value aggregate so the
    * query holds at every scale factor), an event-type drop rule (F2), a
    * value threshold, and per-PK compaction (A1) over the 4-pump k-way
    * merge (T2). Each piece has its own oracle; this entry hash-pins their
    * COMPOSITION — filter order and the compaction's first/last-op algebra
    * over the filtered (not raw) stream (ref: drainer/syncer.go filter
    * chain feeding the loader). */
  def batchQuery(spark: SparkSession, dir: String): DataFrame = {
    val bounds = Cdc.changes(spark, dir)
      .agg(min("commit_ts"), max("commit_ts")).head
    // empty change set → NULL min/max; an empty ignore list degrades
    // consistently with the oracle SQL (every filter of nothing is nothing)
    val ignore =
      if (bounds.isNullAt(0)) Nil else Seq(bounds.getLong(0), bounds.getLong(1))
    batch(spark, dir, DrainerConfig(
      ignoreCommitTs = ignore,
      dropEventTypes = Seq("click"),
      minValue = Some(5.0)))
  }

  def batchSql: String =
    s"""WITH c AS (${Cdc.changesCte}),
       |b AS (SELECT min(commit_ts) AS lo, max(commit_ts) AS hi FROM c),
       |f AS (SELECT c.* FROM c, b
       |      WHERE c.commit_ts <> b.lo AND c.commit_ts <> b.hi
       |        AND c.event_type <> 'click' AND c.value >= 5.0),
       |r AS (
       |  SELECT pk, commit_ts, value, op,
       |    row_number() OVER (PARTITION BY pk ORDER BY commit_ts DESC) AS rn,
       |    first_value(op) OVER (PARTITION BY pk ORDER BY commit_ts
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_op
       |  FROM f)
       |SELECT pk, commit_ts, value,
       |  CASE WHEN op = 'D' THEN 'D' WHEN first_op = 'U' THEN 'U' ELSE 'I' END AS op
       |FROM r WHERE rn = 1""".stripMargin

  /** Streaming form: file/Kafka change stream → watermarked dedup → filters
    * → checkpointed per-batch merge-upsert into the materialized state.
    *
    * When `cfg.loopbackChannel` is set, the F4 round-trip runs per
    * micro-batch (txns never span a batch, so the per-txn mark scan is a
    * batch-local anti-join, never a stream-stream join):
    *  1. transactions carrying OUR channel's mark are dropped (the cycle
    *     break — ref: drainer/syncer.go:565-592);
    *  2. every surviving transaction gets a mark row injected (the write
    *     half — ref: drainer/loopbacksync/loopbacksync.go:117-122 UpdateMark
    *     runs inside each applied txn);
    *  3. the marked batch is appended to `stateRoot`/outbinlog — the
    *     downstream binlog a counterpart drainer would re-ingest — and
    *     applied to the state (mark rows land in the reserved negative pk
    *     keyspace, the analog of the mark table's rows in the target DB). */
  def streaming(spark: SparkSession, pathGlob: String, stateRoot: String,
      checkpoint: String, cfg: DrainerConfig = DrainerConfig()): StreamingQuery =
    startApply(CdcStream.dedupStream(CdcStream.changeStream(spark, pathGlob)),
      stateRoot, checkpoint, cfg)

  /** The reference drainer's FULL streaming topology: multiple pump
    * directories → T2 streaming merge (per-pump watermarks, min frontier,
    * glob-slot dynamic membership — [[CdcStream.mergedPumpStream]]) →
    * watermarked dedup → filters → checkpointed apply. A lagging pump
    * therefore holds the downstream frontier through the whole composition,
    * exactly as the reference merger pauses the sync (drainer/merge.go:
    * 236-335 feeding drainer/syncer.go). */
  def streamingMerged(spark: SparkSession, pumpDirs: Seq[String],
      stateRoot: String, checkpoint: String,
      cfg: DrainerConfig = DrainerConfig()): StreamingQuery =
    // the merge already carries one watermark PER SOURCE (the min-frontier
    // mechanism); re-wrapping in dedupStream would stack a second watermark
    // on the same branch, which Spark rejects — the F10 dedup rides the
    // per-source watermarks directly, with the same 1-hour state bound
    startApply(
      CdcStream.mergedPumpStream(spark, pumpDirs, delay = "1 hour")
        .dropDuplicates("commit_ts", "ts"),
      stateRoot, checkpoint, cfg)

  private def startApply(changes: DataFrame, stateRoot: String,
      checkpoint: String, cfg: DrainerConfig): StreamingQuery = {
    // F2 needs an event_type column; the compact streaming envelope drops
    // it after the op mapping — reject the config loudly instead of
    // silently applying the events batch() would have dropped
    require(cfg.dropEventTypes.isEmpty || changes.columns.contains("event_type"),
      "dropEventTypes requires an envelope carrying event_type; the " +
        "compact change envelope drops it after the op mapping")
    val sink = new UpsertSink(stateRoot)
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        // SAME order as batch(), via the SAME applyFilters: loopback break
        // FIRST, then the config filters, then mark injection. A mark row
        // carries value = channelId, so a minValue (or any other) filter
        // upstream of the mark scan would strip the incoming marks and
        // silently disable the F4 cycle break — looped-back transactions
        // would re-apply and re-emit forever.
        val unlooped = cfg.loopbackChannel
          .map(ch => Filters.dropMarkedTxns(b, ch)).getOrElse(b)
        val filtered = applyFilters(unlooped, cfg)
        val routed = cfg.loopbackChannel match {
          case Some(ch) =>
            val marked = Filters.injectLoopbackMarks(filtered, ch)
            // idempotent per batch id: a replayed/retried batch OVERWRITES
            // its own batch=<id> partition instead of appending a duplicate
            // set of marked txns for a counterpart drainer to re-apply (the
            // state apply below is replay-guarded by the sink's batch-id
            // check; the outbinlog ship must be guarded the same way)
            marked.write.mode("overwrite").parquet(s"$stateRoot/outbinlog/batch=$id")
            marked
          case None => filtered
        }
        sink.applyBatch(routed, id): Unit
      }
      .start()
  }
}
