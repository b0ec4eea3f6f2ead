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
    * property reparo's safe mode exists to guarantee. Returns the number of
    * change rows replayed. */
  def replay(spark: SparkSession, pbDir: String, startTs: Long, stopTs: Long,
      url: String): Long = {
    val changes = PbBinlogFile.read(spark, pbDir, startTs, stopTs)
      .select("pk", "commit_ts", "op", "value")
      .localCheckpoint(true) // counted and applied; decode once
    val sink = new JdbcUpsertSink(url)
    sink.applyBatch(changes, batchId = sink.lastCommitted + 1)
    changes.count()
  }
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

  def run(frames: DataFrame, url: String, checkpoint: String): StreamingQuery =
    CdcStream.applyToJdbc(CdcStream.fromKafkaFrame(frames), url, checkpoint)
}
