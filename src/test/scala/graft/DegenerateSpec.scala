package graft

import org.apache.spark.sql.functions._

/** Degenerate-input behavior the oracle never probes: empty directories,
  * empty slices, single-element merges. At 100 TB these shapes are routine
  * (a pump with no traffic in the window, a router slice matching nothing,
  * a binlog dir between rotations) and must degrade to empty results or
  * documented no-ops, never to exceptions. */
class DegenerateSpec extends SparkSpec {
  import spark.implicits._

  test("pb binlog read of an empty directory is an empty frame, strict and recovering") {
    val dir = graft.util.Scratch.dir("graft_empty_pb")
    assert(graft.sources.PbBinlogFile.read(spark, dir).count() == 0)
    assert(graft.sources.PbBinlogFile.read(spark, dir, recover = true).count() == 0)
  }

  test("k-way merge of one source is that source; empty sources contribute nothing") {
    val one = Seq((1L, 1L, "I", 1.0), (2L, 2L, "I", 2.0))
      .toDF("commit_ts", "pk", "op", "value")
    val empty = one.filter(lit(false))
    val merged = graft.ops.Cdc.kwayMerge(Seq(one, empty, empty))
    assert(merged.count() == 2)
    assert(graft.ops.Cdc.kwayMerge(Seq(one)).count() == 2)
  }

  test("schema loader: an all-empty batch commits its checkpoint and replays as a skip") {
    graft.util.Scratch.ensureDerbyHome()
    val root = graft.util.Scratch.dir("graft_empty_batch")
    val loader = new graft.sinks.JdbcSchemaLoader(
      s"jdbc:derby:$root/db;create=true", applyPartitions = 2)
    loader.createTable(
      "CREATE TABLE E_T (PK BIGINT PRIMARY KEY, COMMIT_TS BIGINT, VAL DOUBLE)")
    val empty = Seq.empty[(Long, Long, String, Double)]
      .toDF("pk", "commit_ts", "op", "val")
    // an empty micro-batch is normal stream traffic: it must advance the
    // batch-id guard (the reference saves its savepoint on idle heartbeats
    // too) without touching the table
    assert(loader.applyBatch(Map("E_T" -> empty), 0L))
    assert(loader.readTable(spark, "E_T").count() == 0)
    assert(!loader.applyBatch(Map("E_T" -> empty), 0L), "replayed id must skip")
    // sequence mode takes the same guard path
    assert(loader.applyBatch(Map("E_T" -> empty), 1L, merge = false))
  }

  test("compaction over an empty change stream is empty, not an error") {
    val empty = graft.ops.Cdc.changes(spark, sf).filter(lit(false))
    assert(graft.ops.Cdc.compactByPk(empty).count() == 0)
  }

  test("recover-scan staging over an empty change feed is empty, not an error") {
    // zero staged segments: the corruption fan-out must not demand a
    // positive slice count from an empty file list, and the salvage read
    // of the (empty) directory is an empty frame
    val dir = graft.util.Scratch.dir("graft_empty_feed")
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.streaming.CdcStream.eventsRawSchema)
      .write.parquet(s"$dir/events.parquet")
    assert(graft.sources.PbBinlogFile.recoverScanQuery(spark, dir).count() == 0)
  }

  test("the binlog writer rejects a negative commit ts instead of poisoning the name") {
    // f"%020d" of a negative long prints a sign into the segment name's
    // interval fields; every later list/read of the directory would then
    // fail its name parse — the row must fail loudly at write
    val dir = graft.util.Scratch.dir("graft_neg_ts")
    val bad = Seq((-1L, 1L, "I", "e", 1.0))
      .toDF("commit_ts", "pk", "op", "event_type", "value")
      .withColumn("ts", timestamp_micros(lit(0L)))
      .withColumn("props", lit(null).cast("string"))
    val e = intercept[Exception] {
      graft.sources.PbBinlogFile.write(bad, dir, nFiles = 1)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("negative commit_ts")))
    // and the directory stays readable (no poisoned name was promoted)
    assert(graft.sources.PbBinlogFile.read(spark, dir).count() == 0)
  }
}
