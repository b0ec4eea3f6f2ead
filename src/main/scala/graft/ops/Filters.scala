package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Predicate / routing operators.
  *
  * The reference compiles filter and router rules once and applies them
  * per-event (`pkg/filter/filter.go:24-124`, `drainer/util.go:277-381`).
  * Spark-first these become plain `Column` predicates — constants are folded
  * by Catalyst, pushed into the parquet scan (`PushedFilters`), and run
  * inside whole-stage codegen, so rule evaluation costs nothing extra at
  * 100 TB: it *reduces* scan output instead of post-filtering it.
  */
object Filters {

  /** F1: schema/table allow-block filter
    * (ref: pkg/filter/filter.go:24-124 — allowlist regex then blocklist,
    * case-insensitive). Analog: documents routed by (lang, source); allow
    * langs matching ^(en|de), then block sources src0/src13.
    */
  def allowBlock(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("lang").rlike("^(en|de)$"))
      .filter(!col("source").isin("src0", "src13"))
      .select("doc_id", "lang", "source", "n_chars")

  def allowBlockSql: String =
    """SELECT doc_id, lang, source, n_chars FROM documents
      |WHERE regexp_matches(lang, '^(en|de)$')
      |  AND source NOT IN ('src0', 'src13')""".stripMargin

  /** F2: binlog event-type filter
    * (ref: drainer/syncer.go:594-673 — per (schema,table) rule drops event
    * kinds and rows matching SQL patterns). Analog rules: ignore all
    * 'click' events, and ignore 'purchase' events below a value threshold.
    */
  def eventTypeFilter(spark: SparkSession, dir: String): DataFrame =
    Cdc.changes(spark, dir)
      .filter(!(col("event_type") === "click"))
      .filter(!(col("event_type") === "purchase" && col("value") < 10.0))
      .select("commit_ts", "pk", "op", "event_type", "value")

  def eventTypeFilterSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT commit_ts, pk, op, event_type, value FROM c
       |WHERE NOT (event_type = 'click')
       |  AND NOT (event_type = 'purchase' AND value < 10.0)""".stripMargin

  /** F3: ignore-commitTS filter (ref: drainer/syncer.go:366-369, 707-714 —
    * skip whole transactions whose commitTs is in the configured list). */
  val ignoredTs: Seq[Long] = Seq(7L, 42L, 99L, 123L, 500L)

  def ignoreCommitTs(spark: SparkSession, dir: String): DataFrame =
    Cdc.changes(spark, dir)
      .filter(!col("commit_ts").isin(ignoredTs: _*))
      .select("commit_ts", "pk", "op")

  def ignoreCommitTsSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT commit_ts, pk, op FROM c
       |WHERE commit_ts NOT IN (${ignoredTs.mkString(", ")})""".stripMargin

  /** F9: table router (ref: drainer/util.go:277-346 route rules applied at
    * pkg/loader/translate.go:36-62 — (schema,table) → (target schema,table)
    * with exact rules first, then pattern rules, else identity).
    * Analog: route document sources to shard schemas.
    */
  def tableRouter(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      when(col("source") === "src0", "archive.docs")
        .when(col("source").rlike("^src1[0-9]$"), "shard_hi.docs")
        .otherwise("shard_lo.docs").as("target_table"))

  def tableRouterSql: String =
    """SELECT doc_id, source,
      |  CASE WHEN source = 'src0' THEN 'archive.docs'
      |       WHEN regexp_matches(source, '^src1[0-9]$') THEN 'shard_hi.docs'
      |       ELSE 'shard_lo.docs' END AS target_table
      |FROM documents""".stripMargin

  /** F10: repeated-binlog skip (ref: arbiter/server.go:293-298 drops
    * messages with commitTs ≤ last seen). Batch analog: replayed stream
    * (the union simulates an at-least-once source) deduplicated on the
    * commit timestamp. `dropDuplicates` is a map-side-combinable hash
    * aggregate — no skew risk since commit_ts is unique and dense. */
  def repeatedSkip(spark: SparkSession, dir: String): DataFrame = {
    val c = Cdc.changes(spark, dir).select("commit_ts", "pk", "op")
    c.unionByName(c.filter(col("commit_ts") % 3 === 0))
      .dropDuplicates("commit_ts")
  }

  def repeatedSkipSql: String =
    s"""WITH c AS (${Cdc.changesCte}),
       |replayed AS (
       |  SELECT commit_ts, pk, op FROM c
       |  UNION ALL
       |  SELECT commit_ts, pk, op FROM c WHERE commit_ts % 3 = 0)
       |SELECT commit_ts,
       |       min(pk) AS pk,
       |       min(op) AS op
       |FROM replayed GROUP BY commit_ts""".stripMargin

  /** S6: commit-ts range scan (ref: reparo/file.go:29-109 selects pb files
    * by first-commitTs then range-filters [start, stop]). With time-bucketed
    * parquet layout this predicate becomes partition pruning; here it is a
    * pushed parquet filter on the `timestamp[us]` column (visible as
    * PushedFilters in the scan — timestamp pushdown is on by default, so
    * row groups outside [lo, hi) are min/max-pruned without decoding). */
  def tsRangeScan(spark: SparkSession, dir: String): DataFrame = {
    val lo = lit("2024-01-03 00:00:00").cast("timestamp")
    val hi = lit("2024-01-05 00:00:00").cast("timestamp")
    // same NTZ pin as Tables.table: this is the one operator reading the
    // driver's parquet directly (to keep the scan shape visible), and the
    // untagged file must not infer TIMESTAMP_NTZ under a fresh session
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/events.parquet")
      .filter(col("ts") >= lo && col("ts") < hi)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
  }

  def tsRangeScanSql: String =
    """SELECT event_id, ts, user_id, event_type FROM events
      |WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'
      |  AND ts <  TIMESTAMP '2024-01-05 00:00:00'""".stripMargin

  /** F4: loopback filter (ref: drainer/syncer.go:565-592 — drop transactions
    * that contain the replicator's own mark-table row, identified by channel
    * id, to break bidirectional-replication cycles). Mark rows here: signup
    * events with value > 200. The drop is a left-anti join against the
    * distinct marked-key set — at 100 TB the mark set stays tiny (one row
    * per replication channel), so AQE broadcasts it and the big side never
    * shuffles. */
  def loopbackFilter(spark: SparkSession, dir: String): DataFrame = {
    val c = Cdc.changes(spark, dir)
    val marks = c.filter(col("event_type") === "signup" && col("value") > 200.0)
      .select("pk").distinct()
    // no broadcast hint: the REAL mark set is one row per replication
    // channel and AQE broadcasts it on its measured size; the fixture's
    // value-filtered stand-in scales with the corpus, so pinning the
    // choice would be wrong exactly when it matters
    c.join(marks, Seq("pk"), "left_anti")
      .select("commit_ts", "pk", "op", "event_type")
  }

  def loopbackFilterSql: String =
    // NOT EXISTS, not NOT IN: the Spark side is a left_anti join, whose
    // NULL-key semantics (a NULL pk row survives; a NULL in the subquery
    // changes nothing) NOT IN inverts — one NULL pk anywhere would
    // silently split the two engines
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT commit_ts, pk, op, event_type FROM c
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM c m WHERE m.event_type = 'signup' AND m.value > 200.0
       |    AND m.pk = c.pk)""".stripMargin

  /** F4 write half: loopback mark maintenance (ref: drainer/loopbacksync/
    * loopbacksync.go:40-76 CreateMarkTable/InitMarkTableData seed one row
    * per worker with val=1; loopbacksync.go:117-122 UpdateMark runs
    * `val = val + 1` inside every applied transaction so the txn carries
    * the channel's mark when it loops back). */
  val LoopbackWorkers = 16
  /** Mark rows live in a reserved negative pk keyspace (the analog of the
    * reference's dedicated `retl._drainer_repl_mark` table). */
  def markPk(commitTs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    -(commitTs % LoopbackWorkers) - 1

  /** Inject one mark row per transaction into the outgoing change stream —
    * the batch analog of UpdateMark running inside each applied txn. The
    * mark is an ordinary change row (worker pk, event_type 'mark', value =
    * channel id) so it round-trips through any downstream replicator and
    * [[dropMarkedTxns]] can recognize it coming back. One aggregate per
    * txn group; mark volume = txn count, never row count. */
  def injectLoopbackMarks(changes: DataFrame, channelId: Long): DataFrame = {
    val markRows = changes.groupBy("commit_ts")
      .agg(max("ts").as("ts"))
      .select(col("commit_ts"), markPk(col("commit_ts")).as("pk"),
        lit("U").as("op"), lit("mark").as("event_type"), col("ts"),
        lit(channelId).cast("double").as("value"),
        lit(null).cast("string").as("props"))
    // carry only the columns the input envelope actually has: the batch
    // envelope includes event_type/props, the streaming envelope does not
    // (marks there are recognized by the reserved negative pk keyspace)
    changes.unionByName(markRows.select(changes.columns.toIndexedSeq.map(col): _*))
  }

  /** Drop every transaction that carries OUR channel's mark — the loopback
    * break (ref: drainer/syncer.go:565-592 findLoopBackMark: scan the txn's
    * DMLs for a mark-table row whose channel_id equals ours; if found, skip
    * the whole txn). Foreign channels' marks pass through untouched, as in
    * the reference. The marked-txn set is one key per round-tripped txn:
    * an equi-anti-join on commit_ts that AQE plans by its measured size. */
  def dropMarkedTxns(changes: DataFrame, channelId: Long): DataFrame = {
    // batch envelope: marks are typed rows; streaming envelope (no
    // event_type column): marks live in the reserved negative pk keyspace
    val isMark =
      if (changes.columns.contains("event_type"))
        col("event_type") === "mark" && col("value") === channelId.toDouble
      else col("pk") < 0 && col("value") === channelId.toDouble
    val marked = changes.filter(isMark).select("commit_ts").distinct()
    changes.join(marked, Seq("commit_ts"), "left_anti")
  }

  /** Oracle-checked query for the write half: the mark table's final state
    * after replaying the change stream — per worker id, val = 1 (seed) +
    * txns applied by that worker (UpdateMark's net effect). One distinct +
    * one hash aggregate; the state is workers × channels rows at any
    * corpus size. */
  def loopbackMarkState(spark: SparkSession, dir: String,
      channelId: Long = 42L): DataFrame =
    Cdc.changes(spark, dir)
      .select("commit_ts").distinct()
      .select((col("commit_ts") % LoopbackWorkers).as("id"))
      .groupBy("id")
      .agg((count(lit(1)) + 1L).as("val"))
      .select(col("id"), lit(channelId).as("channel_id"), col("val"))

  def loopbackMarkStateSql(channelId: Long = 42L): String =
    s"""WITH c AS (${Cdc.changesCte}),
       |t AS (SELECT DISTINCT commit_ts FROM c)
       |SELECT commit_ts % $LoopbackWorkers AS id,
       |  CAST($channelId AS BIGINT) AS channel_id,
       |  CAST(count(*) + 1 AS BIGINT) AS val
       |FROM t GROUP BY 1""".stripMargin

  /** F5: system / unsupported-DDL skip (ref: drainer/schema.go:333-353,
    * drainer/syncer.go:436-462 — drop placement/lock/cache jobs, failed or
    * cancelled jobs, and system-table ids). Analog: system key space is
    * pk % 97 = 0; 'error' events are the cancelled jobs. Pure pushed-down
    * predicate. */
  def ddlSkip(spark: SparkSession, dir: String): DataFrame =
    Cdc.changes(spark, dir)
      .filter(!(col("pk") % 97 === 0) && col("event_type") =!= "error")
      .select("commit_ts", "pk", "op", "event_type")

  def ddlSkipSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT commit_ts, pk, op, event_type FROM c
       |WHERE NOT (pk % 97 = 0) AND event_type <> 'error'""".stripMargin

  /** F6: old-version-after-truncate drop (ref: drainer/syncer.go:744-762 —
    * mutations against a table id that was later truncated are dropped).
    * Truncate analog: the last 'D' per key; everything strictly before it is
    * stale. One shuffle on the key, a single unbounded window max per
    * partition — same exchange the compaction already needs. */
  def truncateDrop0(changes: DataFrame): DataFrame = {
    val w = Window.partitionBy("pk")
    changes
      .withColumn("trunc_ts",
        max(when(col("op") === "D", col("commit_ts"))).over(w))
      .filter(col("trunc_ts").isNull || col("commit_ts") >= col("trunc_ts"))
      .select("commit_ts", "pk", "op")
  }

  def truncateDrop(spark: SparkSession, dir: String): DataFrame =
    truncateDrop0(Cdc.changes(spark, dir))

  def truncateDropSql: String =
    s"""WITH c AS (${Cdc.changesCte}), t AS (
       |  SELECT commit_ts, pk, op,
       |    max(CASE WHEN op = 'D' THEN commit_ts END) OVER (PARTITION BY pk) AS trunc_ts
       |  FROM c)
       |SELECT commit_ts, pk, op FROM t
       |WHERE trunc_ts IS NULL OR commit_ts >= trunc_ts""".stripMargin

  /** F7/F8: writable-column projection (ref: drainer/translator/mysql.go:212-222
    * excludes generated and non-public columns from the write set;
    * pkg/loader/load.go:577-604 drops columns absent downstream). Here `op`
    * and `ts` are the generated/derived columns; the projection is column
    * pruning that Catalyst pushes into the parquet scan (ReadSchema shrinks). */
  def writableColumns(spark: SparkSession, dir: String): DataFrame =
    Cdc.changes(spark, dir).select("commit_ts", "pk", "value", "props")

  def writableColumnsSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT commit_ts, pk, value, props FROM c""".stripMargin

  /** Deterministic sampling: keep rows whose engine-shared md5-derived hash
    * of the key falls under the rate — reproducible across engines, runs and
    * cluster sizes (unlike TABLESAMPLE/rand), and pure map-side: the sample
    * of a 100 TB table costs one scan. 10% by event id. */
  def detSample(spark: SparkSession, dir: String): DataFrame =
    Cdc.changes(spark, dir)
      .filter(graft.text.Lex.hex8(col("commit_ts").cast("string")) % 100 < 10)
      .select("commit_ts", "pk", "op", "value")

  def detSampleSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT commit_ts, pk, op, value FROM c
       |WHERE ${graft.text.Lex.hex8Sql("CAST(commit_ts AS VARCHAR)")} % 100 < 10""".stripMargin
}
