package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Core CDC dataflow operators, re-expressed Spark-first.
  *
  * The reference (pingcap/tidb-binlog) restores a globally ordered stream of
  * committed transactions and applies it per-primary-key. Its operators —
  * k-way ordered merge (`drainer/merge.go:153-335`), merge-by-primary-key log
  * compaction (`pkg/loader/merge.go:21-141`), watermark generation
  * (`pkg/util/ts.go:59-66`), prewrite/commit matching
  * (`pump/storage/sorter.go:100-239`) — become declarative DataFrame plans
  * here: one hash shuffle on the key, window functions per key, and
  * map-side-combinable aggregations. At 100 TB the only shuffle is the
  * partition-by-key exchange, which is unavoidable for per-key semantics and
  * scales linearly with executors.
  *
  * The synthetic change stream is derived from the driver's `events` table:
  * `event_id` is the commit timestamp (TSO analog), `user_id` the primary
  * key, and `event_type` maps onto insert/update/delete ops.
  */
object Cdc {

  /** Shared op mapping, used verbatim by both the Spark plan and the DuckDB
    * oracle so the two engines agree by construction. */
  val opCaseSql: String =
    "CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END"

  /** DuckDB CTE body for the change envelope (oracle side of [[changes]]). */
  val changesCte: String =
    s"""SELECT event_id AS commit_ts, user_id AS pk,
       |  $opCaseSql AS op,
       |  event_type, ts, value, props
       |FROM events""".stripMargin

  /** Max commit ts of a change feed, 0 on an empty one — the NULL max
    * would NPE a bare getLong where every degenerate path should just
    * slice an empty window. One-row aggregate; shared by every staged
    * query builder. */
  def maxCommitTs(changes: DataFrame): Long = {
    val r = changes.agg(max("commit_ts")).head
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** M1 `TiBinlogToTxn` analog (ref: drainer/translator/mysql.go:108-210):
    * raw ingest record → change-event envelope. Pure projection, no shuffle;
    * Catalyst prunes unused envelope columns upstream of any consumer. */
  def changes(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id").as("commit_ts"),
      col("user_id").as("pk"),
      expr(opCaseSql).as("op"), // ONE mapping, shared with every oracle CTE
      col("event_type"), col("ts"), col("value"), col("props"))

  /** A1: merge-by-primary-key log compaction
    * (ref: pkg/loader/merge.go:21-141 — fold algebra I+U→I, I+D→D, U+U→U,
    * D+I→I; ≤1 DML emitted per key).
    *
    * Batch form: one shuffle on pk, then two window functions evaluated in a
    * single pass per partition. The final op is a function of (first op,
    * last op) because the fold algebra is associative on op types; the final
    * row image is the last event's. Streaming form: [[graft.ops.MergeAlgebra]]
    * as a typed Aggregator.
    */
  def compactByPk(changes: DataFrame): DataFrame = {
    val byPk    = Window.partitionBy("pk").orderBy(col("commit_ts"))
    val byPkAll = byPk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    changes
      .withColumn("rn", row_number().over(Window.partitionBy("pk").orderBy(col("commit_ts").desc)))
      .withColumn("first_op", first("op").over(byPkAll))
      .filter(col("rn") === 1)
      .select(
        col("pk"), col("commit_ts"), col("value"),
        when(col("op") === "D", "D")
          .when(col("first_op") === "U", "U")
          .otherwise("I").as("op"))
  }

  def compactSql: String =
    s"""WITH c AS ($changesCte), r AS (
       |  SELECT pk, commit_ts, value, op,
       |    row_number() OVER (PARTITION BY pk ORDER BY commit_ts DESC) AS rn,
       |    first_value(op) OVER (PARTITION BY pk ORDER BY commit_ts
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_op
       |  FROM c)
       |SELECT pk, commit_ts, value,
       |  CASE WHEN op = 'D' THEN 'D' WHEN first_op = 'U' THEN 'U' ELSE 'I' END AS op
       |FROM r WHERE rn = 1""".stripMargin

  /** Reparo-style PITR replay (ref: reparo/read.go:48-110 range-filters the
    * pb-file stream to [start, stop]; reparo/syncer applies it): the LIVE
    * table state as of a recovery point — here 60% of the stream's max
    * commit_ts, so the query exercises the same fraction at every scale
    * factor. Replay = range filter (pushed into the scan; on a
    * ts-partitioned lake this is partition pruning) + per-PK log compaction;
    * rows whose final op is a delete do not exist at the recovery point and
    * are dropped. The recovery threshold is a one-row aggregate broadcast —
    * no second pass over the stream. */
  def pitrReplay(spark: SparkSession, dir: String): DataFrame = {
    val c = changes(spark, dir)
    // `div`, not `/`: Column./ on longs is double division
    val stop = c.agg(expr("max(commit_ts) * 6 div 10").as("stop_ts"))
    val upTo = c.crossJoin(broadcast(stop))
      .filter(col("commit_ts") <= col("stop_ts"))
      .drop("stop_ts")
    compactByPk(upTo).filter(col("op") =!= "D")
  }

  def pitrReplaySql: String =
    s"""WITH c AS ($changesCte),
       |f AS (SELECT * FROM c
       |      WHERE commit_ts <= (SELECT max(commit_ts) * 6 // 10 FROM c)),
       |r AS (
       |  SELECT pk, commit_ts, value, op,
       |    row_number() OVER (PARTITION BY pk ORDER BY commit_ts DESC) AS rn,
       |    first_value(op) OVER (PARTITION BY pk ORDER BY commit_ts
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_op
       |  FROM f)
       |SELECT pk, commit_ts, value,
       |  CASE WHEN first_op = 'U' THEN 'U' ELSE 'I' END AS op
       |FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin

  /** T2: k-way ordered merge across pump sources
    * (ref: drainer/merge.go:153-335 min-heap over one head per source).
    *
    * Spark-first: each source is a partition of the bus; `unionByName` +
    * event-time ordering replaces the driver-side heap. The heap is a
    * single-node bottleneck in the reference; here ordering is restored
    * per-key by the downstream shuffle, and globally by sort only when a
    * total order is demanded (range-partitioned sort, parallel at scale).
    * The `source_id` column stands in for the pump NodeID.
    */
  def kwayMerge(sources: Seq[DataFrame]): DataFrame =
    sources.reduce(_ unionByName _)

  /** The 4-pump synthetic split of the change stream (pump = pk hash). */
  def pumpSources(spark: SparkSession, dir: String, pumps: Int = 4): Seq[DataFrame] = {
    val c = changes(spark, dir).withColumn("source_id", pmod(col("pk"), lit(pumps)))
    (0 until pumps).map(i => c.filter(col("source_id") === i))
  }

  def kwayMergeQuery(spark: SparkSession, dir: String): DataFrame =
    kwayMerge(pumpSources(spark, dir))
      .select("source_id", "commit_ts", "pk", "op")

  def kwayMergeSql: String =
    s"""WITH c AS ($changesCte),
       |s AS (SELECT *, pk % 4 AS source_id FROM c)
       |SELECT source_id, commit_ts, pk, op FROM s WHERE source_id = 0
       |UNION ALL SELECT source_id, commit_ts, pk, op FROM s WHERE source_id = 1
       |UNION ALL SELECT source_id, commit_ts, pk, op FROM s WHERE source_id = 2
       |UNION ALL SELECT source_id, commit_ts, pk, op FROM s WHERE source_id = 3""".stripMargin

  /** T2 observability: disorder / duplicate counters on the merged stream
    * (ref: drainer/merge.go:318-329 — a binlog whose commitTs is below the
    * last output TS increments `disorderBinlogCount`; an equal commitTs is
    * logged as a duplicate and dropped).
    *
    * Batch analog: arrival order per source is a deterministic jitter of
    * commit order (late/early arrivals) over an at-least-once stream (every
    * commit_ts % 5 == 0 row is replayed once). A row arriving below the
    * running max of previously arrived commit_ts is disordered; equal to it,
    * a duplicate. One shuffle on source_id + a single window pass, then a
    * 4-row aggregate — counters cost the same exchange the merge already
    * needs. */
  def mergeQuality(spark: SparkSession, dir: String): DataFrame = {
    val c = changes(spark, dir).select("commit_ts", "pk")
    val stream = c.withColumn("is_replay", lit(0L))
      .unionByName(c.filter(col("commit_ts") % 5 === 0).withColumn("is_replay", lit(1L)))
      .withColumn("source_id", pmod(col("pk"), lit(4)))
      .withColumn("arrival", col("commit_ts") + pmod(col("pk"), lit(7)) - 3)
    val w = Window.partitionBy("source_id")
      .orderBy("arrival", "commit_ts", "is_replay")
      .rowsBetween(Window.unboundedPreceding, -1)
    stream.withColumn("max_prev", max("commit_ts").over(w))
      .select(col("source_id"),
        when(col("max_prev").isNotNull && col("commit_ts") < col("max_prev"), 1L)
          .otherwise(0L).as("is_disordered"),
        when(col("max_prev").isNotNull && col("commit_ts") === col("max_prev"), 1L)
          .otherwise(0L).as("is_duplicate"))
      .groupBy("source_id")
      .agg(count(lit(1)).as("n_arrivals"),
        sum("is_disordered").as("n_disordered"),
        sum("is_duplicate").as("n_duplicate"))
  }

  def mergeQualitySql: String =
    s"""WITH c AS ($changesCte),
       |stream AS (
       |  SELECT commit_ts, pk, 0 AS is_replay FROM c
       |  UNION ALL
       |  SELECT commit_ts, pk, 1 FROM c WHERE commit_ts % 5 = 0),
       |arr AS (
       |  SELECT pk % 4 AS source_id, commit_ts, is_replay,
       |    commit_ts + pk % 7 - 3 AS arrival
       |  FROM stream),
       |m AS (
       |  SELECT source_id, commit_ts,
       |    max(commit_ts) OVER (PARTITION BY source_id
       |      ORDER BY arrival, commit_ts, is_replay
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_prev
       |  FROM arr)
       |SELECT source_id, count(*) AS n_arrivals,
       |  CAST(sum(CASE WHEN max_prev IS NOT NULL AND commit_ts < max_prev THEN 1 ELSE 0 END) AS BIGINT) AS n_disordered,
       |  CAST(sum(CASE WHEN max_prev IS NOT NULL AND commit_ts = max_prev THEN 1 ELSE 0 END) AS BIGINT) AS n_duplicate
       |FROM m GROUP BY 1""".stripMargin

  /** T3: watermark generation / tracking
    * (ref: pump/server.go:467-527 fake binlogs advance downstream TS;
    * drainer waits for every live source — merge.go:236-335).
    * Per-source high watermark plus the global low watermark (the min across
    * sources = safe-to-emit frontier). Map-side combinable max, then a
    * 4-row window — negligible at any scale.
    */
  def watermarks(spark: SparkSession, dir: String): DataFrame = {
    val perPump = changes(spark, dir)
      .withColumn("source_id", pmod(col("pk"), lit(4)))
      .groupBy("source_id")
      .agg(max("commit_ts").as("source_watermark"))
    // global frontier via aggregate + broadcast, not an unpartitioned window
    // (which would move every row to a single partition at scale)
    perPump.crossJoin(broadcast(
      perPump.agg(min("source_watermark").as("global_watermark"))))
  }

  def watermarksSql: String =
    s"""WITH c AS ($changesCte),
       |p AS (SELECT pk % 4 AS source_id, max(commit_ts) AS source_watermark
       |      FROM c GROUP BY 1)
       |SELECT source_id, source_watermark,
       |       min(source_watermark) OVER () AS global_watermark FROM p""".stripMargin

  /** T1: prewrite/commit matching, batch analog
    * (ref: pump/storage/sorter.go:100-239 pairs Prewrite with Commit by
    * startTS; storage.go:1081-1113 joins the payload).
    * Here: each 'purchase' (commit) is paired with the latest preceding
    * 'click' (prewrite) of the same key — a per-key ordered scan, i.e. one
    * shuffle + window with `last(_, ignoreNulls)`. The streaming twin with
    * timeout lives in [[graft.streaming.PcMatcher]].
    */
  def pcMatch(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(spark, dir)
      .withColumn("click_id",
        when(col("event_type") === "click", col("event_id")))
      .withColumn("prewrite_id", last("click_id", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("commit_id"), col("prewrite_id"))
  }

  def pcMatchSql: String =
    """SELECT user_id, commit_id, prewrite_id FROM (
      |  SELECT user_id, event_id AS commit_id, event_type,
      |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY event_id) AS prewrite_id
      |  FROM events)
      |WHERE event_type = 'purchase'""".stripMargin

  /** Snapshot diff — the engine's own sync_diff_inspector
    * (ref: tests/_utils/check_data:9 — upstream vs downstream state diffed
    * row-by-row is the reference's correctness oracle; SURVEY §5.3). The two
    * snapshots are the compacted state at mid-stream vs end-of-stream; a
    * single full-outer join on the key classifies every row as
    * added/removed/changed/same. One shuffle per compaction plus the join's —
    * all on the same key, so at scale the exchanges line up. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val c = changes(spark, dir)
    val cutoff = c.agg(floor(max("commit_ts") / 2).cast("long").as("t1"))
    val live = (df: DataFrame) => compactByPk(df).filter(col("op") =!= "D")
    val s1 = live(c.crossJoin(broadcast(cutoff)).filter(col("commit_ts") <= col("t1")).drop("t1"))
      .select(col("pk"), col("value").as("old_value"))
    val s2 = live(c).select(col("pk"), col("value").as("new_value"))
    s1.join(s2, Seq("pk"), "full_outer")
      .select(col("pk"), col("old_value"), col("new_value"),
        when(col("old_value").isNull, "added")
          .when(col("new_value").isNull, "removed")
          .when(col("old_value") === col("new_value"), "same")
          .otherwise("changed").as("status"))
  }

  def snapshotDiffSql: String =
    s"""WITH c AS ($changesCte),
       |cut AS (SELECT CAST(floor(max(commit_ts) / 2) AS BIGINT) AS t1 FROM c),
       |s1 AS (
       |  SELECT pk, value AS old_value FROM (
       |    SELECT pk, value, op,
       |      row_number() OVER (PARTITION BY pk ORDER BY commit_ts DESC) AS rn
       |    FROM c WHERE commit_ts <= (SELECT t1 FROM cut))
       |  WHERE rn = 1 AND op <> 'D'),
       |s2 AS (
       |  SELECT pk, value AS new_value FROM (
       |    SELECT pk, value, op,
       |      row_number() OVER (PARTITION BY pk ORDER BY commit_ts DESC) AS rn
       |    FROM c)
       |  WHERE rn = 1 AND op <> 'D')
       |SELECT coalesce(s1.pk, s2.pk) AS pk, old_value, new_value,
       |  CASE WHEN old_value IS NULL THEN 'added'
       |       WHEN new_value IS NULL THEN 'removed'
       |       WHEN old_value = new_value THEN 'same'
       |       ELSE 'changed' END AS status
       |FROM s1 FULL OUTER JOIN s2 ON s1.pk = s2.pk""".stripMargin
}
