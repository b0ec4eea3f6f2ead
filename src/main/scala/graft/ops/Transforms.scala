package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Row-shaping transforms and aggregation-like operators. */
object Transforms {

  /** T6/T7: schema-versioned decode + default/zero fill
    * (ref: drainer/translator/translator.go:125-227 getDefaultOrZeroValue —
    * columns missing from an old-version row image get the column default or
    * the type zero value). Analog: the `props` JSON payload is the
    * loosely-typed row image; absent keys are filled with defaults.
    * `get_json_object` is codegen'd; no shuffle. */
  def defaultFill(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      coalesce(get_json_object(col("props"), "$.k").cast("long"), lit(-1L)).as("k"),
      coalesce(get_json_object(col("props"), "$.missing").cast("long"), lit(0L)).as("missing_col"),
      coalesce(col("value"), lit(0.0)).as("value_filled"))

  def defaultFillSql: String =
    """SELECT event_id,
      |  coalesce(CAST(props->>'$.k' AS BIGINT), -1) AS k,
      |  coalesce(CAST(props->>'$.missing' AS BIGINT), 0) AS missing_col,
      |  coalesce(value, 0.0) AS value_filled
      |FROM events""".stripMargin

  /** T9: intra-transaction sequence restore
    * (ref: drainer/translator/sequence_iterator.go:32-70 re-interleaves
    * mutations in original statement order). Per-key ordered sequence
    * numbers: one shuffle on the key, `row_number` per partition. */
  def sequenceRestore(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("pk").orderBy("commit_ts")
    Cdc.changes(spark, dir)
      .withColumn("seq", row_number().over(w).cast("long"))
      .select("pk", "seq", "commit_ts", "op", "event_type")
  }

  def sequenceRestoreSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT pk,
       |  row_number() OVER (PARTITION BY pk ORDER BY commit_ts) AS seq,
       |  commit_ts, op, event_type
       |FROM c""".stripMargin

  /** T9 (full form): intra-transaction mutation re-interleave
    * (ref: drainer/translator/sequence_iterator.go:36-61 — a TableMutation
    * carries type-segregated row arrays (InsertedRows/UpdatedRows/
    * DeletedRows) plus a `Sequence` array of mutation types in original
    * statement order; `next()` walks Sequence and pops the head of the
    * matching array).
    *
    * The iterator's cursor state is expressed relationally: a sequence
    * entry's array index is its within-(txn, op) occurrence rank. So the
    * restore is two window ranks + one join —
    *  - arrays side: (txn, op, op_idx → payload), op_idx = append order;
    *  - sequence side: (txn, seq_idx, op), rank = row_number over
    *    (txn, op) ordered by seq_idx;
    *  - equi-join on (txn, op, idx) recovers the payload at each statement
    *    position.
    * Both windows and the join hash on txn_id first, so at scale this is
    * one exchange by txn reused across all three operators, and no txn's
    * data ever leaves its partition — wide transactions stay intact. */
  def seqInterleave(spark: SparkSession, dir: String): DataFrame = {
    val c = Cdc.changes(spark, dir)
      .withColumn("txn_id", floor(col("commit_ts") / 10).cast("long"))
    // wire format: type-segregated payload arrays, appended in commit order
    val arrays = c
      .withColumn("op_idx",
        row_number().over(Window.partitionBy("txn_id", "op").orderBy("commit_ts")))
      .select("txn_id", "op", "op_idx", "commit_ts", "value")
    // the Sequence: only the mutation type at each statement position
    val sequence = c
      .withColumn("seq_idx",
        row_number().over(Window.partitionBy("txn_id").orderBy("commit_ts")))
      .select("txn_id", "seq_idx", "op")
    // the iterator: within-op rank along the sequence = array cursor
    val cursor = sequence.withColumn("op_idx",
      row_number().over(Window.partitionBy("txn_id", "op").orderBy("seq_idx")))
    cursor.join(arrays, Seq("txn_id", "op", "op_idx"))
      .select("txn_id", "seq_idx", "op", "commit_ts", "value")
  }

  def seqInterleaveSql: String =
    s"""WITH c AS (SELECT t.*, CAST(floor(commit_ts / 10) AS BIGINT) AS txn_id
       |           FROM (${Cdc.changesCte}) t),
       |arrays AS (
       |  SELECT txn_id, op,
       |    row_number() OVER (PARTITION BY txn_id, op ORDER BY commit_ts) AS op_idx,
       |    commit_ts, value
       |  FROM c),
       |seq AS (
       |  SELECT txn_id, op,
       |    row_number() OVER (PARTITION BY txn_id ORDER BY commit_ts) AS seq_idx
       |  FROM c),
       |cursor AS (
       |  SELECT txn_id, op, seq_idx,
       |    row_number() OVER (PARTITION BY txn_id, op ORDER BY seq_idx) AS op_idx
       |  FROM seq)
       |SELECT s.txn_id, s.seq_idx, s.op, a.commit_ts, a.value
       |FROM cursor s JOIN arrays a USING (txn_id, op, op_idx)""".stripMargin

  /** SCD2 history: the change stream materialized as a slowly-changing-
    * dimension type-2 table — one row per (pk, version) with
    * [valid_from, valid_to) commit-ts bounds and a current-row flag. This
    * is the time-travel surface a CDC consumer builds downstream of the
    * reference's replication (ref: the checkpoint ts-map's PITR use,
    * drainer/checkpoint/mysql.go:34-196, answers "state as of ts" — SCD2 is
    * that answer precomputed for every ts). One shuffle on pk, one window
    * pass: valid_to = next change's commit_ts (null while current); delete
    * events close the interval and emit no open row. Point-in-time lookup
    * is then a plain `valid_from <= ts < coalesce(valid_to, inf)` filter —
    * partition-prunable when the table is written partitioned by
    * bucket(pk). */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("pk").orderBy("commit_ts")
    Cdc.changes(spark, dir)
      .withColumn("valid_to", lead("commit_ts", 1).over(w))
      .filter(col("op") =!= "D") // a delete closes the prior row, opens none
      .select(col("pk"), col("commit_ts").as("valid_from"), col("valid_to"),
        col("value"), col("op"),
        col("valid_to").isNull.as("is_current"))
  }

  def scd2Sql: String =
    s"""WITH c AS (${Cdc.changesCte}),
       |v AS (
       |  SELECT pk, commit_ts AS valid_from,
       |    lead(commit_ts) OVER (PARTITION BY pk ORDER BY commit_ts) AS valid_to,
       |    value, op
       |  FROM c)
       |SELECT pk, valid_from, valid_to, value, op,
       |  valid_to IS NULL AS is_current
       |FROM v WHERE op <> 'D'""".stripMargin

  /** M9: value formatting (ref: drainer/translator/mysql.go:252-294 —
    * decimal/time → string, numeric fidelity for the downstream driver).
    * Pure projection, codegen'd expressions. */
  def valueFormat(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
      col("value").cast("decimal(18,2)").cast("string").as("value_str"),
      get_json_object(col("props"), "$.k").as("k_str"))

  def valueFormatSql: String =
    """SELECT event_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
      |  CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value_str,
      |  props->>'$.k' AS k_str
      |FROM events""".stripMargin

  /** A2 + P2: batch grouping by table and hash dispatch to workers
    * (ref: pkg/loader/load.go:706-724 groups DMLs per table;
    * load.go:508-527 dispatches by key hash to 16 workers). In Spark the
    * dispatch IS the shuffle: `repartition(16, key)` guarantees per-key
    * ordering into the sink exactly like the causality dispatcher. The
    * observable analog: per-(worker, table) batch sizes. */
  def hashDispatch(spark: SparkSession, dir: String): DataFrame =
    Cdc.changes(spark, dir)
      .withColumn("worker", pmod(col("pk"), lit(16)))
      .groupBy("worker", "event_type")
      .agg(count(lit(1)).as("batch_rows"), max("commit_ts").as("max_ts"))

  def hashDispatchSql: String =
    // ((pk % 16) + 16) % 16, the zorder twin's spelling: the Spark side
    // is pmod, and a signed key under plain % would silently split the
    // engines (r17 review-sweep close)
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT ((pk % 16) + 16) % 16 AS worker, event_type,
       |  count(*) AS batch_rows, max(commit_ts) AS max_ts
       |FROM c GROUP BY 1, 2""".stripMargin

  /** A4: event counting / metrics (ref: pkg/loader/load.go:726-738 counters
    * per DML kind; drainer/metrics.go histograms). Partial (map-side)
    * aggregation then a 32-group reduce — trivially scalable. */
  def eventMetrics(spark: SparkSession, dir: String): DataFrame =
    Cdc.changes(spark, dir)
      .withColumn("value_bucket", floor(col("value") / 50.0).cast("long"))
      .groupBy("op", "value_bucket")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"))

  def eventMetricsSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT op, CAST(floor(value / 50.0) AS BIGINT) AS value_bucket,
       |  count(*) AS n,
       |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
       |FROM c GROUP BY 1, 2""".stripMargin

  /** A5: ack-window minimum tracking (ref: drainer/sync/kafka.go:262-330 —
    * sliding window over un-acked messages, emit success in commitTs order).
    * Batch analog: running minimum of the last 10 un-acked ids per key. */
  def ackWindowMin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("pk").orderBy("commit_ts").rowsBetween(-9, 0)
    Cdc.changes(spark, dir)
      .withColumn("window_min_ts", min("commit_ts").over(w))
      .select("pk", "commit_ts", "window_min_ts")
  }

  def ackWindowMinSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT pk, commit_ts,
       |  min(commit_ts) OVER (PARTITION BY pk ORDER BY commit_ts
       |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS window_min_ts
       |FROM c""".stripMargin

  /** T5: schema-version pick (ref: drainer/schema.go:221-234 — newest
    * TableInfo with version ≤ the binlog's SchemaVersion; replay driven from
    * drainer/syncer.go:393-397). The DDL/version stream is tiny by nature
    * (DDL is rare), so it is collected into ONE broadcast row holding the
    * sorted version array; each event then resolves its version with a
    * codegen'd array scan — no row blowup, no extra shuffle, unlike the
    * naive `left.ts >= right.ts` non-equi join whose intermediate grows as
    * events × versions. Survives any left-side scale. */
  def schemaVersion(spark: SparkSession, dir: String): DataFrame = {
    val c = Cdc.changes(spark, dir)
    val versions = c.filter(col("commit_ts") % 10000 === 0)
      .agg(sort_array(collect_list(col("commit_ts"))).as("__vs"))
    c.select("commit_ts", "pk", "op")
      .crossJoin(broadcast(versions))
      .withColumn("schema_version",
        array_max(filter(col("__vs"), v => v <= col("commit_ts"))))
      .drop("__vs")
  }

  def schemaVersionSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT c.commit_ts, c.pk, c.op,
       |  (SELECT max(v.commit_ts) FROM c v
       |   WHERE v.commit_ts % 10000 = 0 AND v.commit_ts <= c.commit_ts) AS schema_version
       |FROM c""".stripMargin

  /** T8: update-image split (ref: drainer/translator/translator.go:231-350
    * DecodeOldAndNewRow — an update row carries (before, after) images).
    * The before image is reconstructed as the previous value per key: one
    * shuffle on pk, `lag` inside the per-key ordered window. */
  def updateImages(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("pk").orderBy("commit_ts")
    Cdc.changes(spark, dir)
      .withColumn("before_value", lag("value", 1).over(w))
      .filter(col("op") === "U")
      .select(col("pk"), col("commit_ts"), col("before_value"),
        col("value").as("after_value"))
  }

  def updateImagesSql: String =
    s"""WITH c AS (${Cdc.changesCte}), i AS (
       |  SELECT pk, commit_ts, op,
       |    lag(value, 1) OVER (PARTITION BY pk ORDER BY commit_ts) AS before_value,
       |    value AS after_value
       |  FROM c)
       |SELECT pk, commit_ts, before_value, after_value FROM i WHERE op = 'U'""".stripMargin

  /** A3: bulk statement batching (ref: pkg/loader/executor.go:179-244 builds
    * multi-VALUES statements; util.go:290-300 splits at batch size 128).
    * Observable analog: per-worker ordered rows are chunked into batches of
    * 128; the query reports each batch's bounds. Same shuffle as the
    * dispatch itself; the chunking is a pure window + integer division. */
  def bulkBatches(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("worker").orderBy("commit_ts")
    Cdc.changes(spark, dir)
      .withColumn("worker", pmod(col("pk"), lit(16)))
      .withColumn("rn", row_number().over(w))
      .withColumn("batch_id", floor((col("rn") - 1) / 128).cast("long"))
      .groupBy("worker", "batch_id")
      .agg(count(lit(1)).as("batch_rows"),
        min("commit_ts").as("first_ts"), max("commit_ts").as("last_ts"))
  }

  def bulkBatchesSql: String =
    s"""WITH c AS (${Cdc.changesCte}), r AS (
       |  SELECT ((pk % 16) + 16) % 16 AS worker, commit_ts,
       |    row_number() OVER (PARTITION BY ((pk % 16) + 16) % 16
       |      ORDER BY commit_ts) AS rn
       |  FROM c)
       |SELECT worker, CAST(floor((rn - 1) / 128) AS BIGINT) AS batch_id,
       |  count(*) AS batch_rows, min(commit_ts) AS first_ts, max(commit_ts) AS last_ts
       |FROM r GROUP BY 1, 2""".stripMargin

  /** A6: applied-TS sampling (ref: pkg/loader/load.go:313-322, 965-985 —
    * once a minute the loader records the downstream applied position).
    * Batch analog: per event-time minute, the highest applied commit id.
    * Map-side combinable aggregate over a time bucket. */
  def appliedTs(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(max("event_id").as("applied_ts"), count(lit(1)).as("n"))

  def appliedTsSql: String =
    """SELECT date_trunc('minute', ts) AS minute,
      |  max(event_id) AS applied_ts, count(*) AS n
      |FROM events GROUP BY 1""".stripMargin

  /** Sessionization: split each user's event sequence at >30-minute gaps and
    * aggregate per session — the standard event-pipeline operator (and the
    * batch twin of Spark's streaming `session_window`). One shuffle on the
    * user key; the gap detection and running session counter evaluate in a
    * single window pass.
    *
    * All time arithmetic runs on epoch-microsecond BIGINTs in BOTH engines
    * (`ts` is stored as timestamp[us], read back via `unix_micros`):
    * fractional-second `epoch()` arithmetic vs truncated `unix_timestamp`
    * seconds can flip a session boundary when a gap straddles 1800 s — so the
    * gap is compared in exact integer microseconds and the session bounds are
    * emitted as the same integers. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(w))
      .withColumn("new_session",
        when(col("gap_us").isNull || col("gap_us") > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_session").over(wRun))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min("ts_us").as("session_start_us"), max("ts_us").as("session_end_us"))
  }

  def sessionizeSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events),
      |g AS (
      |  SELECT user_id, event_id, ts_us,
      |    ts_us - lag(ts_us, 1) OVER w AS gap_us
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |s AS (
      |  SELECT user_id, event_id, ts_us,
      |    CAST(sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us
      |FROM s GROUP BY 1, 2""".stripMargin
}
