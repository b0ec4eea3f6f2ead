package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Product-analytics operators over the `events` stream table — the batch
  * faces of the queries a CDC/event pipeline feeds downstream (funnels,
  * cohorts, anomaly flags, hopping-window rates). The reference's drainer
  * ships ordered event streams to exactly these kinds of consumers
  * (`drainer/syncer.go`, `arbiter/server.go`); here they are first-class
  * relational operators.
  *
  * Scale discipline shared by every query here:
  *  - all aggregation state is keyed by low-cardinality keys (user_id,
  *    event_type, window start) — one hash-partition shuffle each, no
  *    global sort, no unpartitioned window;
  *  - every float is derived from exact integer aggregates through an
  *    expression tree written identically in the DuckDB oracle, so results
  *    are bit-reproducible regardless of partitioning / accumulation order.
  */
object EventAnalytics {

  /** Conversion funnel view → click → purchase, ordered per user by event
    * time and bounded by conversion windows (click within 6 h of the first
    * view, purchase within 24 h of that click) — the windows are what make
    * the funnel a funnel rather than an existence check. Three keyed
    * min-aggregates on user_id (map-side combinable, one shuffle each; the
    * stage frames shrink monotonically), then a 3-row summary. At 100 TB
    * the per-user frames stay one row per user — no state explosion. */
  val ClickWindowUs: Long    = 6L * 3600L * 1000000L
  val PurchaseWindowUs: Long = 24L * 3600L * 1000000L

  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .where(col("us") >= col("t_view") && col("us") < col("t_view") + ClickWindowUs)
      .groupBy("user_id").agg(min("us").as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .where(col("us") >= col("t_click") && col("us") < col("t_click") + PurchaseWindowUs)
      .groupBy("user_id").agg(min("us").as("t_buy"))
    val n1 = v.agg(count(lit(1)).as("n")).withColumn("stage", lit("1_view"))
    val n2 = c.agg(count(lit(1)).as("n")).withColumn("stage", lit("2_click"))
    val n3 = p.agg(count(lit(1)).as("n")).withColumn("stage", lit("3_purchase"))
    // stage-1 size as a broadcast 1-row frame — no driver-side action
    val tot = v.agg(count(lit(1)).cast("double").as("total"))
    n1.unionByName(n2).unionByName(n3).crossJoin(broadcast(tot))
      .withColumn("conv_from_top", round(col("n") / col("total"), 4))
      .select("stage", "n", "conv_from_top")
  }

  def funnelSql: String =
    s"""WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      |), v AS (
      |  SELECT user_id, min(us) AS t_view FROM ev WHERE event_type = 'view' GROUP BY 1
      |), c AS (
      |  SELECT ev.user_id, min(us) AS t_click FROM ev JOIN v ON ev.user_id = v.user_id
      |  WHERE event_type = 'click' AND us >= t_view
      |    AND us < t_view + $ClickWindowUs GROUP BY 1
      |), p AS (
      |  SELECT ev.user_id, min(us) AS t_buy FROM ev JOIN c ON ev.user_id = c.user_id
      |  WHERE event_type = 'purchase' AND us >= t_click
      |    AND us < t_click + $PurchaseWindowUs GROUP BY 1
      |), stages AS (
      |  SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n FROM v
      |  UNION ALL SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
      |  UNION ALL SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p
      |)
      |SELECT stage, n,
      |       round(n / (SELECT CAST(count(*) AS DOUBLE) FROM v), 4) AS conv_from_top
      |FROM stages""".stripMargin

  /** Weekly cohort retention: users grouped by the ISO week of their first
    * event; for each (cohort_week, week_offset) the number of cohort
    * members active that week. Week index = epoch_us div one-week-of-micros
    * — pure integer arithmetic, identical in both engines. Two keyed
    * shuffles (user_id, then cohort cell); cohort state is one row per
    * user, cells are |weeks|² — both flat in corpus size. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_micros(ts) div 604800000000").as("week")) // 7d of micros
    val first = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    ev.join(first, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  def cohortRetentionSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // 604800000000 AS week FROM events
      |), first AS (
      |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1
      |)
      |SELECT cohort_week, ev.week - cohort_week AS week_offset,
      |       CAST(count(DISTINCT ev.user_id) AS BIGINT) AS n_active
      |FROM ev JOIN first ON ev.user_id = first.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Per-event-type 3σ anomaly summary. Values are fixed-pointed with
    * floor(value·10⁴) so the population sums S1=Σq, S2=Σq² are EXACT
    * integers (order-free); mean and variance then come from the single
    * expression `S2/n − (S1/n)²` evaluated on those integers — the same
    * doubles in any engine, bit for bit. The flag comparison
    * (q−mean)² > 9·var runs rowwise against the 5-row broadcast stats
    * frame. At 100 TB the int64 Σq² would overflow (≈6·10¹⁷ per 10⁵ rows);
    * the scale path is [[anomalyWide]] — the same sums in DECIMAL(38,0),
    * still exact, still order-free — and EventAnalyticsSpec pins the two
    * variants to identical output, so the documented scale path is code,
    * not prose. */
  def anomaly(spark: SparkSession, dir: String): DataFrame =
    anomalyImpl(spark, dir, wideSums = false)

  /** The 100 TB form of [[anomaly]]: population sums carried in
    * DECIMAL(38,0) (exact to 10³⁸ — Σq² headroom of ~10²⁰ rows) instead of
    * int64. Only the sum representation differs; every derived statistic
    * goes through the same double expressions, so at any scale where both
    * are exact the outputs are bit-identical. */
  def anomalyWide(spark: SparkSession, dir: String): DataFrame =
    anomalyImpl(spark, dir, wideSums = true)

  private def anomalyImpl(spark: SparkSession, dir: String,
      wideSums: Boolean): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), floor(col("value") * 10000).cast("long").as("q"))
    // exact integer sums: int64 (fast, overflows at ~10¹⁸) or DECIMAL(38,0)
    // (the wide path; per-row q² also multiplies in decimal so no int64
    // intermediate can overflow)
    val qs = if (wideSums) col("q").cast(org.apache.spark.sql.types.DecimalType(38, 0))
             else col("q")
    val stats = ev.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(qs).as("s1"),
      sum(qs * qs).as("s2"))
      // derived statistics evaluate on doubles in BOTH variants (long→double
      // and decimal→double round identically for equal exact values)
      .withColumn("mean_q", col("s1").cast("double") / col("n"))
      .withColumn("var_q", col("s2").cast("double") / col("n") -
        (col("s1").cast("double") / col("n")) * (col("s1").cast("double") / col("n")))
    ev.join(broadcast(stats), "event_type")
      .withColumn("dev2", (col("q") - col("mean_q")) * (col("q") - col("mean_q")))
      .groupBy("event_type")
      .agg(
        first("n").as("n"),
        round(first("mean_q") / 1e4, 4).as("mean_value"),
        // clamp: s2/n - mean² can round to a tiny NEGATIVE for a
        // near-constant series at large magnitude — Spark's sqrt would
        // yield NaN while DuckDB ABORTS on sqrt of a negative, so both
        // sides clamp at zero before the root
        round(sqrt(greatest(first("var_q"), lit(0.0))) / 1e4, 4).as("std_value"),
        sum(when(col("dev2") > lit(9.0) * col("var_q"), 1L).otherwise(0L)).as("n_anomalies"))
      .orderBy("event_type")
  }

  def anomalySql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(floor("value" * 10000) AS BIGINT) AS q FROM events
      |), stats AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(q) AS BIGINT) AS s1, CAST(sum(q*q) AS BIGINT) AS s2
      |  FROM ev GROUP BY 1
      |), st AS (
      |  SELECT event_type, n, s1/n AS mean_q, s2/n - (s1/n)*(s1/n) AS var_q FROM stats
      |)
      |SELECT ev.event_type, any_value(n) AS n,
      |       round(any_value(mean_q) / 1e4, 4) AS mean_value,
      |       round(sqrt(greatest(any_value(var_q), 0)) / 1e4, 4) AS std_value,
      |       CAST(sum(CASE WHEN (q - mean_q)*(q - mean_q) > 9.0*var_q
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
      |FROM ev JOIN st ON ev.event_type = st.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Hopping-window event rates: 1-hour windows sliding every 30 minutes,
    * per event_type — Spark's native `window()` generator, i.e. the exact
    * aggregation Structured Streaming runs incrementally with a watermark
    * (SURVEY §2.2 T3/T4); batch and stream share this plan. Each event
    * lands in size/hop = 2 windows; state is one row per (window, type).
    * Value sums stay in fixed-point int64 so window totals are exact. */
  def hoppingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), col("ts"), floor(col("value") * 10000).cast("long").as("q"))
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("q") / 1e4, 4).as("sum_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start_us", "event_type")

  def hoppingWindowSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) AS us,
      |         CAST(floor("value" * 10000) AS BIGINT) AS q
      |  FROM events
      |), hopped AS (
      |  SELECT event_type, q,
      |         (us // 1800000000 - k) * 1800000000 AS window_start_us
      |  FROM ev, unnest([0, 1]) AS t(k)
      |  WHERE us >= (us // 1800000000 - k) * 1800000000
      |    AND us <  (us // 1800000000 - k) * 1800000000 + 3600000000
      |)
      |SELECT window_start_us, event_type, CAST(count(*) AS BIGINT) AS n_events,
      |       round(sum(q) / 1e4, 4) AS sum_value
      |FROM hopped GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** User-journey transition matrix: for each consecutive event pair within
    * a user's stream (ordered by time, event id as the tie-break), the count
    * and conditional probability P(next | prev). The per-user lag window is
    * partitioned on user_id — state per partition is one user's history, so
    * the plan holds at any user count; the matrix itself is
    * |event types|² rows, constant. The journey's entry point is modeled
    * with a '_start' pseudo-state (each user's first event transitions out
    * of it), mirroring how Markov-chain attribution models seed their
    * chains. */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_type",
        coalesce(lag("event_type", 1).over(w), lit("_start")))
    val counts = pairs.groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("prev_type").agg(sum("n").as("tot"))
    counts.join(totals, "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n").cast("double") / col("tot"), 4).as("p_next"))
  }

  def transitionsSql: String =
    """WITH pairs AS (
      |  SELECT coalesce(lag(event_type) OVER w, '_start') AS prev_type,
      |         event_type AS next_type
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |counts AS (
      |  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
      |  FROM pairs GROUP BY 1, 2),
      |totals AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
      |           FROM counts GROUP BY 1)
      |SELECT prev_type, next_type, n,
      |  round(CAST(n AS DOUBLE) / tot, 4) AS p_next
      |FROM counts JOIN totals USING (prev_type)""".stripMargin
}
