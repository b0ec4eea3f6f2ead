package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval-overlap (range) join — an operator Spark's optimizer has no
  * native strategy for: `point.ts BETWEEN interval.start AND interval.end`
  * alone plans as a broadcast-nested-loop (quadratic, cluster-killing at
  * scale).
  *
  * Scale shape: BUCKETIZE. Intervals explode onto the fixed-width time
  * buckets they cover, points map to their single bucket, and the match
  * becomes an equi-join on the bucket id followed by the exact range
  * filter. Cost is O(points + intervals × buckets-per-interval + output):
  * shuffle keys are uniform time buckets, every stage hash-partitions, and
  * no pair outside a shared bucket is ever formed. Width tunes the
  * explode-vs-selectivity trade: ~the typical interval length, so most
  * intervals land in O(1) buckets (a degenerate interval spanning the whole
  * axis would fan out axis/width rows — cap or split such outliers
  * upstream, same discipline as the LSH occupancy caps).
  */
object RangeJoin {

  /** Join `points` (with long column `ts`) to `intervals` (long columns
    * `start`, `end`, inclusive) on ts ∈ [start, end]. */
  def bucketed(points: DataFrame, ts: String, intervals: DataFrame,
      start: String, end: String, width: Long): DataFrame = {
    // div 0 is NULL under non-ANSI Spark: every bucket would be NULL and
    // the join silently empty — "no overlaps" instead of "bad parameter"
    require(width > 0, s"bucket width must be positive, got $width")
    // the output carries BOTH sides' columns: a shared name would make
    // the range filter ambiguous (AnalysisException) or the output
    // unselectable — fail with the offending names instead
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals share column names ${shared.mkString(",")} — " +
        "rename one side before the range join")
    // collision-proof internal key: a caller whose frames already carry a
    // "bucket" column (e.g. LSH-bucketed inputs) must not get it clobbered
    val bk = "__rj_bucket"
    // inverted intervals (end < start) match nothing; dropping them up
    // front also keeps `sequence` from generating a descending range
    val iv = intervals.filter(col(start) <= col(end)).withColumn(bk,
      explode(sequence(expr(s"$start div $width"), expr(s"$end div $width"))))
    val pt = points.withColumn(bk, expr(s"$ts div $width"))
    // a point has exactly one bucket, so no pair can match twice
    pt.join(iv, bk)
      .filter(col(ts) >= col(start) && col(ts) <= col(end))
      .drop(bk)
  }

  /** Session-concurrency query: for a deterministic 1-in-97 sample of
    * events, how many sessions (any user) were active at that instant.
    * Points = sampled events, intervals = the sessionize output; one
    * bucketized range join + a per-event count. The DuckDB oracle runs the
    * plain BETWEEN join — same semantics, quadratic plan, fine at oracle
    * scale. */
  def sessionOverlap(spark: SparkSession, dir: String): DataFrame = {
    val points = graft.model.Tables.events(spark, dir)
      .filter(col("event_id") % 97 === 0)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val intervals = Transforms.sessionize(spark, dir)
      .select(col("session_start_us"), col("session_end_us"))
    bucketed(points, "ts_us", intervals,
        "session_start_us", "session_end_us", width = 3600L * 1000000L)
      .groupBy("event_id", "ts_us")
      .agg(count(lit(1)).as("n_active"))
  }

  def sessionOverlapSql: String =
    s"""WITH sessions AS (${Transforms.sessionizeSql}),
       |pts AS (
       |  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
       |  FROM events WHERE event_id % 97 = 0)
       |SELECT p.event_id, p.ts_us, count(*) AS n_active
       |FROM pts p JOIN sessions s
       |  ON p.ts_us BETWEEN s.session_start_us AND s.session_end_us
       |GROUP BY 1, 2""".stripMargin
}
