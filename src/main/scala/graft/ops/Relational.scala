package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Relational analytics surface (SURVEY.md §2.8).
  *
  * The reference has no SQL surface of its own; these queries exercise the
  * classic operators the harness expects — aggregation with partial
  * (map-side) combine, broadcast vs shuffle joins, and top-k windows — and
  * double as the headline benchmark set.
  *
  * Numeric policy for oracle parity: money sums go through DECIMAL(18,2)
  * (exact, order-independent — a double sum over 600k rows has error larger
  * than the 0.005 rounding boundary), then round + cast back to DOUBLE so
  * both engines emit bit-identical values. Averages stay double and are
  * rounded to 4 digits (error ~1e-13, far from the boundary).
  */
object Relational {

  private def dec(c: org.apache.spark.sql.Column)  = c.cast("decimal(18,2)")
  // products of 2-decimal money × 2-decimal rate have ≤4 exact decimals:
  // casting the double to scale 4 is unambiguous, scale 2 is not.
  private def dec4(c: org.apache.spark.sql.Column) = c.cast("decimal(18,4)")

  /** Pricing summary (TPC-H Q1 shape): single scan, partial agg, 6-group
    * reduce. At 100 TB this is scan-bound; the plan is one WholeStageCodegen
    * span over the pushed-down scan. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum(dec(col("l_quantity"))), 2).cast("double").as("sum_qty"),
        round(sum(dec(col("l_extendedprice"))), 2).cast("double").as("sum_base_price"),
        round(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))), 2)
          .cast("double").as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))

  def pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Shipping priority (TPC-H Q3 shape): customer is small → broadcast to
    * the orders scan; orders⨝lineitem shuffles on the join key only after
    * both sides are filtered. Top-10 by (rounded revenue, key) is an
    * order-stable take. */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  def shippingPrioritySql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Local supplier volume (TPC-H Q5 shape): dimension chain
    * region→nation→{customer,supplier} is broadcast end-to-end; the only
    * shuffles are the two fact-side join keys. */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(spark, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(s),
        l("l_suppkey") === s("s_suppkey") && c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))), 2)
        .cast("double").as("revenue"))

  }

  def localSupplierVolumeSql: String =
    """SELECT n_name,
      |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  /** Top-k per group: top-3 parts by retail price per brand. One shuffle on
    * the group key; rank inside the window with a deterministic key
    * tie-break so both engines pick identical rows. */
  def topKPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(spark, dir)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("p_brand", "rank", "p_partkey", "p_retailprice")
  }

  def topKPerGroupSql: String =
    """SELECT p_brand, rank, p_partkey, p_retailprice FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    row_number() OVER (PARTITION BY p_brand
      |      ORDER BY p_retailprice DESC, p_partkey) AS rank
      |  FROM part)
      |WHERE rank <= 3""".stripMargin

  /** Revenue forecast (TPC-H Q6 shape): tight range + band predicates all
    * pushed into the parquet scan, then a single global sum — the cheapest
    * possible plan at any scale (scan-bound, one-row exchange). */
  def revenueForecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(round(sum(dec4(col("l_extendedprice") * col("l_discount"))), 2)
        .cast("double").as("revenue"))

  def revenueForecastSql: String =
    """SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Promotion effect (TPC-H Q14 shape): part is a dimension → broadcast to
    * the filtered lineitem scan; conditional aggregation computes the promo
    * share in the same pass. Sums are exact decimals; the final ratio is a
    * double rounded to 4 digits. */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-04-01").cast("timestamp"))
    val p = Tables.part(spark, dir)
    val disc = dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .agg(round(
        lit(100.0) *
          sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0).cast("decimal(18,4)")))
            .cast("double") /
          sum(disc).cast("double"), 4).as("promo_revenue"))
  }

  def promoRevenueSql: String =
    """SELECT round(
      |  100.0 *
      |  CAST(sum(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
      |        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
      |  4) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""".stripMargin

  /** Large-volume orders (TPC-H Q18 shape): the HAVING subquery aggregates
    * lineitem first (map-side partial sums), so the expensive join only sees
    * qualifying orderkeys; customer broadcasts. Deterministic top-100. */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(round(sum(dec(col("l_quantity"))), 2).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > 300.0)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(big, o("o_orderkey") === big("l_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  def largeOrdersSql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
      |FROM orders
      |JOIN (SELECT l_orderkey,
      |        CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) > 300.0) b
      |  ON o_orderkey = b.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** Existential semi-join: customers holding at least one high-value order.
    * `left_semi` keeps the probe side single-pass and never duplicates
    * customer rows (unlike join+distinct); the filtered orders side is the
    * build side of a broadcast hash join at this selectivity. */
  def bigSpenders(spark: SparkSession, dir: String): DataFrame = {
    val hot = Tables.orders(spark, dir).filter(col("o_totalprice") > 450000.0)
    Tables.customer(spark, dir)
      .join(broadcast(hot), col("c_custkey") === hot("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
  }

  def bigSpendersSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)""".stripMargin

  /** Anti-join: customers with NO high-value order — the loopback/truncate
    * drop shape (F4/F6) on relational data. `left_anti` against the same
    * broadcast build side. */
  def dormantCustomers(spark: SparkSession, dir: String): DataFrame = {
    val hot = Tables.orders(spark, dir).filter(col("o_totalprice") > 450000.0)
    Tables.customer(spark, dir)
      .join(broadcast(hot), col("c_custkey") === hot("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
  }

  def dormantCustomersSql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)""".stripMargin

  /** ROLLUP: hierarchical totals (per (flag,status), per flag, grand) in one
    * pass — Spark expands grouping sets map-side, so the cost is one scan +
    * one exchange regardless of how many levels roll up. */
  def rollupMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        round(sum(dec(col("l_quantity"))), 2).cast("double").as("sum_qty"))

  def rollupMetricsSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** PIVOT: per-day op-type counts as columns. With the pivot values fixed
    * up front this is a single conditional aggregation — no extra pass, no
    * shuffle beyond the group-by. Empty cells are 0 in both engines. */
  def pivotDailyOps(spark: SparkSession, dir: String): DataFrame =
    Cdc.changes(spark, dir)
      .withColumn("day", to_date(col("ts")))
      .groupBy("day")
      .pivot("op", Seq("I", "U", "D"))
      .agg(count(lit(1)))
      .select(col("day"),
        coalesce(col("I"), lit(0L)).as("n_insert"),
        coalesce(col("U"), lit(0L)).as("n_update"),
        coalesce(col("D"), lit(0L)).as("n_delete"))

  def pivotDailyOpsSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT CAST(ts AS DATE) AS day,
       |  count(CASE WHEN op = 'I' THEN 1 END) AS n_insert,
       |  count(CASE WHEN op = 'U' THEN 1 END) AS n_update,
       |  count(CASE WHEN op = 'D' THEN 1 END) AS n_delete
       |FROM c GROUP BY 1""".stripMargin

  /** Exact interpolated percentiles per group (median + p95) — both engines
    * use the (n-1)·p linear-interpolation definition; rounded to 4 digits so
    * the interpolation arithmetic hashes identically. */
  def valuePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"),
        count(lit(1)).as("n"))

  def valuePercentilesSql: String =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.95), 4) AS p95,
      |  count(*) AS n
      |FROM events GROUP BY 1""".stripMargin

  /** Window-function surface: rank, dense_rank, ntile and lead per key in
    * one window pass (single shuffle on the key, one sort per partition). */
  def windowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("pk").orderBy(col("commit_ts"))
    Cdc.changes(spark, dir)
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("next_value", lead("value", 1).over(w))
      .select("pk", "commit_ts", "rnk", "drnk", "quartile", "next_value")
  }

  def windowFuncsSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT pk, commit_ts,
       |  rank() OVER w AS rnk,
       |  dense_rank() OVER w AS drnk,
       |  ntile(4) OVER w AS quartile,
       |  lead(value, 1) OVER w AS next_value
       |FROM c
       |WINDOW w AS (PARTITION BY pk ORDER BY commit_ts)""".stripMargin
}
