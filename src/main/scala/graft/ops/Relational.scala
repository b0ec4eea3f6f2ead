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
      .join(c, o("o_custkey") === c("c_custkey"))
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
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s,
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
    l.join(p, l("l_partkey") === p("p_partkey"))
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
      .join(c, o("o_custkey") === c("c_custkey"))
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
      .join(hot, col("c_custkey") === hot("o_custkey"), "left_semi")
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
      .join(hot, col("c_custkey") === hot("o_custkey"), "left_anti")
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

  // -------------------------------------------------------------------
  // Wider TPC-H-shaped surface, adapted to the columns the synthetic
  // tables actually carry (no partsupp, no commit/receipt dates, no
  // shipmode/phone — see TESTDATA.md). Same numeric policy as above.
  // -------------------------------------------------------------------

  /** Order-priority check (TPC-H Q4 shape, late-shipment variant): orders in
    * one quarter having at least one line shipped > 60 days after the order
    * date. The correlated EXISTS is a `left_semi` join — single pass over
    * the filtered orders, no row duplication, and the lineitem side shuffles
    * only its join key + shipdate. */
  def priorityCount(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-10-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAY"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  def priorityCountSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |        WHERE l_orderkey = o_orderkey
      |          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  /** Volume shipping (TPC-H Q7 shape): bilateral trade volume between two
    * nations by year. Nation is broadcast twice under different aliases
    * (supplier side / customer side); the disjunctive nation-pair predicate
    * runs after both broadcasts, so the only shuffles are the two fact-side
    * equi-join keys. */
  // Two trade blocs instead of TPC-H's single nation pair: with 25 synthetic
  // nations a single ordered pair owns ~1/625 of the fact table and is empty
  // at sf0.001; the bloc×bloc disjunction keeps Q7's shape (the pair
  // predicate still runs after both nation broadcasts) at every SF.
  private val GroupA = Seq("NATION_1", "NATION_2", "NATION_3")
  private val GroupB = Seq("NATION_4", "NATION_5", "NATION_6")

  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n1), s("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), c("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation").isin(GroupA: _*) && col("cust_nation").isin(GroupB: _*)) ||
              (col("supp_nation").isin(GroupB: _*) && col("cust_nation").isin(GroupA: _*)))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(round(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))), 2)
        .cast("double").as("revenue"))
  }

  def volumeShippingSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l_shipdate) AS l_year,
      |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |  AND ((n1.n_name IN ('NATION_1','NATION_2','NATION_3')
      |          AND n2.n_name IN ('NATION_4','NATION_5','NATION_6'))
      |    OR (n1.n_name IN ('NATION_4','NATION_5','NATION_6')
      |          AND n2.n_name IN ('NATION_1','NATION_2','NATION_3')))
      |GROUP BY 1, 2, 3""".stripMargin

  /** National market share (TPC-H Q8 shape): NATION_3's share of AMERICA's
    * ECONOMY-part import volume per year. One conditional aggregation
    * computes numerator and denominator in the same pass; every dimension
    * broadcasts, the two fact joins are the only shuffles. The share is a
    * ratio of exact decimal sums, divided and rounded in double. */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_type") === "ECONOMY")
    val r = Tables.region(spark, dir).filter(col("r_name") === "AMERICA")
    val nC = Tables.nation(spark, dir)
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val nS = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val vol = dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    Tables.lineitem(spark, dir)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === o("o_orderkey"))
      .join(Tables.customer(spark, dir), o("o_custkey") === col("c_custkey"))
      .join(broadcast(nC), col("c_nationkey") === col("c_nk"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nS), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", vol)
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double") /
        sum(vol).cast("double"), 4).as("mkt_share"))
  }

  def marketShareSql: String =
    """SELECT year(o_orderdate) AS o_year,
      |  round(
      |    CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
      |          THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
      |          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
      |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
      |    4) AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1""".stripMargin

  /** Returned-item reporting (TPC-H Q10 shape): top 20 customers by revenue
    * lost to returns in one quarter. The returnflag + date filters land in
    * the scans before the orderkey shuffle; customer and nation broadcast to
    * the aggregated result, not the fact stream. */
  def returnedItems(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-04-01").cast("timestamp"))
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(round(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  def returnedItemsSql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      |GROUP BY 1, 2, 3, 4
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** Shipping-delay priority mix (TPC-H Q12 shape, delay-bucket variant —
    * the synthetic lineitem has no shipmode): lines shipped in 1996 bucketed
    * by order→ship latency; counts of urgent vs other order priorities per
    * bucket via conditional COUNT (not SUM — DuckDB's integer SUM widens to
    * HUGEINT and would hash as float). */
  def shipDelayPriority(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp"))
    val o = Tables.orders(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .withColumn("delay_bucket",
        when(datediff(col("l_shipdate"), col("o_orderdate")) > 120, "LATE")
          .otherwise("ONTIME"))
      .groupBy("delay_bucket")
      .agg(
        count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
          .as("high_line_count"),
        count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
          .as("low_line_count"))
  }

  def shipDelayPrioritySql: String =
    """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 120
      |        THEN 'LATE' ELSE 'ONTIME' END AS delay_bucket,
      |  count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
      |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1""".stripMargin

  /** Customer order-count distribution (TPC-H Q13 shape): two-level
    * aggregation over a left outer join — customers with zero orders land in
    * the c_count = 0 bin instead of disappearing. First aggregate keys on
    * c_custkey (the join key → no extra shuffle under AQE); the second is a
    * tiny reduction over distinct counts. */
  def orderCountDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  def orderCountDistributionSql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count""".stripMargin

  /** Top supplier (TPC-H Q15 shape): supplier(s) achieving the maximum
    * quarterly revenue. The per-supplier aggregate reduces the fact table
    * before anything joins; the global max is a one-row broadcast cross
    * join (no global sort, no single-partition window), and the equality
    * compare is on the decimal-rounded double both engines share. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(round(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))), 2)
        .cast("double").as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
    rev.crossJoin(broadcast(top))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  def topSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin

  /** Small-quantity-order revenue (TPC-H Q17 shape): revenue from lines of
    * one brand whose quantity is below 20% of that part's average. The
    * per-part average reduces lineitem BEFORE the brand join probes it
    * (map-side partial avg), and quantities are integral doubles so the
    * average — an exact integer sum over a count — is order-independent:
    * the 0.2·avg threshold compares identically in both engines. */
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_brand") === "Brand#3")
    val l = Tables.lineitem(spark, dir)
    val partAvg = l.join(p.select("p_partkey"),
        l("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey").as("avg_partkey"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    l.join(p.select("p_partkey"), l("l_partkey") === col("p_partkey"))
      .join(partAvg, col("l_partkey") === col("avg_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(round(sum(dec(col("l_extendedprice"))).cast("double") / 7.0, 2)
        .as("avg_yearly"))
  }

  def smallQtyRevenueSql: String =
    """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN (SELECT l_partkey AS avg_partkey, avg(l_quantity) AS avg_qty
      |      FROM lineitem
      |      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3')
      |      GROUP BY l_partkey) a ON l_partkey = avg_partkey
      |WHERE p_brand = 'Brand#3'
      |  AND l_quantity < 0.2 * avg_qty""".stripMargin

  /** Disjunctive-predicate revenue (TPC-H Q19 shape): three (brand, size,
    * quantity) conjunction groups OR-ed together. The disjunction lives in
    * the join predicate where Catalyst extracts the common l_partkey
    * equi-key; part broadcasts, so the whole query is one fact scan. */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(p, l("l_partkey") === p("p_partkey") && (
        (p("p_brand") === "Brand#12" && p("p_size").between(1, 5)  && l("l_quantity").between(1, 11)) ||
        (p("p_brand") === "Brand#23" && p("p_size").between(1, 10) && l("l_quantity").between(10, 20)) ||
        (p("p_brand") === "Brand#4"  && p("p_size").between(1, 15) && l("l_quantity").between(20, 30))))
      .agg(round(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount")))), 2)
        .cast("double").as("revenue"))
  }

  def disjunctiveRevenueSql: String =
    """SELECT CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  /** Dormant high-balance customers (TPC-H Q22 shape, mktsegment variant —
    * no phone column): customers with above-average positive balance and no
    * RECENT orders (none since [[DormantCutoff]] — the synthetic order
    * stream gives nearly every customer *some* order even at sf0.001, so
    * literal Q22 "no orders ever" selects nothing below sf0.1; a dormancy
    * cutoff keeps the anti-join shape and is non-empty at every SF),
    * summarized per market segment. The above-average predicate is
    * cross-multiplied into exact integer×decimal arithmetic
    * (bal·n > Σbal) so no engine ever divides — the threshold compare is
    * bit-exact. The one-row aggregate broadcasts; the no-recent-order probe
    * is a left_anti on the pre-filtered orders key (the date filter is
    * pushed to the scan, so the anti-join's build side shrinks first). */
  private val DormantCutoff = "1999-01-01"

  def dormantBalance(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val pos = c.filter(col("c_acctbal") > 0.0)
      .agg(sum(dec(col("c_acctbal"))).as("tot"), count(lit(1)).as("n"))
    c.crossJoin(broadcast(pos))
      .filter(dec(col("c_acctbal")) * col("n") > col("tot"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= lit(DormantCutoff).cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("numcust"),
        round(sum(dec(col("c_acctbal"))), 2).cast("double").as("totacctbal"))
  }

  def dormantBalanceSql: String =
    """WITH pos AS (
      |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS tot, count(*) AS n
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT c_mktsegment, count(*) AS numcust,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
      |FROM customer, pos
      |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > tot
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |GROUP BY c_mktsegment""".stripMargin

  /** Cheapest supplier per part (TPC-H Q2 shape; no partsupp table, so the
    * part↔supplier relation is the observed shipping history in lineitem,
    * and min supply cost becomes min supplier account balance): for every
    * STANDARD-type part, the supplier with the lowest (s_acctbal, s_suppkey)
    * among suppliers that ever shipped it from region AMERICA.
    *
    * The shape that matters at scale: the argmin is a single `min_by` HASH
    * aggregate keyed on the packed (acctbal, suppkey) ordering column — one
    * shuffle on l_partkey, NO row_number window (a window would re-sort the
    * whole bridge), and the supplier/nation/region side is broadcast (dims),
    * so lineitem is the only shuffled input. The tie-break is packed into
    * the ordering value (bal · 10⁹ + suppkey, exact integer arithmetic) so
    * min_by is deterministic and both engines agree bit-for-bit. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "AMERICA")
    val s = Tables.supplier(spark, dir)
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        // deterministic argmin key: acctbal is 2-decimal, ×100 is integer-
        // exact; +10^5 keeps the key positive for negative balances (Spark
        // `div` truncates toward zero, DuckDB `//` floors — they only agree
        // on non-negatives); ×10^9 headroom then + suppkey breaks ties.
        // 10^9 and not 10^6: TPC-H has 10^4 suppliers per SF, so a 10^6
        // slot overflows into the balance digits at SF ≥ 100 — exactly the
        // scale this engine targets — and silently elects the wrong
        // supplier. 1.1·10^6 × 10^9 + 10^9 < 2^63 with ample room.
        ((round(col("s_acctbal") * 100).cast("long") + 100000L) * 1000000000L +
          col("s_suppkey")).as("ord"))
    val p = Tables.part(spark, dir).filter(col("p_type") === "STANDARD")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val bridge = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val best = bridge
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(min_by(struct(col("s_name"), col("n_name")), col("ord")).as("w"),
        min(col("ord")).as("min_ord"))
    best.join(p, col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"),
        col("w.s_name").as("s_name"), col("w.n_name").as("n_name"),
        round((expr("min_ord div 1000000000") - 100000L).cast("double") / 100.0, 2)
          .as("s_acctbal"))
  }

  def minCostSupplierSql: String =
    """WITH s AS (
      |  SELECT s_suppkey, s_name, n_name,
      |    (CAST(round(s_acctbal * 100) AS BIGINT) + 100000) * 1000000000
      |      + s_suppkey AS ord
      |  FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'AMERICA'),
      |bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
      |best AS (
      |  SELECT l_partkey, arg_min(s_name, ord) AS s_name,
      |    arg_min(n_name, ord) AS n_name, min(ord) AS min_ord
      |  FROM bridge JOIN s ON l_suppkey = s_suppkey
      |  GROUP BY l_partkey)
      |SELECT p_partkey, p_brand, p_size, s_name, n_name,
      |  round(CAST(min_ord // 1000000000 - 100000 AS DOUBLE) / 100.0, 2) AS s_acctbal
      |FROM best JOIN part ON l_partkey = p_partkey
      |WHERE p_type = 'STANDARD'""".stripMargin

  /** Suppliers who kept orders waiting (TPC-H Q21 shape; lineitem has no
    * receipt/commit dates, so "late" = shipped more than [[LateDays]] days
    * after the order date): line items whose supplier was the ONLY late
    * supplier on a multi-supplier order, counted per supplier, top 25.
    *
    * The classic formulation is a 3-way self-join (l1 + EXISTS l2 + NOT
    * EXISTS l3). Rewritten as ONE aggregation per order — count distinct
    * suppliers and distinct late suppliers per l_orderkey, then keep late
    * rows where (n_supp > 1 AND n_late_supp = 1) — the self-joins collapse
    * into a single shuffle on l_orderkey followed by a broadcast-back join.
    * At 100 TB that is the difference between one pass over lineitem and
    * three, with no pair blowup on large orders. */
  val LateDays = 60

  def waitingOrders(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val lo = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $LateDays DAYS"))
    val perOrder = lo.groupBy("l_orderkey")
      .agg(countDistinct("l_suppkey").as("n_supp"),
        countDistinct(when(col("is_late"), col("l_suppkey"))).as("n_late_supp"))
    lo.filter(col("is_late"))
      .join(perOrder.filter(col("n_supp") > 1 && col("n_late_supp") === 1),
        Seq("l_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(25)
  }

  def waitingOrdersSql: String =
    s"""WITH lo AS (
       |  SELECT l_orderkey, l_suppkey,
       |    l_shipdate > o_orderdate + INTERVAL $LateDays DAY AS is_late
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  WHERE o_orderstatus = 'F'),
       |per_order AS (
       |  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
       |    count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
       |  FROM lo GROUP BY 1)
       |SELECT s_name, count(*) AS numwait
       |FROM lo
       |JOIN per_order USING (l_orderkey)
       |JOIN supplier ON l_suppkey = s_suppkey
       |WHERE is_late AND n_supp > 1 AND n_late_supp = 1
       |GROUP BY s_name
       |ORDER BY numwait DESC, s_name
       |LIMIT 25""".stripMargin

  /** Product-type profit (TPC-H Q9 shape; no partsupp table, so unit supply
    * cost is modeled as a fixed 80% of `p_retailprice`): profit per supplier
    * nation per ship year over parts whose name contains "bolt".
    *
    * Scale shape: nation is the only forced broadcast (fixed 25 rows);
    * part and supplier SCALE with SF, so their joins are left to AQE —
    * at sf0.1 it picks broadcast, at 100 TB it would pick shuffled joins
    * without replanning by hand. The groupBy is 2 low-cardinality keys →
    * partial aggregation collapses the fact rows map-side. */
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).filter(col("p_name").contains("bolt"))
      .select("p_partkey", "p_retailprice")
    val s = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount", "l_quantity")
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("n_name"), year(col("l_shipdate")).cast("long").as("o_year"))
      .agg(round(sum(
        dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) -
          dec4(lit(0.8) * col("p_retailprice") * col("l_quantity"))), 2)
        .cast("double").as("profit"))
  }

  def productProfitSql: String =
    """SELECT n_name, CAST(year(l_shipdate) AS BIGINT) AS o_year,
      |  CAST(round(sum(
      |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) -
      |    CAST(0.8 * p_retailprice * l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_name LIKE '%bolt%'
      |GROUP BY n_name, o_year""".stripMargin

  /** Important stock (TPC-H Q11 shape; the part↔supplier relation is the
    * observed shipping history, stock value = retail price × shipped
    * quantity): parts holding more than 1/1000 of the EUROPE-supplied
    * value. (Scoped by region, not nation: every SF of the synthetic data
    * populates every region, while single nations can be empty at tiny
    * SFs.)
    *
    * Scale shape: one shuffle on l_partkey builds per-part values; the
    * grand total is a one-row aggregate broadcast back (crossJoin of a
    * single row — constant cost at any SF). The fraction test runs in
    * exact DECIMAL (value×1000 vs total), so both engines agree on
    * borderline parts bit-for-bit. */
  def importantStock(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
              .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val perPart = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(natSupp, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.part(spark, dir).select("p_partkey", "p_retailprice"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey")
      .agg(sum(dec4(col("p_retailprice") * col("l_quantity"))).as("v"))
      // two consumers (the output rows and the grand total); materialized
      // once so the lineitem join+aggregate branch is not computed twice —
      // the frame is part-cardinality, tiny next to the fact scan it saves
      .localCheckpoint(true)
    val tot = perPart.agg(sum(col("v")).as("tot"))
    perPart.crossJoin(broadcast(tot))
      .filter(col("v") * 1000 > col("tot"))
      .select(col("l_partkey").as("p_partkey"),
        round(col("v"), 2).cast("double").as("stock_value"))
  }

  def importantStockSql: String =
    """WITH nat_supp AS (
      |  SELECT s_suppkey FROM supplier
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |per_part AS (
      |  SELECT l_partkey,
      |    sum(CAST(p_retailprice * l_quantity AS DECIMAL(18,4))) AS v
      |  FROM lineitem
      |  JOIN nat_supp ON l_suppkey = s_suppkey
      |  JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1),
      |tot AS (SELECT sum(v) AS tot FROM per_part)
      |SELECT l_partkey AS p_partkey, CAST(round(v, 2) AS DOUBLE) AS stock_value
      |FROM per_part, tot WHERE v * 1000 > tot""".stripMargin

  /** Part/supplier relationship count (TPC-H Q16 shape; the relation is the
    * distinct (part, supplier) shipping history; the "customer complaints"
    * exclusion becomes suppliers with negative account balance): distinct
    * supplier count per (brand, type, size) over non-PROMO, non-Brand#5
    * parts in eight chosen sizes.
    *
    * Scale shape: the distinct bridge is one shuffle over the two key
    * columns only (column-pruned scan); the exclusion list is a LEFT ANTI
    * broadcast (tiny by construction); countDistinct re-shuffles only the
    * surviving bridge rows on the 3 group keys. */
  val Q16Sizes: Seq[Int] = Seq(1, 4, 9, 14, 19, 24, 29, 34)

  def supplierRelation(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(Q16Sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val excl = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(p, col("l_partkey") === col("p_partkey"))
      // no broadcast hint: the exclusion list scales with SF (it is a
      // supplier-table slice); AQE picks broadcast while it is small
      .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  def supplierRelationSql: String =
    s"""SELECT p_brand, p_type, p_size,
       |  count(DISTINCT l_suppkey) AS supplier_cnt
       |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
       |JOIN part ON l_partkey = p_partkey
       |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
       |  AND p_size IN (${Q16Sizes.mkString(", ")})
       |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY p_brand, p_type, p_size""".stripMargin

  /** Potential part promotion (TPC-H Q20 shape; shipped quantity stands in
    * for partsupp availability): suppliers holding more than a 10% share of
    * the total shipped quantity of some "small…" part — the candidates who
    * could absorb a promotion of that part.
    *
    * Scale shape: ONE pass over the filtered fact — the per-(part, supplier)
    * aggregate feeds a part-partitioned window sum for the per-part total,
    * so the expensive join+aggregate branch is never re-computed (a naive
    * two-groupBy + join-back plan scans it twice). The window partitions on
    * l_partkey — partition size = suppliers-per-part, bounded — never a
    * global sort. Quantities are integral doubles, so sums and the ×10
    * share test are exact in both engines regardless of accumulation
    * order. */
  def promoSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("small")).select("p_partkey")
    val perPartSupp = Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("l_quantity")).as("qty"))
    perPartSupp
      .withColumn("total_qty",
        sum(col("qty")).over(Window.partitionBy("l_partkey")))
      .filter(col("qty") * 10 > col("total_qty"))
      .select("l_suppkey").distinct()
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_name", "n_name")
  }

  def promoSuppliersSql: String =
    """WITH pps AS (
      |  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'small%'
      |  GROUP BY 1, 2),
      |pp AS (SELECT l_partkey, sum(qty) AS total_qty FROM pps GROUP BY 1),
      |cand AS (
      |  SELECT DISTINCT l_suppkey FROM pps JOIN pp USING (l_partkey)
      |  WHERE qty * 10 > total_qty)
      |SELECT s_name, n_name
      |FROM cand
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey""".stripMargin
}
