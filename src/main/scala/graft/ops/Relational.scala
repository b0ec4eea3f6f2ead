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
}
