package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Skew-mitigation utilities for hot-key joins.
  *
  * The reference serializes per-key apply and fans out by key hash
  * (pkg/loader/load.go:508-527); a hot key simply makes one worker late. In
  * Spark a hot join key makes one shuffle partition huge. AQE's skew-join
  * splitting handles sort-merge joins automatically; this utility covers the
  * remaining case — when the dimension side must be shuffled and one fact key
  * dominates — by salting: the fact side spreads each key over `factor`
  * sub-keys deterministically, the dimension side is replicated `factor`
  * times, and the join key becomes (key, salt). Row multiplication is
  * bounded by `factor` × |dim|, and every shuffle partition receives at most
  * 1/`factor` of a hot key's rows.
  */
object Skew {

  /** Inner-join `fact` with `dim` on `key`, salted `factor` ways. `saltSrc`
    * must be a deterministic per-row expression on the fact side (a unique
    * id column, NOT rand() — replays must route rows identically). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSrc: Column, factor: Int = 8): DataFrame = {
    // collision-proof internal name (the RangeJoin.bucketed discipline): a
    // fact frame already carrying a __salt column — e.g. a prior salted
    // stage left unprojected — must not get it clobbered and dropped
    val sk = "__skew_salt"
    val salted = fact.withColumn(sk, pmod(hash(saltSrc), lit(factor)))
    val replicated = dim.withColumn(sk,
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, sk)).drop(sk)
  }

  /** Oracle-checked salted-join query: the events fact table joins a 5-row
    * event-type dimension — a key so hot every value owns ~20% of the fact
    * stream, the worst case for an unsalted shuffle join (5 keys can land
    * on at most 5 of 32+ partitions; salting × 8 spreads each over 8). The
    * oracle runs the PLAIN join — identical results prove salting changes
    * the physical distribution, never the semantics. Aggregates stay
    * integer (counts), so parity is exact. */
  def saltedJoinQuery(spark: SparkSession, dir: String, factor: Int = 8): DataFrame = {
    import spark.implicits._
    val dim = Seq("signup", "error", "click", "view", "purchase")
      .map(t => (t, t.length.toLong)).toDF("event_type", "boost")
    val fact = Tables.events(spark, dir)
    saltedJoin(fact, dim, "event_type", col("event_id"), factor)
      .groupBy("event_type", "boost")
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("value") * col("boost") > 600.0, 1)).as("n_hi"))
  }

  def saltedJoinSql: String =
    """SELECT event_type, boost, count(*) AS n_rows,
      |  count(CASE WHEN value * boost > 600.0 THEN 1 END) AS n_hi
      |FROM events
      |JOIN (VALUES ('signup', CAST(6 AS BIGINT)), ('error', 5), ('click', 5),
      |             ('view', 4), ('purchase', 8)) AS dim(event_type, boost)
      |  USING (event_type)
      |GROUP BY event_type, boost""".stripMargin
}
