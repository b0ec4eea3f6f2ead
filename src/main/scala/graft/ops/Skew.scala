package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    val salted = fact.withColumn("__salt", pmod(hash(saltSrc), lit(factor)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
