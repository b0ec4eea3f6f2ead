package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Co-located (bucketed) joins — the storage-level shuffle elimination for
  * repeated fact⨝fact joins.
  *
  * A drainer-style pipeline joins lineitem-shaped and orders-shaped facts on
  * the same key every batch. At 100 TB the shuffle of both sides dominates
  * the join; writing each table ONCE bucketed on the join key
  * (`bucketBy(n, key)` + `sortBy(key)`) lets every subsequent sort-merge
  * join consume the bucket files directly — zero Exchange on either side,
  * amortizing one write-time shuffle across every downstream join, the same
  * contract a co-partitioned state store gives the reference's loader.
  *
  * Bucket-count discipline at scale: both sides must agree on `n`, and `n`
  * should be sized so a bucket of the larger table fits one task
  * (~128-512 MB); at 100 TB that is thousands of buckets — still fine,
  * buckets are files within partitions, not directories.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). The table is
    * registered in the session catalog under `name`; `path` keeps the data
    * out of the default warehouse so tests can point it at a temp dir. */
  def writeBucketed(df: DataFrame, name: String, key: String,
      nBuckets: Int, path: String): Unit =
    // repartition on the bucket key FIRST (the same murmur3-pmod hash the
    // bucket spec uses): without it every upstream partition emits its own
    // file per bucket — up to P×nBuckets small files, re-creating the
    // listing pressure bucketing exists to amortize — and multi-file
    // buckets force a Sort back under every "zero-exchange" join
    df.repartition(nBuckets, col(key))
      .write.format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(name)

  /** Join two same-bucket-count tables on their bucket key. With bucketing
    * readable (`spark.sql.sources.bucketing.enabled`, default true) the
    * planner emits a sort-merge join with NO Exchange under either scan. */
  def cocolocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
