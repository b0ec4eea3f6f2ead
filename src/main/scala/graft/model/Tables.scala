package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All operators take the scale-factor directory as a parameter so the same
  * plan runs unchanged from sf0.001 smoke tests to a 100 TB lake: the reads
  * are plain columnar scans and every downstream projection/filter is
  * declarative, so Catalyst pushes predicates and prunes columns into the
  * parquet reader regardless of data size.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Driver-written timestamps (`events.ts` is timestamp[us]) carry no UTC
    // flag; Spark 4 would infer TIMESTAMP_NTZ, a type unix_micros/window
    // reject. Read them as plain TIMESTAMP — the stored micros pass through
    // unchanged (no tz conversion happens on read), matching DuckDB's view.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Parallelism floor for CPU-heavy per-row derivations (tokenize / hash /
    * shingle-explode / codec kernels) that run BETWEEN a scan and its first
    * exchange. A small input — one parquet file, one wire segment — gives
    * the scan fewer splits than the session has cores, and every pre-shuffle
    * expression then runs on that handful of tasks while the rest of the
    * cluster idles (guide §2.5: input with too few splits → repartition
    * immediately after the read). Hash-spread on the given key columns to
    * `defaultParallelism` ONLY when the plan's actual scan parallelism is
    * below it: at production scale (splits ≥ cores) this is a no-op and the
    * plan is byte-identical, so nothing here is tuned to local mode — the
    * condition, not a constant, carries the scale adaptivity. Keys must be
    * stable row identities (doc_id, vec_id, (commit_ts, pk)) so the
    * placement is deterministic under task retries (§2.5's rand-derived-key
    * caveat). The EXPLICIT partition count matters: a keyed repartition
    * without one is AQE-coalescible, and AQE sizes partitions by BYTES —
    * blind to the downstream per-row CPU amplification this exists to
    * spread (ann_pq_topk's trainer measured exactly that: AQE folded the
    * 16k-row subvector frame to one partition and the rows × 256-codebook
    * argmin ran single-core). */
  def spread(df: DataFrame, keys: Column*): DataFrame = {
    val sess = df.sparkSession
    val n = sess.sparkContext.defaultParallelism
    // Split-count estimate from the LOGICAL stats (file footprint of the
    // scan, pruned-column scaled) instead of `df.rdd.getNumPartitions`:
    // the .rdd probe forced a throwaway non-AQE physical planning + RDD DAG
    // build of the subtree at every call site, a driver cost paid even when
    // the answer is "no-op" (r21 ADVICE). Callers pass scan+project frames
    // only, where sizeInBytes IS the (pruned) parquet footprint; a real
    // table underestimated 32× by pruning still clears n×maxPartitionBytes
    // (~4 GB) at production scale, so the at-scale no-op contract holds.
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxSplit = BigInt(sess.sessionState.conf.filesMaxPartitionBytes)
    val estSplits = (bytes + maxSplit - 1) / maxSplit
    if (estSplits >= n) df else df.repartition(n, keys: _*)
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
