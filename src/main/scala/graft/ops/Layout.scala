package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Physical data-layout operators — the lake-maintenance half of a 100 TB
  * deployment that the reference delegates to its storage engine (vlog GC,
  * file rotation: pump/storage/storage.go) and a Spark lake does with
  * explicit jobs.
  *
  *  - Z-order (Morton) clustering keys: interleaving the bits of two
  *    filter dimensions makes rows that are close in EITHER dimension land
  *    in the same parquet row groups, so min/max statistics prune scans
  *    for predicates on x, on y, or on both — the standard multi-dimension
  *    data-skipping layout.
  *  - Small-file compaction: streaming sinks and per-batch writers leave
  *    thousands of KB-sized files; periodic compaction to target-sized
  *    files keeps scan task counts (and NameNode/listing pressure)
  *    proportional to data volume, not to write history.
  */
object Layout {

  /** Bits per dimension in the Morton key (dimensions are bucketed to
    * [0, 2^MortonBits)). 8 bits × 2 dims = 16-bit keys: enough spread for
    * row-group-level skipping; raise for finer clustering. */
  val MortonBits = 8

  private val Buckets = 1 << MortonBits // 256

  /** Interleave the low [[MortonBits]] bits of two non-negative bucketed
    * columns: bit i of `x` → bit 2i, bit i of `y` → bit 2i+1. Pure integer
    * arithmetic (div/mod/×) so both engines agree bit-for-bit; inputs are
    * bucketed non-negative, where Spark's `div` (truncate) and DuckDB's
    * `//` (floor) coincide. */
  def mortonKey(x: Column, y: Column): Column =
    (0 until MortonBits).map { i =>
      (x.cast("long") / (1L << i)).cast("long") % 2 * lit(1L << (2 * i)) +
        (y.cast("long") / (1L << i)).cast("long") % 2 * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  private def mortonKeySql(x: String, y: String): String =
    (0 until MortonBits).map { i =>
      s"(($x // ${1L << i}) % 2) * ${1L << (2 * i)} + " +
        s"(($y // ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")

  /** Z-order clustering key over the events table's two hot filter
    * dimensions (user bucket × value bucket). Writing the table sorted by
    * `zkey` gives every parquet row group a small bounding box in (user,
    * value) space, so a predicate on either dimension prunes most groups;
    * the z-order locality test in CdcSpec quantifies the effect against a
    * time-sorted layout. Buckets go through pmod so a negative input (ids
    * and values are non-negative in the fixture today, but nothing pins
    * that) can't produce a negative bucket — where Spark's truncating `%`
    * and DuckDB's floor `//`/`%` would silently diverge. */
  def zorderKey(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        pmod(col("user_id"), lit(Buckets)).as("xb"),
        pmod(floor(col("value")).cast("long"), lit(Buckets)).as("yb"))
      .select(col("event_id"), col("xb"), col("yb"),
        mortonKey(col("xb"), col("yb")).as("zkey"))

  def zorderKeySql: String =
    s"""WITH b AS (
       |  SELECT event_id, ((user_id % $Buckets) + $Buckets) % $Buckets AS xb,
       |    ((CAST(floor(value) AS BIGINT) % $Buckets) + $Buckets) % $Buckets AS yb
       |  FROM events)
       |SELECT event_id, xb, yb, ${mortonKeySql("xb", "yb")} AS zkey
       |FROM b""".stripMargin

  /** Compact a parquet directory to files of roughly `targetBytes`:
    * list actual on-disk sizes, compute the file count that hits the
    * target, and rewrite through one round-robin repartition. Run
    * periodically over streaming-sink output; cost is one read+write of
    * the data, no shuffle key needed (round-robin keeps partitions
    * size-balanced regardless of data skew). Returns the file count
    * written. */
  /** On-disk parquet part files of a directory — the one file-discovery
    * rule shared by [[compact]] and its roundtrip check, so what the
    * check counts is exactly what compaction measured. */
  private def parquetFiles(spark: SparkSession,
      path: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    // RECURSIVE: streaming-sink output is routinely partitioned
    // (bucket=N/ dirs) — a top-level listing would size such input at 0
    // bytes and funnel the whole dataset through repartition(1).
    // Recursion is hand-rolled over listStatus, NOT fs.listFiles(_, true):
    // listFiles materializes LocatedFileStatus (per-file block-location
    // lookups), which the byte-sizing here never reads and which the
    // r16→r17 same-host control measured at ~0.3 s per roundtrip even on
    // a 64-file local directory
    val out = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.FileStatus]()
    def walk(p: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(p).foreach { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) out += st
      }
    walk(new org.apache.hadoop.fs.Path(path))
    out.toSeq
  }

  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val totalBytes = parquetFiles(spark, inPath).map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Oracle-checked P7 query: fragment the events projection into 64
    * small files (a streaming sink's write history), [[compact]] them to
    * target-sized files, and return the compacted read-back. The driver's
    * hash oracle pins that the physical rewrite preserves content exactly;
    * the in-query require pins that it actually collapsed the file count
    * (the reference's GC/rotation analog: pump/storage/storage.go vlog GC
    * reclaims dead segments without touching live payload). */
  def compactRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val scratch = graft.util.Scratch.dir("graft_p7_compact")
    val frag = s"$scratch/frag"
    val out = s"$scratch/compacted"
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .repartition(64).write.parquet(frag)
    val fragStats = parquetFiles(spark, frag)
    val target = 64L * 1024 * 1024
    val written = compact(spark, frag, out, target)
    val nOut = parquetFiles(spark, out).length
    // independent recomputation of the sizing rule from the fragment
    // bytes: catches compact() measuring the wrong file set, not just an
    // inconsistent return value
    val expect = math.max(1,
      math.ceil(fragStats.map(_.getLen).sum.toDouble / target).toInt)
    // this single check carries the collapse claim too: whenever the data
    // is small enough that expect < fragment count (every test scale
    // factor), nOut == expect IS the collapse; at a scale factor needing
    // >= nFrag target-sized files, emitting that many is correct behavior
    require(nOut == written && nOut == expect,
      s"compaction sized $written/$nOut files, expected $expect")
    spark.read.parquet(out)
  }

  def compactRoundtripSql: String =
    "SELECT event_id, user_id, event_type, value FROM events"
}
