package graft.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Driver-side metadata and state-swap IO for the lake sinks
  * ([[graft.sinks.UpsertSink]], [[graft.sinks.HistorySink]]), routed
  * through the Hadoop `FileSystem` of each path's URI — local disk in the
  * sandbox, HDFS or an object store on a cluster. `java.nio` would treat a
  * `file:`/`hdfs:` scheme as path characters and cannot address shared
  * storage at all, which made the lake sinks the one remaining local-FS
  * seam (every other storage touchpoint already rides
  * [[graft.sources.PbBinlogFile.fsFor]]).
  *
  * All callers are driver-side (checkpoint markers, bucket-directory
  * swaps), so the session's Hadoop configuration is resolved at call time —
  * no conf shipping needed. */
object MetaFs {

  private def conf: Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fs(path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), conf)

  def exists(path: String): Boolean = fs(path).exists(new Path(path))

  def isDirectory(path: String): Boolean = {
    val f = fs(path); val p = new Path(path)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  def readString(path: String): String = {
    val f = fs(path); val p = new Path(path)
    val buf = new Array[Byte](f.getFileStatus(p).getLen.toInt)
    val in = f.open(p)
    try in.readFully(0L, buf) finally in.close()
    new String(buf, "UTF-8")
  }

  /** Overwrite-in-place marker write — the same guarantee class as the
    * `java.nio` `writeString` it replaces (the sinks' batch replay is
    * idempotent, so a marker lost to a crash mid-write only costs a
    * replayed batch, never a wrong state). */
  def writeString(path: String, s: String): Unit = {
    val f = fs(path)
    val out = f.create(new Path(path), true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  def mkdirs(path: String): Unit = { fs(path).mkdirs(new Path(path)); () }

  /** Recursive delete; a missing path is a no-op. */
  def delete(path: String): Unit = { fs(path).delete(new Path(path), true); () }

  /** Rename with a vacated destination as the caller's precondition: Hadoop
    * moves a source INTO an existing destination directory instead of
    * replacing it, so swap sequences must move the old destination aside
    * first (the sinks' bucket/open swaps do exactly that). */
  def rename(src: String, dst: String): Unit =
    if (!fs(dst).rename(new Path(src), new Path(dst)))
      throw new java.io.IOException(s"rename $src -> $dst failed")
}
