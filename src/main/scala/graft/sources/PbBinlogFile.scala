package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.zip.CRC32C

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S6/K4 against the real wire shape: the reference's length-prefixed
  * binlog-file format, read and written as binary, not a parquet analog.
  *
  * Frame layout (ref: pkg/binlogfile/encoder.go:24-77):
  * {{{
  *   | magic 0x1C1B2C04 (4B LE) | len(payload) (8B LE) | payload | crc32c(payload) (4B LE) |
  * }}}
  * The payload is a protobuf message (ref: proto/pb_binlog.proto — reparo's
  * pb.Binlog); here it encodes the change-event envelope with standard
  * protobuf wire encoding (varint/fixed64/length-delimited), hand-rolled so
  * no codec dependency is needed:
  * {{{
  *   1: commit_ts varint   2: pk varint      3: op string
  *   4: event_type string  5: ts_us varint   6: value fixed64(double)
  *   7: props string (omitted when null, like proto3 absent fields)
  * }}}
  * CRC is Castagnoli (ref: binlogger.go:43 `crc32.MakeTable(crc32.Castagnoli)`
  * = `java.util.zip.CRC32C`); a mismatch fails the read like the reference's
  * ErrCRCMismatch rather than silently passing corrupt rows downstream.
  *
  * Files are named `binlog-<%016d index>-<%020d firstCommitTs>` so a
  * commit-ts range scan selects FILES before reading a byte — the
  * reference's pushdown (reparo/file.go:47-109 `filterFiles` keeps the last
  * file whose first ts ≤ startTs plus every overlapping file). File listing
  * is driver metadata work, exactly as reparo's; the decode itself is
  * distributed (`binaryFile` source + per-partition frame parsing — genuine
  * imperative byte work, the one place `mapPartitions`-style logic is the
  * right tool).
  *
  * Scale shape: one file per range-partition on write (sorted by commit_ts,
  * so file boundaries ARE ts boundaries); on read, file selection prunes
  * I/O to the overlapping range and the residual row filter keeps exactness.
  */
object PbBinlogFile {

  val Magic: Int = 471532804 // ref: binlogfile/encoder.go:24

  case class PbChange(commit_ts: Long, pk: Long, op: String, event_type: String,
      ts_us: Long, value: Double, props: String)

  // ---- protobuf wire primitives ----

  private def varintLen(v: Long): Int = {
    var x = v; var n = 1
    while ((x & ~0x7fL) != 0) { x >>>= 7; n += 1 }
    n
  }

  private def putVarint(b: ByteBuffer, v: Long): Unit = {
    var x = v
    while ((x & ~0x7fL) != 0) { b.put(((x & 0x7f) | 0x80).toByte); x >>>= 7 }
    b.put(x.toByte)
  }

  private def getVarint(b: ByteBuffer): Long = {
    var x = 0L; var shift = 0
    var more = true
    while (more) {
      val byte = b.get()
      x |= (byte & 0x7fL) << shift
      shift += 7
      more = (byte & 0x80) != 0
    }
    x
  }

  private def putStr(b: ByteBuffer, field: Int, s: String): Unit = {
    val bytes = s.getBytes("UTF-8")
    putVarint(b, (field << 3) | 2); putVarint(b, bytes.length.toLong); b.put(bytes)
  }

  // ---- payload encode/decode ----

  private[sources] def encodePayload(c: PbChange): Array[Byte] = {
    val opB = c.op.getBytes("UTF-8"); val etB = c.event_type.getBytes("UTF-8")
    val prB = if (c.props == null) null else c.props.getBytes("UTF-8")
    var size = 1 + varintLen(c.commit_ts) + 1 + varintLen(c.pk) +
      1 + varintLen(opB.length.toLong) + opB.length +
      1 + varintLen(etB.length.toLong) + etB.length +
      1 + varintLen(c.ts_us) + 1 + 8
    if (prB != null) size += 1 + varintLen(prB.length.toLong) + prB.length
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    putVarint(b, (1 << 3) | 0); putVarint(b, c.commit_ts)
    putVarint(b, (2 << 3) | 0); putVarint(b, c.pk)
    putStr(b, 3, c.op); putStr(b, 4, c.event_type)
    putVarint(b, (5 << 3) | 0); putVarint(b, c.ts_us)
    putVarint(b, (6 << 3) | 1); b.putDouble(c.value)
    if (prB != null) {
      putVarint(b, (7 << 3) | 2); putVarint(b, prB.length.toLong); b.put(prB)
    }
    b.array()
  }

  private[sources] def decodePayload(payload: Array[Byte]): PbChange = {
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    var commitTs = 0L; var pk = 0L; var op = ""; var et = ""
    var tsUs = 0L; var value = 0.0; var props: String = null
    while (b.hasRemaining) {
      val tag = getVarint(b)
      val field = (tag >> 3).toInt
      (tag & 7) match {
        case 0 =>
          val v = getVarint(b)
          field match {
            case 1 => commitTs = v; case 2 => pk = v; case 5 => tsUs = v
            case _ => () // unknown varint field: skip (proto forward-compat)
          }
        case 1 =>
          val v = b.getDouble
          if (field == 6) value = v
        case 2 =>
          val len = getVarint(b).toInt
          val bytes = new Array[Byte](len); b.get(bytes)
          val s = new String(bytes, "UTF-8")
          field match {
            case 3 => op = s; case 4 => et = s; case 7 => props = s
            case _ => ()
          }
        case wt => throw new IllegalArgumentException(s"unsupported wire type $wt")
      }
    }
    PbChange(commitTs, pk, op, et, tsUs, value, props)
  }

  // ---- framing ----

  private[sources] def encodeFrame(payload: Array[Byte]): Array[Byte] = {
    val crc = new CRC32C(); crc.update(payload)
    val b = ByteBuffer.allocate(16 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(Magic); b.putLong(payload.length.toLong); b.put(payload)
    b.putInt(crc.getValue.toInt)
    b.array()
  }

  /** Parse every frame in one file's bytes; magic and crc mismatches fail
    * loudly (ref: ErrMagicMismatch / ErrCRCMismatch, binlogger.go:37-41). */
  private[sources] def decodeFrames(content: Array[Byte]): Iterator[PbChange] = {
    val b = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[PbChange] {
      def hasNext: Boolean = b.remaining() >= 16
      def next(): PbChange = {
        val magic = b.getInt
        if (magic != Magic)
          throw new IllegalStateException(f"binlog magic mismatch: 0x$magic%08x")
        val len = b.getLong.toInt
        val payload = new Array[Byte](len); b.get(payload)
        val stored = b.getInt
        val crc = new CRC32C(); crc.update(payload)
        if (crc.getValue.toInt != stored)
          throw new IllegalStateException("binlog crc mismatch")
        decodePayload(payload)
      }
    }
  }

  // ---- the sink (K4 real shape) ----

  /** Write a change-envelope DataFrame as a directory of pb binlog files:
    * range-partitioned and sorted by commit_ts so each file covers a
    * contiguous ts interval, named by its first commit ts (the property
    * reparo's file filter relies on). Within a partition, files ROTATE at
    * `maxBytesPerFile` (ref: binlogfile/binlogger.go:45-46 SegmentSizeBytes
    * = 512 MiB, binlogger.go:415-444 rotate-on-size) — an unbounded range
    * partition therefore never produces a file the read side must hold in
    * memory whole (binaryFile materializes per-file content). Rotated
    * segments keep the naming invariant: each carries ITS OWN first commit
    * ts, so ts-range file pruning sees every segment independently. `dir`
    * must be a shared filesystem path (local here; HDFS/object-store mount
    * on a cluster). */
  def write(changes: DataFrame, dir: String, nFiles: Int = 4,
      maxBytesPerFile: Long = 512L * 1024 * 1024): Unit = {
    Files.createDirectories(Paths.get(dir))
    import changes.sparkSession.implicits._
    val ds = changes.select(
        col("commit_ts"), col("pk"), col("op"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"), col("props"))
      .as[PbChange]
      .repartitionByRange(nFiles, col("commit_ts"))
      .sortWithinPartitions("commit_ts")
    ds.foreachPartition { rows: Iterator[PbChange] =>
      val pid = TaskContext.getPartitionId()
      var out: BufferedOutputStream = null
      var written = 0L
      var seg = 0
      try {
        rows.foreach { c =>
          if (out == null) {
            // segment index rides inside the ordering-neutral first name
            // field; the trailing field stays the segment's first commit ts
            val name = f"binlog-$pid%08d$seg%08d-${c.commit_ts}%020d"
            out = new BufferedOutputStream(new FileOutputStream(s"$dir/$name"))
            seg += 1; written = 0L
          }
          val frame = encodeFrame(encodePayload(c))
          out.write(frame)
          written += frame.length
          if (written >= maxBytesPerFile) { out.close(); out = null }
        }
      } finally if (out != null) out.close()
    }
  }

  // ---- the source (S6 real shape) ----

  /** The reference's file filter (reparo/file.go:47-109): files sorted by
    * name carry their first commit ts; keep the LAST file starting at or
    * before `startTs` (it may still contain rows ≥ startTs) and every file
    * starting inside (startTs, endTs]; stop at the first file past endTs. */
  private[graft] def selectFiles(names: Seq[String], startTs: Long,
      endTs: Long): Seq[String] = {
    def firstTs(n: String): Long = n.split('-').last.toLong
    val sorted = names.sorted
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var candidate: Option[String] = None
    var done = false
    sorted.foreach { f =>
      if (!done) {
        val ts = firstTs(f)
        if (ts <= startTs) candidate = Some(f)
        else if (endTs != 0 && ts > endTs) done = true
        else { candidate.foreach(out += _); candidate = Some(f) }
      }
    }
    candidate.foreach(out += _)
    out.toSeq
  }

  /** S5/K5 real shape: the relay-log reader as a STREAM over the binlog
    * directory — new files are picked up as they appear, the streaming
    * checkpoint remembers which files were consumed, and a restart resumes
    * without re-reading (ref: drainer/relay/reader.go:50-121 re-opens from
    * the persisted position and never re-applies old entries; here the
    * file-source checkpoint is that position). Frames decode exactly as in
    * [[read]]. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Files.createDirectories(Paths.get(dir))
    val binarySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile").schema(binarySchema).load(dir)
      .select("content").as[Array[Byte]]
      .flatMap(decodeFrames _)
      .select(col("commit_ts"), col("pk"), col("op"), col("event_type"),
        timestamp_micros(col("ts_us")).as("ts"), col("value"), col("props"))
  }

  /** Oracle-checked S6 wire query: encode the change stream into binlog
    * files, then ts-range scan the BINARY directory form — the result must
    * hash-match DuckDB reading the original parquet, which pins the whole
    * codec (varints, strings, doubles, framing, crc, file pruning) under
    * the driver's correctness gate, not just ScalaTest. The staging write
    * is rebuilt every run (never read a stale layout); its cost is one
    * pass over the envelope. */
  def wireScanQuery(spark: SparkSession, dir: String): DataFrame = {
    // per-invocation scratch dir: concurrent query constructions (parallel
    // test suites, bench reps) must never contend on one directory
    val out = Files.createTempDirectory("graft_wire_scan").toString
    val changes = graft.ops.Cdc.changes(spark, dir)
    write(changes, out, nFiles = 4)
    // sf-relative [20%, 60%] of the ts domain, so the scan prunes files at
    // every scale factor; the max is a one-row aggregate
    val maxTs = changes.agg(max("commit_ts")).head.getLong(0)
    read(spark, out, startTs = maxTs * 2 / 10, endTs = maxTs * 6 / 10)
  }

  def wireScanSql: String =
    s"""WITH c AS (${graft.ops.Cdc.changesCte})
       |SELECT commit_ts, pk, op, event_type, ts, value, props FROM c
       |WHERE commit_ts BETWEEN (SELECT max(commit_ts) * 2 // 10 FROM c)
       |                    AND (SELECT max(commit_ts) * 6 // 10 FROM c)""".stripMargin

  /** Read the change envelope back from a pb binlog directory, range
    * `[startTs, endTs]` (endTs 0 = open). File selection prunes before any
    * byte is read; the residual commit_ts filter restores exactness. */
  def read(spark: SparkSession, dir: String, startTs: Long = 0L,
      endTs: Long = 0L): DataFrame = {
    import spark.implicits._
    val names = {
      val d = new java.io.File(dir)
      if (d.exists()) d.listFiles().map(_.getName).filter(_.startsWith("binlog-")).toSeq
      else Seq.empty
    }
    val picked = selectFiles(names, startTs, endTs).map(n => s"$dir/$n")
    val decoded =
      if (picked.isEmpty) spark.emptyDataset[PbChange]
      else
        spark.read.format("binaryFile").load(picked: _*)
          .select("content").as[Array[Byte]]
          .flatMap(decodeFrames _)
    val ranged = decoded
      .filter(col("commit_ts") >= startTs &&
        (lit(endTs) === 0L || col("commit_ts") <= endTs))
    ranged.select(col("commit_ts"), col("pk"), col("op"), col("event_type"),
      timestamp_micros(col("ts_us")).as("ts"), col("value"), col("props"))
  }
}
