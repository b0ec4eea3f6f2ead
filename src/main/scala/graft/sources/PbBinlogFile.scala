package graft.sources

import java.io.BufferedOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.SerializableHadoopConf

/** S6/K4 against the real wire shape: the reference's length-prefixed
  * binlog-file format, read and written as binary, not a parquet analog.
  *
  * Frame layout (ref: pkg/binlogfile/encoder.go:24-77):
  * {{{
  *   | magic 0x1C1B0504 (4B LE) | len(payload) (8B LE) | payload | crc32c(payload) (4B LE) |
  * }}}
  * The payload is a protobuf message (ref: proto/pb_binlog.proto — reparo's
  * pb.Binlog); here it encodes the change-event envelope with standard
  * protobuf wire encoding (varint/fixed64/length-delimited), hand-rolled so
  * no codec dependency is needed:
  * {{{
  *   1: commit_ts varint   2: pk varint      3: op string
  *   4: event_type string  5: ts_us varint   6: value fixed64(double)
  *   7: props string       8: dec38 string   9: udec varint(uint64)
  *  10: bits fixed64      11: enum_ord varint 12: ddl_sql string
  * }}}
  * Fields 6-11 are omitted when absent, like proto3 absent fields; fields
  * 8-11 carry the M9 type domain end-to-end (ref:
  * drainer/translator/pb.go:242-296 encodes the full datum domain into the
  * pb cells — decimal as text, unsigned as uint64, bit as a 64-bit image,
  * enum as its ordinal; tests/dailytest/case.go:97-146 round-trips exactly
  * these). The uint64 rides as a varint of its RAW BITS and is restored
  * with unsigned formatting, so values above Long.MaxValue survive.
  * CRC is Castagnoli (ref: binlogger.go:43 `crc32.MakeTable(crc32.Castagnoli)`
  * = `java.util.zip.CRC32C`); a mismatch fails the read like the reference's
  * ErrCRCMismatch rather than silently passing corrupt rows downstream.
  *
  * Files are named `binlog-<pid><seg>-<firstCommitTs>-<lastCommitTs>` so a
  * commit-ts range scan selects FILES before reading a byte — the
  * reference's pushdown purpose (reparo/file.go:47-109 `filterFiles`),
  * made exact: both interval endpoints ride in the name, so selection is
  * plain interval overlap on any segment layout (the reference's
  * first-ts-only heuristic assumes its single sequential writer). File
  * listing is driver metadata work, exactly as reparo's; the decode itself
  * is distributed (one scan partition per segment + per-partition frame
  * parsing — genuine imperative byte work, the one place
  * `mapPartitions`-style logic is the right tool).
  *
  * Scale shape: one file per range-partition on write (sorted by commit_ts,
  * so file boundaries ARE ts boundaries); on read, file selection prunes
  * I/O to the overlapping range and the residual row filter keeps exactness.
  */
object PbBinlogFile {

  val Magic: Int = 471532804 // ref: binlogfile/encoder.go:24

  /** Every file operation here goes through the Hadoop `FileSystem` resolved
    * from the directory's URI — local disk in the sandbox, HDFS or an object
    * store on a cluster — never `java.io`/`java.nio` local-FS calls, which
    * simply don't resolve when binlog segments live on shared storage
    * (ref: reparo/file.go:29-46 reads via its storage abstraction too). */
  /** Read/metadata filesystem: the process-wide cached instance, untouched
    * (mutating the shared instance would change behavior for every other
    * user of the same filesystem in the JVM). */
  private[sources] def fsFor(dir: String, conf: Configuration): FileSystem =
    FileSystem.get(new java.net.URI(dir), conf)

  /** Writer filesystem: a PRIVATE instance (caller closes) with client-side
    * .crc sidecars off — every frame already carries its own CRC32C
    * (sidecars exist on local/checksum filesystems only; HDFS checksums
    * live in the datanode protocol), and the flag must not leak onto the
    * shared cached instance Spark's own committers use. */
  private def writerFsFor(dir: String, conf: Configuration): FileSystem = {
    val fs = FileSystem.newInstance(new java.net.URI(dir), conf)
    fs.setWriteChecksum(false)
    fs
  }

  /** Visible binlog segments under `dir` as (name, length) — dot-prefixed
    * `.inprogress` temps excluded by the name filter. Listing is driver
    * metadata work, exactly as reparo's; lengths feed the v2 scan's size
    * statistics. */
  private[sources] def listSegmentStatus(dir: String,
      conf: Configuration): Seq[(String, Long)] = {
    val fs = fsFor(dir, conf)
    val p = new HPath(dir)
    if (fs.exists(p))
      fs.listStatus(p).map(s => (s.getPath.getName, s.getLen))
        .filter(_._1.startsWith("binlog-")).toSeq
    else Seq.empty
  }

  private[sources] def listSegments(dir: String, conf: Configuration): Seq[String] =
    listSegmentStatus(dir, conf).map(_._1)

  /** Segment names are `binlog-<pid><seg>-<firstTs>-<lastTs>`: carrying
    * BOTH interval endpoints makes file pruning and retention exact
    * metadata-only interval logic for ANY segment layout. The reference
    * carries only the first ts because its binlogger is a single
    * sequential writer (name order IS commit order, reparo/file.go:47-109);
    * this writer is parallel and a directory may accumulate several write
    * invocations, where a name-order heuristic provably drops or reclaims
    * live files (SourcesSpec pins both hazards). */
  private def tsField(name: String, idx: Int): Long = {
    val parts = name.split('-')
    // fail with the segment's NAME, not an index error deep inside plan
    // construction, when a directory holds foreign or pre-format files
    require(parts.length == 4,
      s"unrecognized binlog segment name '$name' " +
        "(expected binlog-<pidseg>-<firstTs>-<lastTs>)")
    parts(idx).toLong
  }
  private[sources] def segFirstTs(name: String): Long = tsField(name, 2)
  private[sources] def segLastTs(name: String): Long = tsField(name, 3)

  /** `value` is optional because the envelope admits NULL values (the JDBC
    * loader binds them null-safely); a primitive field would crash the
    * encoder on the first NULL row, and field 6 needs an absent encoding
    * exactly like props. The typed fields default to absent so 7-column
    * envelopes encode unchanged. `ddl_sql` carries the statement text of an
    * op="DDL" record — the reference's pb binlog interleaves DDL entries
    * with DML in the same file stream (proto/pb_binlog.proto Binlog
    * tp=DDL/ddl_query) so a replay can re-execute schema changes at their
    * commit-ts position; absent on every DML record. */
  case class PbChange(commit_ts: Long, pk: Long, op: String, event_type: String,
      ts_us: Long, value: Option[Double], props: String,
      dec38: String = null, udec: String = null,
      bits: Option[Long] = None, enum_ord: Option[Int] = None,
      ddl_sql: String = null)

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

  /** uint64 decimal text → raw 64 bits (BigInteger.longValue of an
    * in-range value IS the unsigned reinterpretation). The carrying
    * column is DECIMAL(20,0), which holds values OUTSIDE uint64 —
    * wrapping those mod 2^64 would round-trip silently different data,
    * so out-of-range input fails at the row. */
  private def unsignedBits(s: String): Long = {
    val bi = new java.math.BigInteger(s)
    require(bi.signum >= 0 && bi.bitLength <= 64,
      s"udec '$s' does not fit uint64 — the wire would wrap it")
    bi.longValue()
  }

  private[sources] def encodePayload(c: PbChange): Array[Byte] = {
    require(c.op != null && c.event_type != null,
      s"op/event_type must be non-null to encode (pk=${c.pk}, " +
        s"commit_ts=${c.commit_ts})")
    val opB = c.op.getBytes("UTF-8"); val etB = c.event_type.getBytes("UTF-8")
    val prB = if (c.props == null) null else c.props.getBytes("UTF-8")
    val dcB = if (c.dec38 == null) null else c.dec38.getBytes("UTF-8")
    val dlB = if (c.ddl_sql == null) null else c.ddl_sql.getBytes("UTF-8")
    val udBits = if (c.udec == null) 0L else unsignedBits(c.udec)
    var size = 1 + varintLen(c.commit_ts) + 1 + varintLen(c.pk) +
      1 + varintLen(opB.length.toLong) + opB.length +
      1 + varintLen(etB.length.toLong) + etB.length +
      1 + varintLen(c.ts_us)
    if (c.value.isDefined) size += 1 + 8
    if (prB != null) size += 1 + varintLen(prB.length.toLong) + prB.length
    if (dcB != null) size += 1 + varintLen(dcB.length.toLong) + dcB.length
    if (c.udec != null) size += 1 + varintLen(udBits)
    if (c.bits.isDefined) size += 1 + 8
    c.enum_ord.foreach(e => size += 1 + varintLen(e.toLong))
    if (dlB != null) size += 1 + varintLen(dlB.length.toLong) + dlB.length
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    putVarint(b, (1 << 3) | 0); putVarint(b, c.commit_ts)
    putVarint(b, (2 << 3) | 0); putVarint(b, c.pk)
    putStr(b, 3, c.op); putStr(b, 4, c.event_type)
    putVarint(b, (5 << 3) | 0); putVarint(b, c.ts_us)
    c.value.foreach { v => putVarint(b, (6 << 3) | 1); b.putDouble(v) }
    if (prB != null) {
      putVarint(b, (7 << 3) | 2); putVarint(b, prB.length.toLong); b.put(prB)
    }
    if (dcB != null) {
      putVarint(b, (8 << 3) | 2); putVarint(b, dcB.length.toLong); b.put(dcB)
    }
    if (c.udec != null) { putVarint(b, (9 << 3) | 0); putVarint(b, udBits) }
    c.bits.foreach { v => putVarint(b, (10 << 3) | 1); b.putLong(v) }
    c.enum_ord.foreach { e => putVarint(b, (11 << 3) | 0); putVarint(b, e.toLong) }
    if (dlB != null) {
      putVarint(b, (12 << 3) | 2); putVarint(b, dlB.length.toLong); b.put(dlB)
    }
    b.array()
  }

  private[sources] def decodePayload(payload: Array[Byte]): PbChange = {
    val b = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    var commitTs = 0L; var pk = 0L; var op = ""; var et = ""
    var tsUs = 0L; var value: Option[Double] = None; var props: String = null
    var dec38: String = null; var udec: String = null
    var bits: Option[Long] = None; var enumOrd: Option[Int] = None
    var ddlSql: String = null
    while (b.hasRemaining) {
      val tag = getVarint(b)
      val field = (tag >> 3).toInt
      (tag & 7) match {
        case 0 =>
          val v = getVarint(b)
          field match {
            case 1 => commitTs = v; case 2 => pk = v; case 5 => tsUs = v
            case 9 => udec = java.lang.Long.toUnsignedString(v)
            case 11 => enumOrd = Some(v.toInt)
            case _ => () // unknown varint field: skip (proto forward-compat)
          }
        case 1 =>
          val v = b.getLong
          field match {
            case 6 => value = Some(java.lang.Double.longBitsToDouble(v))
            case 10 => bits = Some(v)
            case _ => ()
          }
        case 2 =>
          val len = getVarint(b).toInt
          if (len < 0 || len > b.remaining())
            throw new IllegalArgumentException(s"field $field length $len exceeds payload")
          val bytes = new Array[Byte](len); b.get(bytes)
          val s = new String(bytes, "UTF-8")
          field match {
            case 3 => op = s; case 4 => et = s; case 7 => props = s
            case 8 => dec38 = s; case 12 => ddlSql = s
            case _ => ()
          }
        case wt => throw new IllegalArgumentException(s"unsupported wire type $wt")
      }
    }
    PbChange(commitTs, pk, op, et, tsUs, value, props, dec38, udec, bits,
      enumOrd, ddlSql)
  }

  // ---- framing ----

  private[sources] def encodeFrame(payload: Array[Byte]): Array[Byte] = {
    val crc = new CRC32C(); crc.update(payload)
    val b = ByteBuffer.allocate(16 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(Magic); b.putLong(payload.length.toLong); b.put(payload)
    b.putInt(crc.getValue.toInt)
    b.array()
  }

  /** Strict whole-buffer frame parse; magic and crc mismatches fail loudly
    * (ref: ErrMagicMismatch / ErrCRCMismatch, binlogger.go:37-41), and so
    * does a torn tail — a trailing fragment shorter than one frame header
    * means a writer died mid-write (ref: binlogger.go:308-321 returns the
    * decode error; `decodeFramesRecovering` is the opt-in salvage).
    * The LIVE read path streams frames through
    * [[PbBinlogPartitionReader]] instead (constant memory per segment);
    * this in-memory twin is the codec's executable spec — PbCodecSpec
    * property-tests encode→decode through it, and the two walks must stay
    * byte-for-byte aligned. */
  private[sources] def decodeFrames(content: Array[Byte]): Iterator[PbChange] = {
    val b = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
    new Iterator[PbChange] {
      def hasNext: Boolean = {
        val rem = b.remaining()
        if (rem > 0 && rem < 16) throw new IllegalStateException(
          s"torn binlog tail: $rem trailing bytes (recover mode salvages)")
        rem >= 16
      }
      def next(): PbChange = {
        val magic = b.getInt
        if (magic != Magic)
          throw new IllegalStateException(f"binlog magic mismatch: 0x$magic%08x")
        // same bounds check as the live reader — the two walks must
        // stay aligned on malformed input too
        val len64 = b.getLong
        if (len64 < 0 || len64 > b.remaining())
          throw new IllegalStateException(
            s"binlog frame length $len64 exceeds remaining ${b.remaining()}")
        val len = len64.toInt
        val payload = new Array[Byte](len); b.get(payload)
        val stored = b.getInt
        val crc = new CRC32C(); crc.update(payload)
        if (crc.getValue.toInt != stored)
          throw new IllegalStateException("binlog crc mismatch")
        decodePayload(payload)
      }
    }
  }

  /** Recovering frame parse — the reference's disaster-read mode
    * (binlogger.go:308-321: on ErrCRCMismatch/ErrMagicMismatch, count the
    * corruption and seek the next magic; 504-534 `seekBinlog` scans forward
    * one byte at a time). A corrupt region — a flipped byte, an overwritten
    * stretch, or a torn trailing frame from a writer that died mid-write —
    * is skipped up to the next offset where the magic matches AND the
    * frame's own crc validates; every intact frame after it still decodes.
    * Validating the whole candidate frame (not just its magic, which can
    * occur by chance inside payload bytes) makes the resync one-pass and
    * deterministic where the reference would re-fail and seek again. */
  private[sources] def decodeFramesRecovering(content: Array[Byte]): Iterator[PbChange] = {
    def frameAt(p: Int): Option[(PbChange, Int)] = {
      if (content.length - p < 16) return None
      val b = ByteBuffer.wrap(content, p, content.length - p).order(ByteOrder.LITTLE_ENDIAN)
      if (b.getInt != Magic) return None
      val len = b.getLong
      if (len < 0 || len > content.length - p - 16) return None
      val payload = new Array[Byte](len.toInt); b.get(payload)
      val crc = new CRC32C(); crc.update(payload)
      if (crc.getValue.toInt != b.getInt) return None
      try Some((decodePayload(payload), p + 16 + len.toInt))
      catch { case scala.util.control.NonFatal(_) => None }
    }
    new Iterator[PbChange] {
      private var pos = 0
      private var staged: PbChange = _
      private def advance(): Unit = {
        staged = null
        while (staged == null && content.length - pos >= 16)
          frameAt(pos) match {
            case Some((c, next)) => staged = c; pos = next
            case None => pos += 1 // skip one byte, like the reference's seek
          }
      }
      advance()
      def hasNext: Boolean = staged != null
      def next(): PbChange = { val c = staged; advance(); c }
    }
  }

  // ---- the sink (K4 real shape) ----

  /** Write a change-envelope DataFrame as a directory of pb binlog files:
    * range-partitioned and sorted by commit_ts so each file covers a
    * contiguous ts interval, named by its first AND last commit ts (the
    * metadata file pruning and retention operate on). Within a partition,
    * files ROTATE at `maxBytesPerFile` (ref: binlogfile/binlogger.go:45-46
    * SegmentSizeBytes = 512 MiB, binlogger.go:415-444 rotate-on-size) — an
    * unbounded range partition therefore never produces a file the read
    * side must hold in memory whole. Rotated segments keep the naming
    * invariant: each carries ITS OWN ts interval, so ts-range file pruning
    * sees every segment independently. `dir` must be a shared filesystem
    * path (local here; HDFS/object-store URI on a cluster). */
  /** Optional envelope columns (typed M9 domain + nullable value): absent
    * columns are added as typed NULLs so a 7-column envelope writes
    * unchanged while an enriched one carries its extra fields. */
  private val optionalCols =
    Seq("dec38" -> "string", "udec" -> "string", "bits" -> "bigint",
      "enum_ord" -> "int", "ddl_sql" -> "string")

  def write(changes: DataFrame, dir: String, nFiles: Int = 4,
      maxBytesPerFile: Long = 512L * 1024 * 1024): Unit = {
    // ship the DRIVER's Hadoop conf to the writing tasks: executors must
    // resolve the same filesystem (fs.defaultFS, store credentials) the
    // driver planned the layout for
    val hconf = new SerializableHadoopConf(
      changes.sparkSession.sparkContext.hadoopConfiguration)
    fsFor(dir, hconf.value).mkdirs(new HPath(dir))
    import changes.sparkSession.implicits._
    val normalized = optionalCols.foldLeft(changes) { case (df, (n, t)) =>
      if (df.columns.contains(n)) df else df.withColumn(n, lit(null).cast(t))
    }
    val ds = normalized.select(
        (Seq(col("commit_ts"), col("pk"), col("op"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"), col("props")) ++
          optionalCols.map(c => col(c._1))): _*)
      .as[PbChange]
      .repartitionByRange(nFiles, col("commit_ts"))
      // TOTAL order, not just commit_ts: the retry-idempotence contract
      // below (identical bytes under a colliding name → drop the temp)
      // needs a re-executed task to serialize tied-ts rows identically,
      // and a post-shuffle sort on commit_ts alone leaves their order to
      // fetch timing. EVERY envelope column participates — rows tied on a
      // prefix but differing in ts_us or a typed M9 field would otherwise
      // order by fetch timing, and a speculative retry's bytes would
      // differ, turning the idempotent temp-drop into a spurious
      // different-content collision error
      .sortWithinPartitions(col("commit_ts"), col("pk"), col("op"),
        col("event_type"), col("ts_us"), col("value"), col("props"),
        col("dec38"), col("udec"), col("bits"), col("enum_ord"),
        col("ddl_sql"))
    ds.foreachPartition { rows: Iterator[PbChange] =>
      val fs = writerFsFor(dir, hconf.value)
      val pid = TaskContext.getPartitionId()
      var out: BufferedOutputStream = null
      var finalPath: HPath = null
      var tmpPath: HPath = null
      var written = 0L
      var seg = 0
      // segments become visible ATOMICALLY only on a SUCCESSFUL close: a
      // crashed/retried or speculative task leaves (or deletes) a
      // dot-prefixed .inprogress temp — which every reader here and Spark's
      // file sources skip — never a truncated or mid-write binlog-* file the
      // streaming source could checkpoint as consumed and silently lose the
      // tail of. The temp name carries the task ATTEMPT id so a speculative
      // attempt racing the original never interleaves bytes into its file.
      // Rename is atomic on HDFS and local disk; on an object store whose
      // rename is copy+delete, the dot-prefix contract still keeps a torn
      // copy invisible (no reader ever matches a .inprogress name).
      val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
      var firstTs = 0L
      var lastTs = 0L
      def closeSegment(): Unit = if (out != null) {
        out.close(); out = null
        // the FINAL name is chosen at close, when both interval endpoints
        // are known: exact pruning and retention need the last ts too
        finalPath = new HPath(dir,
          f"binlog-$pid%08d${seg - 1}%08d-$firstTs%020d-$lastTs%020d")
        // A name collision means a prior (or speculative) attempt of this
        // DETERMINISTIC task promoted identical bytes — drop our temp and
        // keep the winner, so retries stay idempotent. The length check
        // separates that case from a genuinely DIFFERENT file colliding on
        // the name (e.g. a re-run writing corrected content over the same
        // ts endpoints): silent loss is never the answer there — the caller
        // must clear or version the directory. The decision CANNOT ride on
        // rename's return value alone: HDFS refuses an existing
        // destination, but LocalFileSystem maps rename to rename(2), which
        // silently REPLACES a destination file — hence the explicit
        // exists() probe first, re-checked after a refused rename for the
        // HDFS race where a concurrent attempt promotes in between. On a
        // POSIX local filesystem a sub-millisecond probe-to-rename window
        // remains in which a concurrent DIFFERENT-content promote could
        // still be replaced — local disk is the single-writer sandbox
        // case; the shared-storage deployments (HDFS, object stores)
        // refuse or version the destination and are fully closed.
        // equal length alone is NOT proof of an idempotent retry: two
        // same-shape batches covering the same ts interval encode to the
        // same byte count with different content, and dropping the temp on
        // length alone would silently lose the second batch — compare the
        // actual bytes before declaring the promote a duplicate
        def sameBytes(a: HPath, b: HPath): Boolean = {
          val ia = fs.open(a)
          try {
            val ib = fs.open(b)
            try org.apache.commons.io.IOUtils.contentEquals(ia, ib)
            finally ib.close()
          } finally ia.close()
        }
        def collide(len: Long): Unit =
          if (len == fs.getFileStatus(tmpPath).getLen &&
              sameBytes(finalPath, tmpPath)) {
            fs.delete(tmpPath, false); ()
          } else throw new java.io.IOException(
            s"promote $tmpPath -> $finalPath failed: " +
              s"a different segment (len $len) already owns the name — " +
              "clear or version the directory before re-writing the interval")
        if (fs.exists(finalPath)) collide(fs.getFileStatus(finalPath).getLen)
        else if (!fs.rename(tmpPath, finalPath)) {
          if (fs.exists(finalPath)) collide(fs.getFileStatus(finalPath).getLen)
          else throw new java.io.IOException(
            s"promote $tmpPath -> $finalPath failed")
        }
      }
      def abortSegment(): Unit = if (out != null) {
        try out.close() catch { case _: Throwable => () }
        out = null
        try { fs.delete(tmpPath, false); () } catch { case _: Throwable => () }
      }
      try {
        rows.foreach { c =>
          // a negative ts would print a sign into the segment NAME's
          // interval fields and poison the directory for every later
          // list/read (the name parse requires exactly 4 '-'-parts);
          // TiDB commit ts are non-negative by construction, so fail the
          // row loudly (the CODEC itself round-trips any Long — only the
          // file-naming write path carries this bound)
          require(c.commit_ts >= 0,
            s"negative commit_ts ${c.commit_ts} cannot ride the " +
              s"segment-name interval (pk=${c.pk})")
          if (out == null) {
            // attempt id disambiguates retries WITHIN one application; the
            // random token disambiguates ACROSS applications sharing the
            // directory (two relay writers' attempt ids both start at 0 —
            // without it they would interleave bytes into one temp)
            val nonce = java.util.UUID.randomUUID().toString.take(8)
            tmpPath = new HPath(dir,
              f".binlog-$pid%08d$seg%08d.$attempt.$nonce.inprogress")
            out = new BufferedOutputStream(fs.create(tmpPath, true))
            seg += 1; written = 0L; firstTs = c.commit_ts
          }
          lastTs = c.commit_ts
          val frame = encodeFrame(encodePayload(c))
          out.write(frame)
          written += frame.length
          if (written >= maxBytesPerFile) closeSegment()
        }
        closeSegment()
      } catch { case t: Throwable => abortSegment(); throw t }
      finally fs.close() // private newInstance, never the shared cache
    }
  }

  /** Append a later batch of changes to an existing wire directory.
    * [[write]] already has append semantics — it only `mkdirs` and names
    * segments by (pid, seg, tsRange), never clobbering earlier intervals —
    * this name states the contract at call sites that stage a multi-batch
    * wire (ref: pump's binlogger appends to the open dir,
    * pkg/binlogfile/binlogger.go:241-268). A later batch covering the SAME
    * interval collides on the name: identical bytes (a retry) are dropped
    * idempotently, different bytes throw — never silent loss. */
  def append(changes: DataFrame, dir: String, nFiles: Int = 4,
      maxBytesPerFile: Long = 512L * 1024 * 1024): Unit =
    write(changes, dir, nFiles, maxBytesPerFile)

  /** K4 retention: reclaim every segment whose ENTIRE commit-ts range lies
    * at or below `safeTs` (ref: pkg/binlogfile/binlogger.go:354-380 GCByPos
    * removes all files before the position and ALWAYS keeps the latest;
    * pump/storage/storage.go:664 GC-by-ts is the same contract on the
    * vlog). The newest segment (by LAST commit ts, name as tie-break) is
    * always kept, like the reference's open file.
    *
    * The reference can reclaim on name order alone because its binlogger is
    * a SINGLE sequential writer (suffix order IS commit order). This
    * writer is parallel and a directory may accumulate several write
    * invocations, so names carry BOTH interval endpoints instead —
    * reclaim is then exact metadata-only interval logic on any layout: a
    * segment goes exactly when its last commit ts is ≤ safeTs. Contract: a
    * read of `(safeTs, ∞)` is unchanged by the reclaim. Driver metadata
    * work through the Hadoop FileSystem; returns the reclaimed segment
    * names (orphaned temps are reclaimed silently, see below).
    *
    * gc is also the reaper for `.inprogress` temps a crashed or abandoned
    * speculative writer left behind: they are invisible to every reader (so
    * age-based cleanup is safe) but would otherwise accumulate in the
    * directory forever. A temp older than `inprogressTtlMs` (default 24 h —
    * far beyond any live task's write) is deleted; a younger one may still
    * have a live writer behind it and is left alone. */
  def gc(spark: SparkSession, dir: String, safeTs: Long,
      inprogressTtlMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = fsFor(dir, conf)
    val p = new HPath(dir)
    if (!fs.exists(p)) return Seq.empty
    val all = fs.listStatus(p)
    val cutoff = System.currentTimeMillis() - inprogressTtlMs
    all.filter(s => s.getPath.getName.endsWith(".inprogress") &&
        s.getModificationTime < cutoff)
      .foreach(s => fs.delete(s.getPath, false))
    val names = all.map(_.getPath.getName).filter(_.startsWith("binlog-")).toSeq
    if (names.isEmpty) return Seq.empty
    val newest = names.maxBy(n => (segLastTs(n), n))
    val victims = names.filter(n => n != newest && segLastTs(n) <= safeTs)
    victims.foreach(n => fs.delete(new HPath(dir, n), false))
    victims
  }

  /** Oracle-checked retention roundtrip (K4 gc): stage the change stream
    * as TWO write invocations (the parallel-writer layout whose segment
    * NAME order is not commit-ts order — the hazard class the
    * content-verified reclaim exists for), gc at 40% of the ts domain,
    * then scan the surviving range through the v2 source. Hash-matching
    * DuckDB's filter over the same range pins the reclaim contract —
    * nothing above safeTs is lost, whatever the layout — under the
    * driver's gate, not just ScalaTest (ref: binlogger.go:354-380 GCByPos;
    * pump/storage/storage.go:664 GC-by-ts). */
  def gcScanQuery(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.util.Scratch.dir("graft_wire_gc")
    // cache the envelope across the staging passes: the max aggregate and
    // the two invocation writes (each with a range-partition sampling
    // pass) would otherwise rescan the source ~5 times. NOT spread and
    // segments kept at 2 per invocation (r21, measured both ways): the
    // feed's pre-exchange work is a trivial projection — the proto encode
    // runs after the range exchange — and a cores-wide segment count was
    // 1.2-2.3× SLOWER (per-segment listing/open/GC-walk overhead dominates
    // the sub-second decode it would parallelize).
    val changes = graft.ops.Cdc.changes(spark, dir).persist()
    try {
      val maxTs = graft.ops.Cdc.maxCommitTs(changes)
      val mid = maxTs / 2
      write(changes.filter(col("commit_ts") <= mid), out, nFiles = 2)
      write(changes.filter(col("commit_ts") > mid), out, nFiles = 2)
      val safeTs = maxTs * 4 / 10
      gc(spark, out, safeTs)
      read(spark, out, startTs = safeTs + 1)
        .select("commit_ts", "pk", "op", "event_type", "ts", "value", "props")
    } finally { changes.unpersist(); () }
  }

  def gcScanSql: String =
    s"""WITH c AS (${graft.ops.Cdc.changesCte})
       |SELECT commit_ts, pk, op, event_type, ts, value, props FROM c
       |WHERE commit_ts > (SELECT max(commit_ts) * 4 // 10 FROM c)""".stripMargin

  // ---- the source (S6 real shape) ----

  /** File selection for a commit-ts range scan — the reference's purpose
    * (reparo/file.go:47-109: select files before decoding a byte), made
    * EXACT: a segment name carries both its first and last commit ts, so a
    * segment is selected iff its interval overlaps `[startTs, endTs]`
    * (endTs 0 = open). The reference's keep-the-last-file-before-start
    * heuristic exists because its names carry only the first ts of a
    * single sequential writer; under this parallel writer that heuristic
    * provably DROPS files once a directory holds more than one write
    * invocation (name order is pid-major, not ts-major) — interval
    * overlap is layout-independent. Output ordered by (firstTs, name) for
    * a deterministic scan order. */
  private[graft] def selectFiles(names: Seq[String], startTs: Long,
      endTs: Long): Seq[String] =
    selectFilesBounded(names, startTs, if (endTs == 0L) Long.MaxValue else endTs)

  /** Inclusive-bounds variant with NO sentinel: `Long.MinValue`/`MaxValue`
    * are "unbounded" by arithmetic alone, so degenerate pushed bounds
    * (`commit_ts <= 0`, bounds at the Long extremes) still prune instead of
    * silently falling back to a full-directory scan. */
  private[graft] def selectFilesBounded(names: Seq[String], lo: Long,
      hi: Long): Seq[String] =
    names.filter(n => segLastTs(n) >= lo && segFirstTs(n) <= hi)
      .sortBy(n => (segFirstTs(n), n))

  /** S5/K5 real shape: the relay-log reader as a STREAM over the binlog
    * directory — new segments are picked up as they are promoted, the
    * streaming checkpoint remembers which were consumed (the offset is the
    * consumed segment-name set), and a restart resumes without re-reading
    * (ref: drainer/relay/reader.go:50-121 re-opens from the persisted
    * position and never re-applies old entries). Rides the SAME DSv2
    * `pbbinlog` table as [[read]] in MICRO_BATCH_READ mode — one source of
    * truth for the wire decode, schema, and segment naming in batch and
    * streaming (the previous implementation duplicated the schema over a
    * `binaryFile` stream). `maxFilesPerTrigger > 0` is the P4 flow-control
    * knob: each trigger admits at most that many new segments (in ts
    * order), so a backlog drains in bounded steps. */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    fsFor(dir, spark.sparkContext.hadoopConfiguration).mkdirs(new HPath(dir))
    val reader = spark.readStream.format("pbbinlog")
    (if (maxFilesPerTrigger > 0)
       reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
     else reader).load(dir)
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
    // test suites, bench reps) must never contend on one directory; the
    // registry's shutdown hook deletes the staged trees on JVM exit
    val out = graft.util.Scratch.dir("graft_wire_scan")
    // pinned across staging: write() costs two passes (range-partition
    // sampling + the write itself) and the max aggregate a third
    // (gcScanQuery's rationale)
    val changes = graft.ops.Cdc.changes(spark, dir).persist()
    val maxTs = try {
      write(changes, out, nFiles = 4)
      graft.ops.Cdc.maxCommitTs(changes)
    } finally { changes.unpersist(); () }
    // sf-relative [20%, 60%] of the ts domain, so the scan prunes files
    // at every scale factor
    read(spark, out, startTs = maxTs * 2 / 10, endTs = maxTs * 6 / 10)
      .select("commit_ts", "pk", "op", "event_type", "ts", "value", "props")
  }

  def wireScanSql: String =
    s"""WITH c AS (${graft.ops.Cdc.changesCte})
       |SELECT commit_ts, pk, op, event_type, ts, value, props FROM c
       |WHERE commit_ts BETWEEN (SELECT max(commit_ts) * 2 // 10 FROM c)
       |                    AND (SELECT max(commit_ts) * 6 // 10 FROM c)""".stripMargin

  /** Oracle-checked S5 relay-stream roundtrip: stage the change stream as
    * binlog segments across two write invocations, then DRAIN the directory
    * through the MICRO_BATCH_READ form of the v2 source — flow-controlled
    * at one segment per trigger, landing in a parquet sink (bounded driver
    * state; the memory sink would hold the whole stream on the driver).
    * Hash-matching DuckDB reading the original parquet pins the streaming
    * path — offset bookkeeping, capped admission, and the shared wire
    * decode — under the driver's gate, not just ScalaTest (ref:
    * drainer/relay/reader.go:50-121 replays the relay log through the same
    * decode as the live pull stream). */
  def relayStreamQuery(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.util.Scratch.dir("graft_wire_relay")
    val sink = graft.util.Scratch.dir("graft_wire_relay_sink")
    val ckpt = graft.util.Scratch.dir("graft_wire_relay_ckpt")
    val changes = graft.ops.Cdc.changes(spark, dir).persist()
    try {
      val mid = graft.ops.Cdc.maxCommitTs(changes) / 2
      write(changes.filter(col("commit_ts") <= mid), out, nFiles = 2)
      write(changes.filter(col("commit_ts") > mid), out, nFiles = 2)
    } finally { changes.unpersist(); () }
    val q = readStream(spark, out, maxFilesPerTrigger = 1)
      .select("commit_ts", "pk", "op", "event_type", "ts", "value", "props")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(sink)
  }

  def relayStreamSql: String =
    s"""WITH c AS (${graft.ops.Cdc.changesCte})
       |SELECT commit_ts, pk, op, event_type, ts, value, props FROM c""".stripMargin

  /** Deterministic corruption injector for the recover-mode oracle: walk a
    * file's frames in place and XOR one payload byte of every frame whose
    * commit_ts satisfies `hit` — the CRC then fails on exactly those frames
    * and salvage must skip them. Test/staging machinery (it trusts the
    * layout it just wrote); the parse mirrors the strict reader's frame
    * walk ([[PbBinlogPartitionReader]]). */
  private def corruptFile(fs: FileSystem, path: HPath, hit: Long => Boolean): Unit = {
    val len0 = fs.getFileStatus(path).getLen.toInt
    val bytes = new Array[Byte](len0)
    val in = fs.open(path)
    try in.readFully(0L, bytes) finally in.close()
    var pos = 0
    var changed = false
    while (bytes.length - pos >= 16) {
      val b = ByteBuffer.wrap(bytes, pos, bytes.length - pos)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.getInt // magic (ours by construction)
      val len = b.getLong.toInt
      val payload = new Array[Byte](len); b.get(payload)
      if (hit(decodePayload(payload).commit_ts)) {
        bytes(pos + 12) = (bytes(pos + 12) ^ 0x5a).toByte
        changed = true
      }
      pos += 16 + len
    }
    if (changed) {
      val out = fs.create(path, true)
      try out.write(bytes) finally out.close()
    }
  }

  /** Oracle-checked salvage read (S6 recover mode): stage wire files,
    * deterministically corrupt every frame whose commit_ts % 7 == 0, then
    * read with `recover = true` — the result must hash-match DuckDB
    * computing the surviving set (commit_ts % 7 != 0) straight from
    * parquet. Pins the magic-resync skip under the driver's gate: exactly
    * the damaged frames vanish, every byte after them still decodes (ref
    * salvage semantics: pkg/binlogfile/binlogger.go:308-321, 504-534).
    * Corruption fans out one task per staged file. */
  def recoverScanQuery(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.util.Scratch.dir("graft_wire_recover")
    val changes = graft.ops.Cdc.changes(spark, dir)
    write(changes, out, nFiles = 4)
    // name prefix, not contains: a crashed/speculative writer's
    // `.binlog-*.inprogress` temp (which read() skips) must not be parsed
    // as complete frames by the corruption injector
    val hconf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val files = listSegments(out, hconf.value)
    // numSlices must be positive even for the degenerate empty feed
    spark.sparkContext.parallelize(files, math.max(files.size, 1))
      .foreach(n => corruptFile(fsFor(out, hconf.value), new HPath(out, n),
        ts => ts % 7 == 0))
    read(spark, out, recover = true)
      .select("commit_ts", "pk", "op", "event_type", "ts", "value", "props")
  }

  def recoverScanSql: String =
    s"""WITH c AS (${graft.ops.Cdc.changesCte})
       |SELECT commit_ts, pk, op, event_type, ts, value, props FROM c
       |WHERE commit_ts % 7 <> 0""".stripMargin

  /** Oracle-checked typed wire round-trip: enrich the change stream with
    * the full M9 type domain — DECIMAL(38,19) text, uint64-as-DECIMAL(20,0),
    * BIT(64) image, enum ordinal — push it through encode → binlog files →
    * decode, and emit the typed columns plus a tz-shifted formatting of the
    * carried timestamp. Hash-matching DuckDB (which computes the same
    * derivations straight from parquet) proves the codec carries every
    * domain bit-exactly: the uint64 survives as a raw-bits varint above
    * Long.MaxValue, the decimal text round-trips unchanged, the instant
    * survives to tz-sensitive formatting (ref:
    * drainer/translator/pb.go:242-296; tests/dailytest/case.go:97-146). */
  def typedRoundtripQuery(spark: SparkSession, dir: String): DataFrame = {
    val out = graft.util.Scratch.dir("graft_wire_typed")
    // pinned across write()'s sampling + write passes (gcScanQuery's
    // rationale — the typed projection re-derives the M9 domain per pass)
    // spread so the M9 projection itself runs wide, not at the single-file
    // scan's parallelism (segment count unchanged — gcScanQuery's note)
    val typed = graft.model.Tables.spread(graft.ops.TypeDomain.typedEnvelope(
      graft.ops.Cdc.changes(spark, dir)), col("commit_ts"), col("pk")).persist()
    try write(typed, out, nFiles = 4) finally { typed.unpersist(); () }
    read(spark, out)
      .select(col("commit_ts"), col("pk"), col("value"),
        col("dec38"), col("udec"), col("bits"),
        col("enum_ord").cast("long").as("enum_ord"),
        date_format(col("ts") + expr("INTERVAL 8 HOURS"), "yyyy-MM-dd HH:mm:ss")
          .as("ts_p8_str"))
  }

  def typedRoundtripSql: String =
    s"""SELECT commit_ts, pk, value, dec38, udec, bits, enum_ord,
       |  strftime(CAST(ts AS TIMESTAMP) + INTERVAL 8 HOUR, '%Y-%m-%d %H:%M:%S') AS ts_p8_str
       |FROM (${graft.ops.TypeDomain.typedEnvelopeCte}) t""".stripMargin

  /** Read the change envelope back from a pb binlog directory, range
    * `[startTs, endTs]` (endTs 0 = open). File selection prunes before any
    * byte is read; the residual commit_ts filter restores exactness.
    * `recover = true` is the reference's corruption-tolerant read
    * (binlogger.go:308-321): corrupt regions and torn trailing frames are
    * skipped via magic resync instead of failing the job — the mode a
    * point-in-time recovery against partially damaged relay files needs.
    * The default stays strict: silent row loss is only acceptable when the
    * caller explicitly opts into salvage semantics. */
  def read(spark: SparkSession, dir: String, startTs: Long = 0L,
      endTs: Long = 0L, recover: Boolean = false): DataFrame = {
    // DSv2 route (SURVEY §4): segment-file pruning happens INSIDE the scan,
    // driven by the pushed commit_ts bounds — visible in the plan
    // (`PushedTsRange`/`SelectedFiles` in the BatchScan description,
    // PlanSpec-pinned) and composable with any later predicate, instead of
    // a driver-side file list Catalyst never sees. The range filters below
    // stay in the plan as residuals (the kept boundary segment may hold
    // rows before startTs), the same inexact-pushdown contract parquet
    // row-group statistics use.
    val base = spark.read.format("pbbinlog")
      .option("recover", recover.toString).load(dir)
    val lower = base.filter(col("commit_ts") >= startTs)
    if (endTs != 0L) lower.filter(col("commit_ts") <= endTs) else lower
  }
}
