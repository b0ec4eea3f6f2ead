package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed partition-parallel through streaming
  * `mapPartitions` kernels (the JVM shape of a vectorized/Pandas-style
  * UDF without its batch buffer: one payload and its decode live at a
  * time per task, no per-row interpreter round-trips).
  *
  * Container metadata (format, dimensions) is parsed from REAL image
  * headers by [[HeaderCodec]] — a zero-dependency magic-bytes sniffer for
  * PNG (IHDR), JPEG (SOF marker scan) and GIF (logical screen descriptor).
  * Pixel-level decode ([[RasterCodec]]) is equally real: the JDK's
  * `javax.imageio` decodes PNG/JPEG/GIF/BMP headless with zero added
  * dependencies, and PNG round-trips losslessly — so raster statistics
  * are computed over ACTUAL pixel values and sit under the hash oracle.
  */
object Multimodal {

  /** An opaque media payload plus typed metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
                      width: Int, height: Int)

  /** Decoded feature record (fixed-shape, columnar-friendly). `format`,
    * `width` and `height` come from the payload's real header; `px_sum`,
    * `n_samples` and `histogram4` are REAL raster statistics over every
    * channel sample of the decoded image (integer-exact so they hash).
    * A payload ImageIO cannot decode reports `n_samples = -1`. */
  case class MediaFeature(doc_id: Long, format: String, width: Int,
                          height: Int, n_bytes: Int, px_sum: Long,
                          n_samples: Long, histogram4: Array[Long])

  /** Real container-header codec: writes and sniffs PNG / JPEG / GIF
    * headers from raw bytes. Encoding exists so the synthetic corpus
    * carries genuine headers for the sniffer to recover — the decode side
    * is exactly what a 100 TB ingest would run on binary columns of
    * unknown provenance (magic bytes, not file extensions). */
  /** Endian byte readers/writers shared by the codecs — ONE copy, so a
    * sign-extension or offset fix can never land in one codec and miss
    * the other. */
  private object Bytes {
    def be16(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
    def be32(v: Int) = Array[Byte]((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    def rdBe16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    def rdBe32(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    def rdLe16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    def rdLe32(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  }

  object HeaderCodec {
    import Bytes._

    val PngSig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** Minimal valid-shape header for the given mime: PNG signature+IHDR
      * (33 B), JPEG SOI+SOF0 (21 B), GIF89a screen descriptor (13 B). */
    def encode(mime: String, width: Int, height: Int): Array[Byte] = mime match {
      case "image/png" =>
        // sig, IHDR length=13, "IHDR", w, h, bit depth 8, truecolor, zeros,
        // CRC left zero (sniffers don't verify it)
        PngSig ++ be32(13) ++ "IHDR".getBytes(StandardCharsets.US_ASCII) ++
          be32(width) ++ be32(height) ++ Array[Byte](8, 2, 0, 0, 0) ++ be32(0)
      case "image/jpeg" =>
        // SOI, SOF0 with length 17: precision 8, height, width, 3 components
        Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xc0.toByte) ++
          be16(17) ++ Array[Byte](8) ++ be16(height) ++ be16(width) ++
          Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
      case "image/gif" =>
        "GIF89a".getBytes(StandardCharsets.US_ASCII) ++
          le16(width) ++ le16(height) ++ Array[Byte](0, 0, 0)
      case other => throw new IllegalArgumentException(s"unsupported mime: $other")
    }

    case class Sniffed(format: String, width: Int, height: Int)

    /** Magic-bytes sniff: format + dimensions, or None when no known
      * signature matches. Pure function of the payload prefix — at scale
      * this is a scan-bound per-row map over the binary column. */
    def sniff(b: Array[Byte]): Option[Sniffed] = {
      if (b.length >= 24 && b.startsWith(PngSig) &&
          new String(b, 12, 4, StandardCharsets.US_ASCII) == "IHDR")
        Some(Sniffed("png", rdBe32(b, 16), rdBe32(b, 20)))
      else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8)
        sniffJpeg(b)
      else if (b.length >= 13 &&
          (b.startsWith("GIF89a".getBytes(StandardCharsets.US_ASCII)) ||
           b.startsWith("GIF87a".getBytes(StandardCharsets.US_ASCII))))
        Some(Sniffed("gif", rdLe16(b, 6), rdLe16(b, 8)))
      else None
    }

    /** Walk JPEG marker segments until a start-of-frame (SOF0/1/2/...)
      * carrying the dimensions; skips APPn/COM/DQT/etc. by their declared
      * lengths, aborts on malformed framing. */
    private def sniffJpeg(b: Array[Byte]): Option[Sniffed] = {
      var i = 2
      while (i + 3 < b.length && u8(b, i) == 0xff) {
        // the spec admits any number of 0xff FILL bytes before a marker
        // (libjpeg emits them): consume the run, or the next 0xff would
        // read as a "marker" and the length-skip walks a bogus offset
        while (i + 3 < b.length && u8(b, i + 1) == 0xff) i += 1
        val marker = u8(b, i + 1)
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 8 >= b.length) return None
          return Some(Sniffed("jpeg", rdBe16(b, i + 7), rdBe16(b, i + 5)))
        } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
          i += 2 // standalone marker, no length field
        } else {
          i += 2 + rdBe16(b, i + 2)
        }
      }
      None
    }
  }

  /** Frame/window granularity for the byte-slicing kernels
    * ([[sampleFrames]]). */
  val FrameBytes = 256

  /** REAL raster codec over the JDK's `javax.imageio` — no added
    * dependencies, works headless. Encode writes a deterministic gray
    * raster (pixel value `(x*7 + y*13 + 3*docId) mod 256` on all three
    * channels) as PNG, which is LOSSLESS: decode reads back the exact
    * samples, so integer pixel statistics are reproducible by an oracle
    * that knows only the formula. Decode accepts any ImageIO-supported
    * container (PNG/JPEG/GIF/BMP) — at 100 TB this is a per-row map over
    * a binary column, scan-bound, no shuffle. */
  object RasterCodec {
    def encodePng(docId: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = ((x * 7 + y * 13 + 3 * docId) % 256).toInt
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Exact integer statistics over every channel sample (R, G and B each
      * count) of the decoded raster. */
    case class Raster(width: Int, height: Int, nSamples: Long, pxSum: Long,
                      hist4: Array[Long])

    def decode(payload: Array[Byte]): Option[Raster] = {
      // ImageIO.read returns null only when NO reader claims the bytes; a
      // reader that CLAIMS a real magic header and then hits a corrupt
      // body THROWS (IIOException on all three formats, JDK-verified) —
      // the malformed-payload contract is None, never a task crash. The
      // in-memory stream also skips ImageIO's default temp-FILE cache
      // (one disk round trip per image inside the scan kernel otherwise).
      val img = try {
        // read(ImageInputStream) CLOSES the stream itself — an explicit
        // close here would double-close, throw in the finally, and turn
        // every successful decode into a swallowed None
        javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(payload)))
      } catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val hist = new Array[Long](4)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            var c = 0
            while (c < 3) {
              val v = (rgb >> (8 * c)) & 0xff
              hist(v >> 6) += 1
              sum += v
              c += 1
            }
            x += 1
          }
          y += 1
        }
        Some(Raster(w, h, 3L * w * h, sum, hist))
      }
    }
  }

  /** Synthesize a media table from the documents payloads: each document's
    * UTF-8 bytes wrapped in a REAL image header (PNG / JPEG / GIF cycling
    * by doc_id) whose encoded dimensions derive deterministically from the
    * text length — so the sniffer's output is verifiable row-by-row. */
  def asMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    // spread before the typed encode/decode kernels: Dataset.map is opaque
    // to Catalyst, so the whole codec chain runs at the SCAN's parallelism
    // (1 task on a single-file input; Tables.spread is a no-op at scale)
    Tables.spread(Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("n_chars")), col("doc_id"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val w = (nChars % 640 + 1).toInt
        val h = (nChars * 7 % 480 + 1).toInt
        val mime = (id % 3).toInt match {
          case 0 => "image/png"
          case 1 => "image/jpeg"
          case _ => "image/gif"
        }
        val payload = HeaderCodec.encode(mime, w, h) ++
          text.getBytes(StandardCharsets.UTF_8)
        MediaRow(id, payload, mime, w, h)
      }
  }

  /** Synthesize a REAL image table: one deterministic PNG per document,
    * dimensions derived from the text length (small — the pixel kernels
    * are per-row CPU, and the formula keeps the DuckDB oracle's
    * generate_series recomputation tractable at verify scale). */
  def asImages(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir)
        .select(col("doc_id"), col("n_chars")), col("doc_id"))
      .as[(Long, Long)]
      .map { case (id, nChars) =>
        val w = (nChars % 40 + 1).toInt
        val h = (nChars * 7 % 30 + 1).toInt
        MediaRow(id, RasterCodec.encodePng(id, w, h), "image/png", w, h)
      }
  }

  /** Partition-parallel decode: the mapInPandas analog. STREAMING per
    * row — one payload plus its decoded raster live at a time per task
    * (a grouped() pre-batching would MULTIPLY peak memory by the batch
    * size while adding no per-batch work). Header metadata is sniffed
    * from the bytes; pixel statistics come from the REAL ImageIO raster
    * decode. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val meta = HeaderCodec.sniff(m.payload)
          .getOrElse(HeaderCodec.Sniffed("unknown", -1, -1))
        RasterCodec.decode(m.payload) match {
          case Some(r) => MediaFeature(m.doc_id, meta.format, r.width,
            r.height, m.payload.length, r.pxSum, r.nSamples, r.hist4)
          case None => MediaFeature(m.doc_id, meta.format, meta.width,
            meta.height, m.payload.length, -1L, -1L, new Array[Long](4))
        }
      }
    }
  }

  /** Oracle-checked REAL pixel statistics: encode a deterministic raster
    * per document with ImageIO, decode it back with ImageIO in the batched
    * kernel, and report integer-exact per-image stats (sum, sample count,
    * 4-bucket histogram over all three channels). PNG is lossless, so the
    * DuckDB oracle recomputes the identical numbers from the pixel formula
    * alone — a hash match proves the encode→decode raster round trip on
    * every image. */
  def pixelStatsQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(asImages(spark, dir)).map { f =>
      (f.doc_id, f.width.toLong, f.height.toLong, f.n_samples, f.px_sum,
        f.histogram4(0), f.histogram4(1), f.histogram4(2), f.histogram4(3))
    }.toDF("doc_id", "width", "height", "n_samples", "px_sum",
      "h0", "h1", "h2", "h3")
  }

  def pixelStatsSql: String =
    """WITH d AS (SELECT doc_id, n_chars % 40 + 1 AS w,
      |                  (n_chars * 7) % 30 + 1 AS h FROM documents),
      |xs AS (SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM d),
      |px AS (SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM xs),
      |v AS (SELECT doc_id, w, h, (x * 7 + y * 13 + 3 * doc_id) % 256 AS val FROM px)
      |SELECT doc_id, w AS width, h AS height,
      |  3 * w * h AS n_samples,
      |  CAST(3 * sum(val) AS BIGINT) AS px_sum,
      |  3 * count(*) FILTER (val // 64 = 0) AS h0,
      |  3 * count(*) FILTER (val // 64 = 1) AS h1,
      |  3 * count(*) FILTER (val // 64 = 2) AS h2,
      |  3 * count(*) FILTER (val // 64 = 3) AS h3
      |FROM v GROUP BY doc_id, w, h""".stripMargin

  /** Oracle-checked metadata extraction: build the payload, then recover
    * format and dimensions FROM THE BYTES with [[HeaderCodec.sniff]]. The
    * DuckDB oracle computes what the header was encoded to carry (format
    * by doc_id mod 3, dimensions by the text-length formulas, byte count
    * by header size + UTF-8 length), so the hash match proves the
    * encode→sniff round trip bit-for-bit on every row. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    asMedia(spark, dir).map { m =>
      val meta = HeaderCodec.sniff(m.payload)
        .getOrElse(HeaderCodec.Sniffed("unknown", -1, -1))
      (m.doc_id, meta.format, m.payload.length.toLong,
        meta.width.toLong, meta.height.toLong)
    }.toDF("doc_id", "format", "n_bytes", "width", "height")
  }

  /** DuckDB formula for a staged payload's byte length — text bytes plus
    * the per-mime header size the codec writes (33 png / 21 jpeg / 13 gif).
    * Shared by every image-payload oracle so a `HeaderCodec.encode` change
    * is mirrored in exactly one place. */
  private val payloadLenSql: String =
    "octet_length(encode(text)) + CASE doc_id % 3 WHEN 0 THEN 33 WHEN 1 THEN 21 ELSE 13 END"

  def mediaMetaSql: String =
    s"""SELECT doc_id,
       |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
       |       ELSE 'gif' END AS format,
       |  $payloadLenSql AS n_bytes,
       |  n_chars % 640 + 1 AS width,
       |  n_chars * 7 % 480 + 1 AS height
       |FROM documents""".stripMargin

  // ---------------------------------------------------------------- audio

  /** An opaque audio payload; all typed metadata lives in the bytes. */
  case class AudioRow(doc_id: Long, payload: Array[Byte])

  /** RIFF/WAVE header codec — same zero-dependency philosophy as the image
    * sniffer: canonical 44-byte PCM header on encode, chunk-walking parse
    * on decode (fmt and data chunks located by id, unknown chunks skipped
    * by declared size, word-aligned as RIFF requires). */
  object WavCodec {
    import Bytes._
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, StandardCharsets.US_ASCII)

    def encode(channels: Int, sampleRate: Int, bits: Int,
               data: Array[Byte]): Array[Byte] = {
      val blockAlign = channels * bits / 8
      "RIFF".getBytes(StandardCharsets.US_ASCII) ++ le32(36 + data.length) ++
        "WAVE".getBytes(StandardCharsets.US_ASCII) ++
        "fmt ".getBytes(StandardCharsets.US_ASCII) ++ le32(16) ++
        le16(1) ++ le16(channels) ++ le32(sampleRate) ++
        le32(sampleRate * blockAlign) ++ le16(blockAlign) ++ le16(bits) ++
        "data".getBytes(StandardCharsets.US_ASCII) ++ le32(data.length) ++ data
    }

    case class SniffedWav(channels: Int, sampleRate: Int, bits: Int,
                          nFrames: Long)

    /** Chunk-walk parse: returns None unless both a PCM fmt chunk and a
      * data chunk are present with consistent framing. */
    def sniff(b: Array[Byte]): Option[SniffedWav] = {
      if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      // Long index walk: a hostile declared chunk size near Int.MaxValue
      // must advance past the buffer end (loop exits), never WRAP to a
      // negative Int index and throw out of the task — malformed bytes of
      // unknown provenance take the documented None path
      var i = 12L
      var fmt: Option[(Int, Int, Int)] = None // channels, rate, bits
      var dataLen = -1
      while (i + 8 <= b.length && (fmt.isEmpty || dataLen < 0)) {
        val ii = i.toInt
        val id = tag(b, ii)
        val sz = rdLe32(b, ii + 4)
        if (sz < 0) return None
        if (id == "fmt " && sz >= 16 && i + 8 + 16 <= b.length)
          fmt = Some((rdLe16(b, ii + 10), rdLe32(b, ii + 12), rdLe16(b, ii + 22)))
        else if (id == "data")
          dataLen = math.min(sz.toLong, b.length - i - 8).toInt // truncated tails tolerated
        i += 8L + sz + (sz & 1) // chunks are word-aligned
      }
      // rate > 0 and whole-byte sample widths join the validity gate: a
      // crafted fmt chunk (4-bit samples, zero rate) must sniff to None,
      // not divide by zero inside frame/duration arithmetic
      fmt.collect { case (ch, rate, bits) if dataLen >= 0 && ch > 0 &&
          rate > 0 && bits > 0 && bits % 8 == 0 =>
        SniffedWav(ch, rate, bits, dataLen.toLong / (ch * (bits / 8)))
      }
    }
  }

  /** Synthesize an audio table: each document's UTF-8 bytes as PCM samples
    * behind a REAL RIFF/WAVE header whose rate/channels derive
    * deterministically from the row — so the sniffer is verifiable. */
  def asAudio(spark: SparkSession, dir: String): Dataset[AudioRow] = {
    import spark.implicits._
    Tables.spread(Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("n_chars")), col("doc_id"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val channels = (id % 2 + 1).toInt
        val rate = (8000 + (nChars % 8) * 1000).toInt
        AudioRow(id, WavCodec.encode(channels, rate, 16,
          text.getBytes(StandardCharsets.UTF_8)))
      }
  }

  /** Oracle-checked audio metadata: sample rate, channel count, frame
    * count and duration recovered FROM THE BYTES; the DuckDB oracle
    * recomputes them from the synthesis formulas, so a hash match proves
    * the RIFF encode→sniff round trip on every row. Integer-milli
    * duration keeps the comparison exact. */
  def audioMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    asAudio(spark, dir).map { a =>
      val w = WavCodec.sniff(a.payload)
        .getOrElse(WavCodec.SniffedWav(-1, -1, -1, -1L))
      // the fallback row is ALL sentinels: -1000/-1 would read as a
      // plausible 1000 ms duration on a failed sniff
      val durMs = if (w.sampleRate <= 0) -1L else w.nFrames * 1000L / w.sampleRate
      (a.doc_id, "wav", w.channels.toLong, w.sampleRate.toLong,
        w.bits.toLong, w.nFrames, durMs)
    }.toDF("doc_id", "format", "channels", "sample_rate", "bits",
      "n_frames", "duration_ms")
  }

  def audioMetaSql: String =
    s"""SELECT doc_id, 'wav' AS format,
       |  doc_id % 2 + 1 AS channels,
       |  8000 + (n_chars % 8) * 1000 AS sample_rate,
       |  CAST(16 AS BIGINT) AS bits,
       |  octet_length(encode(text)) // ((doc_id % 2 + 1) * 2) AS n_frames,
       |  (octet_length(encode(text)) // ((doc_id % 2 + 1) * 2)) * 1000
       |    // (8000 + (n_chars % 8) * 1000) AS duration_ms
       |FROM documents""".stripMargin

  /** Frame sampling: every k-th FrameBytes-sized slice of the payload —
    * the video-keyframe analog, fan-out bounded by `maxFrames`. */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  def sampleFrames(media: Dataset[MediaRow], every: Int = 4, maxFrames: Int = 8,
      frameBytes: Int = FrameBytes): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val nFrames = math.max(1, m.payload.length / frameBytes)
      (0 until nFrames by every).take(maxFrames).map { i =>
        val from = i * frameBytes
        val until = math.min(from + frameBytes, m.payload.length)
        Frame(m.doc_id, i, java.util.Arrays.copyOfRange(m.payload, from, until))
      }
    }
  }

  /** Resize: deterministic stride-downsample of the payload to at most
    * `targetBytes` — the image-thumbnail analog of the stubbed codec. The
    * Spark-side contract (typed rows in, bounded typed rows out, pure
    * per-partition map, no shuffle) is exactly what a real
    * libvips/ffmpeg-backed batch resize plugs into. */
  case class Resized(doc_id: Long, n_in: Int, n_out: Int, payload: Array[Byte])

  def resize(media: Dataset[MediaRow], targetBytes: Int = 256): Dataset[Resized] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val n = m.payload.length
        val step = math.max(1, math.ceil(n.toDouble / targetBytes).toInt)
        val out = (0 until n by step).map(m.payload).toArray
        Resized(m.doc_id, n, out.length, out)
      }
    }
  }

  /** Oracle-checked frame-sample plumbing: the Spark side slices REAL
    * bytes (every 2nd 64-byte frame, fan-out capped at 3 — the
    * video-keyframe shape, sized so the corpus actually exercises stride,
    * cap AND tail truncation); the DuckDB oracle recomputes the index set
    * and each slice's length from the payload-size formulas, so the hash
    * match pins all of them row by row. */
  def frameSampleQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sampleFrames(asMedia(spark, dir), every = 2, maxFrames = 3, frameBytes = 64)
      .map(f => (f.doc_id, f.frame_idx.toLong, f.frame.length.toLong))
      .toDF("doc_id", "frame_idx", "n_frame_bytes")
  }

  def frameSampleSql: String =
    s"""WITH m AS (SELECT doc_id, $payloadLenSql AS len
       |  FROM documents),
       |f AS (SELECT doc_id, len, GREATEST(1, len // 64) AS n_frames FROM m)
       |SELECT doc_id, frame_idx,
       |  LEAST(64, len - frame_idx * 64) AS n_frame_bytes
       |FROM (SELECT doc_id, len,
       |        unnest(generate_series(0,
       |          CAST(LEAST(n_frames - 1, 4) AS BIGINT), 2)) AS frame_idx
       |      FROM f)""".stripMargin

  /** Oracle-checked resize plumbing: stride-downsample each payload to at
    * most 256 bytes on the Spark side; the oracle recomputes input length,
    * stride and output length per row. Swapping the stride kernel for a
    * real raster resize changes neither the contract nor the plan (pure
    * per-partition map, no shuffle). */
  def resizeQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    resize(asMedia(spark, dir))
      .map(r => (r.doc_id, r.n_in.toLong, r.n_out.toLong))
      .toDF("doc_id", "n_in", "n_out")
  }

  def resizeSql: String =
    s"""WITH m AS (SELECT doc_id, $payloadLenSql AS len
       |  FROM documents),
       |s AS (SELECT doc_id, len, (len + 255) // 256 AS step FROM m)
       |SELECT doc_id, len AS n_in, (len - 1) // step + 1 AS n_out FROM s""".stripMargin
}
