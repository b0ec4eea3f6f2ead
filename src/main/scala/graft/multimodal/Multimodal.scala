package graft.multimodal

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed partition-parallel in fixed-size batches
  * (the JVM shape of a vectorized/Pandas-style UDF: a batch of rows in, a
  * batch of rows out, no per-row interpreter round-trips).
  *
  * The decode kernel is a STUB — the container ships no image/audio codecs —
  * but it is a deterministic fake with the real pipeline shape: binary
  * payload in, fixed-length feature record out, batched `mapPartitions`, no
  * driver-side state, schema fully typed. Swapping [[FakeCodec]] for a real
  * JNI/FFmpeg/JPEG codec changes no plumbing.
  */
object Multimodal {

  /** An opaque media payload plus typed metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
                      width: Int, height: Int)

  /** Decoded feature record (fixed-shape, columnar-friendly). */
  case class MediaFeature(doc_id: Long, n_bytes: Int, mean_byte: Double,
                          histogram4: Array[Long], n_frames: Int)

  /** STUB decode kernel — deterministic fake standing in for a real codec. */
  object FakeCodec {
    val FrameBytes = 256

    def decode(payload: Array[Byte]): (Double, Array[Long], Int) = {
      // real implementation would be: decode image -> pixels -> stats.
      val hist = new Array[Long](4)
      var sum = 0L
      payload.foreach { b =>
        val u = b & 0xff
        hist(u >> 6) += 1
        sum += u
      }
      val mean = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length
      (mean, hist, math.max(1, payload.length / FrameBytes))
    }
  }

  /** Synthesize a media table from the documents payloads (UTF-8 bytes as
    * the opaque blob, metadata derived deterministically). */
  def asMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        MediaRow(id, text.getBytes(StandardCharsets.UTF_8), "application/octet-stream",
          (nChars % 640).toInt, ((nChars * 7) % 480).toInt)
      }
  }

  /** Batched partition-parallel decode: the mapInPandas analog. `batchSize`
    * bounds peak memory per task regardless of payload sizes. */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // a real codec would process `batch` as one vectorized call
        batch.iterator.map { m =>
          val (mean, hist, frames) = FakeCodec.decode(m.payload)
          MediaFeature(m.doc_id, m.payload.length, mean, hist, frames)
        }
      }
    }
  }

  /** Frame sampling: every k-th FrameBytes-sized slice of the payload —
    * the video-keyframe analog, fan-out bounded by `maxFrames`. */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  def sampleFrames(media: Dataset[MediaRow], every: Int = 4, maxFrames: Int = 8): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val nFrames = math.max(1, m.payload.length / FakeCodec.FrameBytes)
      (0 until nFrames by every).take(maxFrames).map { i =>
        val from = i * FakeCodec.FrameBytes
        val until = math.min(from + FakeCodec.FrameBytes, m.payload.length)
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
}
