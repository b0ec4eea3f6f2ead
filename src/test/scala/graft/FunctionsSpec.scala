package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSim.cosine_sim
import graft.multimodal.Multimodal
import graft.sim.Similarity

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  /** The interpreted HOF fold the native expressions replace — kept here as
    * the parity twin: element-ordered double accumulation. */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("native CosineSim == declarative aggregate/zip_with formula, bit-exact") {
    val e = graft.model.Tables.embeddings(spark, sf).limit(200)
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(5000)
      .select(
        cosine_sim(col("a.embedding"), col("b.embedding")).as("native"),
        (hofDot(col("a.embedding"), col("b.embedding")) /
          (sqrt(hofDot(col("a.embedding"), col("a.embedding"))) *
            sqrt(hofDot(col("b.embedding"), col("b.embedding")))))
          .as("declarative"))
    assert(pairs.filter(col("native") =!= col("declarative")).count() == 0)
  }

  test("native DotProd == interpreted fold, bit-exact over the corpus") {
    val e = graft.model.Tables.embeddings(spark, sf).limit(500)
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(5000)
      .select(
        Similarity.dot(col("a.embedding"), col("b.embedding")).as("native"),
        hofDot(col("a.embedding"), col("b.embedding")).as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("DotProd returns NULL on length-mismatched vectors, like the fold") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 2.0f), Array(3.0f, 4.0f))
    ).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getDouble(0) == rows(2).getDouble(1))
  }

  test("null ELEMENTS poison the native expressions like the declarative fold") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // a schema that ADMITS null elements forces the guarded loop; getFloat
    // on the null slot would otherwise contribute 0.0 silently — DotProd
    // and CosineSim must yield NULL (the poisoned fold), PlaneKey must
    // leave every poisoned plane's bit unset (the when-chain's false arm)
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true)),
      StructField("b", ArrayType(FloatType, containsNull = true))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(Seq(1.0f, null, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
      Row(Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f))), 1), schema)
    val got = df.select(
      Similarity.dot(col("a"), col("b")).as("dot"),
      cosine_sim(col("a"), col("b")).as("cos"),
      hofDot(col("a"), col("b")).as("hof"),
      graft.functions.VectorExprs.plane_key(col("a"),
        Seq(Seq(1L, 1L, 1L), Seq(-1L, -1L, -1L))).as("key")).collect()
    assert(got(0).isNullAt(0) && got(0).isNullAt(1) && got(0).isNullAt(2))
    assert(got(0).getLong(3) == 0L, "a poisoned plane's bit must stay unset")
    assert(got(1).getDouble(0) == got(1).getDouble(2))
    assert(math.abs(got(1).getDouble(1) - 1.0) < 1e-12)
    assert(got(1).getLong(3) == 1L) // positive plane set, negative unset
  }

  test("native PlaneKey == per-plane when-chain over the fold, all tables") {
    import graft.text.Lex
    val e = graft.model.Tables.embeddings(spark, sf).limit(500)
    (0 until Lex.NearDupTables).foreach { t =>
      val planes = (0 until Lex.NearDupPlanes)
        .map(p => Lex.nearDupWeights(t * Lex.NearDupPlanes + p))
      val declarative = planes.zipWithIndex.map { case (pw, p) =>
        val w = array(pw.map(v => lit(v.toDouble)): _*)
        when(hofDot(col("embedding"), w) > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      val diff = e.select(
        graft.functions.VectorExprs.plane_key(col("embedding"), planes).as("native"),
        declarative.as("decl"))
        .filter(col("native") =!= col("decl"))
      assert(diff.count() == 0, s"table $t keys diverge")
    }
  }

  test("CosineSim evaluates under codegen and interpreted modes identically") {
    val df = Seq(
      (Array(1.0f, 0.0f, 2.0f), Array(1.0f, 0.0f, 2.0f)),
      (Array(1.0f, 2.0f, 3.0f), Array(-1.0f, -2.0f, -3.0f))
    ).toDF("a", "b").select(cosine_sim(col("a"), col("b")).as("c"))
    val got = df.as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1) + 1.0) < 1e-12)
  }

  test("CosineSim rejects non-float-array inputs at analysis time") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    intercept[Exception] {
      df.select(cosine_sim(col("a"), col("b"))).collect()
    }
  }

  test("header codec sniffs pinned PNG/JPEG/GIF fixtures and rejects junk") {
    import Multimodal.HeaderCodec
    // pinned PNG fixture: 89 PNG sig + IHDR, 640x480
    val png = HeaderCodec.encode("image/png", 640, 480)
    assert(png.length == 33 && (png(0) & 0xff) == 0x89 &&
      new String(png, 1, 3, java.nio.charset.StandardCharsets.US_ASCII) == "PNG")
    assert(HeaderCodec.sniff(png).contains(HeaderCodec.Sniffed("png", 640, 480)))
    // JPEG whose SOF0 sits after an APP0 segment: the marker walk must skip
    // APP0 by its declared length, as in any camera-produced file
    val jfif = Array[Byte](0xff.toByte, 0xd8.toByte,       // SOI
      0xff.toByte, 0xe0.toByte, 0x00, 0x06, 'J', 'F', 'I', 'F') ++ // APP0 len 6
      HeaderCodec.encode("image/jpeg", 123, 45).drop(2)    // SOF0 after it
    assert(HeaderCodec.sniff(jfif).contains(HeaderCodec.Sniffed("jpeg", 123, 45)))
    // GIF87a variant also recognized (little-endian dims)
    val gif87 = "GIF87a".getBytes ++ Array[Byte](0x0f, 0x01, 0x02, 0x00, 0, 0, 0)
    assert(HeaderCodec.sniff(gif87).contains(HeaderCodec.Sniffed("gif", 271, 2)))
    // junk and truncated payloads sniff to None, not garbage
    assert(HeaderCodec.sniff("not an image".getBytes).isEmpty)
    assert(HeaderCodec.sniff(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
  }

  test("wav codec sniffs pinned RIFF fixtures, skips foreign chunks, rejects junk") {
    import Multimodal.WavCodec
    // pinned canonical fixture: stereo 44.1 kHz 16-bit, 8 data bytes
    val wav = WavCodec.encode(2, 44100, 16, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    assert(wav.length == 52)
    assert(WavCodec.sniff(wav).contains(WavCodec.SniffedWav(2, 44100, 16, 2L)))
    // a LIST metadata chunk (odd size → word-aligned skip) before fmt/data,
    // as ffmpeg and field recorders commonly emit
    val listChunk = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0, 'x', 'y', 'z', 0)
    val withMeta = wav.take(12) ++ listChunk ++ wav.drop(12)
    assert(WavCodec.sniff(withMeta).contains(WavCodec.SniffedWav(2, 44100, 16, 2L)))
    // truncated data chunk: frame count clamps to the bytes present
    val truncated = wav.dropRight(4)
    assert(WavCodec.sniff(truncated).contains(WavCodec.SniffedWav(2, 44100, 16, 1L)))
    assert(WavCodec.sniff("RIFFnotawave".getBytes).isEmpty)
    assert(WavCodec.sniff(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("audio metadata round-trips the RIFF header on every row") {
    val bad = Multimodal.audioMeta(spark, sf)
      .filter(col("channels") < 1 || col("sample_rate") < 8000 ||
        col("bits") =!= 16 || col("n_frames") < 0)
      .count()
    assert(bad == 0, "every synthesized wav must sniff back cleanly")
  }

  test("sniffed metadata round-trips the encoded header on every media row") {
    val media = Multimodal.asMedia(spark, sf)
    val mismatched = media.collect().filterNot { m =>
      Multimodal.HeaderCodec.sniff(m.payload)
        .exists(s => s.width == m.width && s.height == m.height &&
          ("image/" + s.format) == m.mime)
    }
    assert(mismatched.isEmpty,
      s"header round-trip failed for docs ${mismatched.take(5).map(_.doc_id).toSeq}")
  }

  test("multimodal raster decode is real, deterministic and schema-typed") {
    val media = Multimodal.asImages(spark, sf)
    val f1 = Multimodal.decodeFeatures(media).collect()
      .map(f => f.doc_id -> ((f.n_bytes, f.px_sum, f.n_samples, f.histogram4.toSeq))).toMap
    val f2 = Multimodal.decodeFeatures(media).collect()
      .map(f => f.doc_id -> ((f.n_bytes, f.px_sum, f.n_samples, f.histogram4.toSeq))).toMap
    assert(f1 == f2, "repeated decode must be deterministic")
    // a claimed-but-corrupt payload (real PNG magic, garbage body) takes
    // the documented None path — n_samples = -1 — never a task crash
    // (ImageIO readers THROW on corrupt bodies; only unclaimed bytes
    // return null)
    import spark.implicits._
    val corrupt = Seq(Multimodal.MediaRow(999L,
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        "not a real png body".getBytes("UTF-8"), "image/png", 3, 3)).toDS()
    val cf = Multimodal.decodeFeatures(corrupt).collect()
    assert(cf.length == 1 && cf(0).n_samples == -1L)
    // real raster invariants: every sample counted once, sum bounded by
    // 255 per sample, every image decoded (n_samples > 0)
    assert(f1.values.forall { case (_, pxSum, n, hist) =>
      n > 0 && hist.sum == n && pxSum >= 0 && pxSum <= 255L * n })
    // a non-image payload takes the documented None path, no throw
    val junk = Multimodal.RasterCodec.decode("not an image".getBytes)
    assert(junk.isEmpty)
    // and the pixel formula reads back exactly (PNG is lossless): doc 0's
    // top-left sample is (0*7 + 0*13 + 0) % 256 = 0 — spot-check one
    // whole small raster against the formula
    val img = Multimodal.RasterCodec.encodePng(5L, 4, 3)
    val r = Multimodal.RasterCodec.decode(img).get
    val expected = (for { y <- 0 until 3; x <- 0 until 4 }
      yield 3L * ((x * 7 + y * 13 + 15) % 256)).sum
    assert(r.pxSum == expected && r.width == 4 && r.height == 3 &&
      r.nSamples == 36L)
  }

  test("resize bounds output size and stays deterministic") {
    val media = Multimodal.asMedia(spark, sf)
    val r1 = Multimodal.resize(media, targetBytes = 64).collect()
      .map(r => r.doc_id -> r.payload.toSeq).toMap
    val r2 = Multimodal.resize(media, targetBytes = 64).collect()
      .map(r => r.doc_id -> r.payload.toSeq).toMap
    assert(r1 == r2)
    assert(Multimodal.resize(media, 64).collect()
      .forall(r => r.n_out <= 64 && (r.n_in < 64 || r.n_out > 32)))
  }

  test("frame sampling bounds fan-out") {
    val frames = Multimodal.sampleFrames(Multimodal.asMedia(spark, sf),
      every = 2, maxFrames = 3)
    val perDoc = frames.groupByKey(_.doc_id).count().collect()
    assert(perDoc.forall(_._2 <= 3))
    assert(frames.collect().forall(_.frame.length <= Multimodal.FrameBytes))
  }

  test("setMask: bitmask via the tracked dictionary; unknown member is a loud NULL") {
    // the documented contract under the default ANSI mode: an unknown SET
    // member (dictionary drift, a comma-bearing member the split breaks)
    // must yield NULL for THAT row — never a silent 0, never a thrown
    // MAP_KEY_DOES_NOT_EXIST that kills the whole query
    val rows = Seq("", "a", "c", "a,c", "a,b,c", "zz", "a,zz")
      .toDF("st").select(col("st"),
        graft.ops.TypeDomain.setMask(Seq("a", "b", "c"), col("st")).as("m"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(rows("") == Some(0L))
    assert(rows("a") == Some(1L))
    assert(rows("c") == Some(4L))
    assert(rows("a,c") == Some(5L))
    assert(rows("a,b,c") == Some(7L))
    assert(rows("zz").isEmpty)
    assert(rows("a,zz").isEmpty)
  }
}
