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

  test("multimodal decode is deterministic, batched and schema-typed") {
    val media = Multimodal.asMedia(spark, sf)
    val f1 = Multimodal.decodeFeatures(media, batchSize = 7).collect()
      .map(f => f.doc_id -> ((f.n_bytes, f.mean_byte, f.histogram4.toSeq, f.n_frames))).toMap
    val f2 = Multimodal.decodeFeatures(media, batchSize = 64).collect()
      .map(f => f.doc_id -> ((f.n_bytes, f.mean_byte, f.histogram4.toSeq, f.n_frames))).toMap
    assert(f1 == f2, "batch size must not change results")
    assert(f1.values.forall { case (n, _, hist, frames) =>
      hist.sum == n && frames >= 1 })
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
    assert(frames.collect().forall(_.frame.length <= Multimodal.FakeCodec.FrameBytes))
  }
}
