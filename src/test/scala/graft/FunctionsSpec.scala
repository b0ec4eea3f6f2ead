package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSim.cosine_sim
import graft.multimodal.Multimodal
import graft.sim.Similarity

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("native CosineSim == declarative aggregate/zip_with formula, bit-exact") {
    val e = graft.model.Tables.embeddings(spark, sf).limit(200)
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .limit(5000)
      .select(
        cosine_sim(col("a.embedding"), col("b.embedding")).as("native"),
        (Similarity.dot(col("a.embedding"), col("b.embedding")) /
          (Similarity.norm(col("a.embedding")) * Similarity.norm(col("b.embedding"))))
          .as("declarative"))
    assert(pairs.filter(col("native") =!= col("declarative")).count() == 0)
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

  test("frame sampling bounds fan-out") {
    val frames = Multimodal.sampleFrames(Multimodal.asMedia(spark, sf),
      every = 2, maxFrames = 3)
    val perDoc = frames.groupByKey(_.doc_id).count().collect()
    assert(perDoc.forall(_._2 <= 3))
    assert(frames.collect().forall(_.frame.length <= Multimodal.FakeCodec.FrameBytes))
  }
}
