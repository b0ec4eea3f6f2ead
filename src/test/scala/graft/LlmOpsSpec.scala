package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.{Lex, TextOps}

class LlmOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hex8 matches the cross-engine reference value") {
    // DuckDB: SELECT CAST(('0x' || substr(md5('abc_def_ghi'),1,8)) AS BIGINT) = 3631635757
    val got = Seq("abc_def_ghi").toDF("s")
      .select(Lex.hex8(col("s")).as("h")).head().getLong(0)
    assert(got == 3631635757L)
  }

  test("shingles: guarded for short docs, 1-based windows") {
    val df = Seq("one two three four", "one two", "").toDF("text")
      .select(Lex.shingles(Lex.toks(col("text"))).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq("one_two_three", "two_three_four"))
    assert(rows(1).isEmpty)
    assert(rows(2).isEmpty)
  }

  test("minhash LSH candidates achieve full recall vs exact jaccard at tau=0.5") {
    val lsh = Dedup.minhashLsh(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), "LSH must not invent pairs")
    val recall = if (exact.isEmpty) 1.0 else lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall too low (16 hashes / 8 bands @ 0.5)")
  }

  test("identical texts collide in simhash and exact dedup") {
    val fps = Dedup.simhash(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // planted near-dup clusters at sf0.001: verify a known exact-dup pair if any
    val dups = Dedup.exact(spark, sf).filter(col("n_copies") > 1).count()
    assert(fps.nonEmpty)
    assert(dups >= 0) // exact dedup runs; sf0.001 may have no planted exact dups
  }

  test("ann top-k: rank 1 is the max-cosine neighbor, ranks dense 1..k") {
    val rows = Similarity.annTopK(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    byQuery.foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks.sameElements(1L to 5L))
      val byRank = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("a zero embedding never ranks or pairs: its cosine is NULL, not NaN") {
    // quantize explicitly admits all-zero vectors, and Spark orders NaN
    // ABOVE every real value — unguarded, the zero vector would be the
    // rank-1 neighbor of every query and pass every >= threshold
    import spark.implicits._
    val dir = graft.util.Scratch.dir("graft_zero_vec")
    val zero = Array.fill(8)(0.0f)
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 0L),
      (1L, Array(0.9f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0f), 0L),
      (2L, zero, 0L))
      .toDF("vec_id", "embedding", "label")
    vecs.write.parquet(s"$dir/embeddings.parquet")
    val top = Similarity.annTopK(spark, dir, k = 2, nQueries = 1).collect()
    // rank 1 must be the real neighbor; the zero vector's NULL cosine
    // ranks last (desc puts nulls last), never first as NaN would
    assert(top.find(_.getAs[Long]("rank") == 1L)
      .exists(_.getAs[Long]("vec_id") == 1L))
    val zeroRow = top.find(_.getAs[Long]("vec_id") == 2L)
    assert(zeroRow.forall(_.isNullAt(zeroRow.get.fieldIndex("cos"))))
    // and the thresholded near-dup path never emits a zero-vector pair
    val pairs = Similarity.lshNearDup(spark, dir, threshold = 0.0).collect()
    assert(!pairs.exists(r => r.getAs[Long]("vec_a") == 2L ||
      r.getAs[Long]("vec_b") == 2L))
  }

  test("trained IVF: Lloyd rounds produce k cells and beat-or-match id-prefix recall") {
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      // annTopK queries vec_id < 10; IVF queries 10..14 — brute force over 15
      val brute = Similarity.annTopK(spark, sf, nQueries = 15)
        .filter(col("query_id") >= 10)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      val got = df.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      if (brute.isEmpty) 1.0 else got.intersect(brute).size.toDouble / brute.size
    }
    val cents = Similarity.trainCentroids(spark, sf, nCells = 8, iters = 2)
    assert(cents.count() == 8, "every cell survives training (empty cells keep old centroid)")
    assert(cents.select("qce").as[Array[Long]].collect().forall(_.length == Lex.EmbeddingDim))
    val trained = Similarity.ivfTopKTrained(spark, sf, iters = 2)
    val ranks = trained.groupBy("query_id").count().collect()
    assert(ranks.nonEmpty && ranks.forall(_.getLong(1) <= 5))
    val rTrained = recallOf(trained)
    val rPrefix = recallOf(Similarity.ivfTopK(spark, sf))
    assert(rTrained >= 0.4, s"trained IVF recall $rTrained collapsed")
    assert(rTrained >= rPrefix - 0.2,
      s"trained recall $rTrained far below id-prefix stand-in $rPrefix")
  }

  test("tfidf ranks are dense per doc; bm25 top-k is rank-ordered and query-bounded") {
    val tf = TextOps.tfidf(spark, sf)
    val badRanks = tf.groupBy("doc_id")
      .agg(collect_list("rank").as("rs"))
      .filter(size(col("rs")) > 3)
    assert(badRanks.count() == 0)
    val bm = TextOps.bm25(spark, sf).collect()
    assert(bm.nonEmpty && bm.length <= 20)
    val sorted = bm.sortBy(_.getAs[Long]("rank"))
    val scores = sorted.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "bm25 must not increase with rank")
    // a doc containing none of the query terms can only appear with score 0
    assert(scores.forall(_ >= 0.0))
  }

  test("repetition ratio bounded; packing is gapless within each language") {
    val rep = TextOps.repetition(spark, sf)
    assert(rep.filter(col("rep_ratio") < 0 || col("rep_ratio") > 1).count() == 0)
    val packed = TextOps.packChunks(spark, sf, budget = 128).collect()
      .groupBy(_.getAs[String]("lang"))
    packed.values.foreach { rows =>
      val ordered = rows.sortBy(_.getAs[Long]("doc_id"))
      var start = 0L
      ordered.foreach { r =>
        assert(r.getAs[Long]("chunk_id") == start / 128)
        assert(r.getAs[Long]("chunk_offset") == start % 128)
        start += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("pii redaction finds every planted contact; quantization stays in int8 range") {
    val red = TextOps.piiRedact(spark, sf)
    assert(red.filter(col("n_email") < 1 || col("n_phone") < 1).count() == 0,
      "every doc has one planted email and phone")
    val q = Similarity.quantize(spark, sf)
    assert(q.filter(col("q_min") < -127 || col("q_max") > 127).count() == 0)
    assert(q.filter(col("mean_abs_err") < 0).count() == 0)
    // quantization error is bounded by half a quantization step: 0.5/s with
    // s >= 127/max|v|; embeddings are unit-ish so err stays well under 0.05
    assert(q.agg(max("mean_abs_err")).head().getDouble(0) < 0.05)
  }

  test("hll sketch estimates within the theoretical error band") {
    val rows = graft.sketch.Sketches.hllTokens(spark, sf).collect()
    assert(rows.nonEmpty)
    // 1.04/sqrt(64) ~ 13%; allow 3 sigma for the tiny test strata
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("rel_err")) < 0.4,
        s"lang=${r.getAs[String]("lang")} err=${r.getAs[Double]("rel_err")}")
    }
  }

  test("hll raw-estimator branch (all registers hit) stays within band") {
    import org.apache.spark.sql.functions._
    // 20k distinct tokens in one stratum: every one of the 64 registers is
    // populated, so the estimate comes from α·m²/Σ2^-rank, not linear
    // counting — this is the branch the rank formula actually feeds.
    val tok = spark.range(20000).select(
      lit("xx").as("lang"), concat(lit("tok_"), col("id")).as("tok"))
    val r = graft.sketch.Sketches.hllFromTokens(tok).head()
    assert(r.getAs[Long]("n_exact") === 20000L)
    assert(math.abs(r.getAs[Double]("rel_err")) < 0.4,
      s"raw-branch err=${r.getAs[Double]("rel_err")}")
  }

  test("count-min never underestimates and ranks agree with exact counts") {
    val rows = graft.sketch.Sketches.cmTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cm_estimate") >= r.getAs[Long]("n_exact"),
        s"CM must overestimate: ${r.getAs[String]("tok")}")
    }
  }

  test("bloom semi-join: no false negatives, bounded false-positive rate") {
    val r = graft.sketch.Sketches.bloomSemiJoin(spark, sf).head()
    val members = r.getAs[Long]("n_members")
    val accepted = r.getAs[Long]("n_accepted")
    val fp = r.getAs[Long]("n_false_positives")
    val nonMembers = r.getAs[Long]("n_probed") - members
    assert(accepted >= members, "a Bloom filter never rejects a member")
    assert(fp >= 0 && (nonMembers == 0 || fp.toDouble / nonMembers < 0.05),
      s"fp rate ${fp.toDouble / nonMembers} above the m-sizing target")
  }

  test("lsh buckets are stable and in range") {
    val b = Similarity.lshBuckets(spark, sf)
    assert(b.filter(col("bucket") < 0 || col("bucket") > 255).count() == 0)
    val a = b.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val c = Similarity.lshBuckets(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(a == c)
  }

  test("quality score: ratios bounded, flag consistent") {
    val q = TextOps.qualityScore(spark, sf)
    assert(q.filter(col("punct_ratio") < 0 || col("punct_ratio") > 1).count() == 0)
    assert(q.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() == 0)
    assert(q.filter(col("quality_ok") && col("n_tokens") < 10).count() == 0)
  }

  test("langid scores cover all docs; fingerprints distinct per distinct text") {
    assert(TextOps.langId(spark, sf).count() ==
      graft.model.Tables.documents(spark, sf).count())
    val fp = TextOps.fingerprints(spark, sf)
    val texts = graft.model.Tables.documents(spark, sf)
      .select(countDistinct("text")).head().getLong(0)
    assert(fp.select(countDistinct("exact_fp")).head().getLong(0) == texts)
  }

  test("chunk windows tile every document: last chunk ends at n, stride overlap") {
    val win = 64; val stride = 48
    val chunks = TextOps.chunkWindows(spark, sf, win, stride).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val nToks = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), size(Lex.toks(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == nToks.keySet)
    chunks.foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("chunk_idx"))
      // dense indices from 0, fixed stride starts
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_idx") == i)
        assert(r.getAs[Long]("start_tok") == i.toLong * stride + 1)
      }
      // full coverage: the final chunk reaches exactly token n
      val last = sorted.last
      assert(last.getAs[Long]("start_tok") + last.getAs[Long]("n_chunk_toks") - 1
        == nToks(doc))
      // every interior chunk is full width (only the tail may be short)
      sorted.init.foreach(r => assert(r.getAs[Long]("n_chunk_toks") == win))
    }
  }

  test("contamination: eval split excluded, ratios bounded, self-dup contaminates") {
    val c = TextOps.contamination(spark, sf).collect()
    assert(c.forall(_.getAs[Long]("doc_id") % 10 != 0), "eval docs must not be scored")
    assert(c.forall { r =>
      val ratio = r.getAs[Double]("overlap_ratio")
      ratio >= 0.0 && ratio <= 1.0 &&
        r.getAs[Long]("n_overlap") <= r.getAs[Long]("n_shingles")
    })
    // a train doc sharing its exact text with an eval doc must be flagged
    val d = graft.model.Tables.documents(spark, sf)
    val evalTexts = d.filter(col("doc_id") % 10 === 0)
      .filter(size(Lex.toks(col("text"))) >= 3)
      .select("text").distinct()
    val clones = d.filter(col("doc_id") % 10 =!= 0)
      .join(evalTexts, "text").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    if (clones.nonEmpty) {
      val flagged = c.filter(r => clones(r.getAs[Long]("doc_id")))
      assert(flagged.forall(_.getAs[Boolean]("contaminated")),
        "exact eval clones must be contaminated")
    }
  }

  test("pmi bigrams: bounded output, counts honored, pmi finite") {
    val p = TextOps.pmiBigrams(spark, sf, minCount = 5, topK = 25).collect()
    assert(p.length <= 25 && p.nonEmpty)
    assert(p.forall(_.getAs[Long]("c_big") >= 5))
    assert(p.forall(r => !r.getAs[Double]("pmi").isNaN &&
      !r.getAs[Double]("pmi").isInfinite))
  }

  test("hll merge: union of per-shard sketches == one global sketch") {
    val merged = graft.sketch.Sketches.hllMerge(spark, sf).head()
    val single = graft.sketch.Sketches.hllFromTokens(
      graft.model.Tables.documents(spark, sf)
        .select(lit("all").as("lang"),
          explode(array_distinct(Lex.toks(col("text")))).as("tok"))).head()
    assert(merged.getAs[Double]("hll_merged") ==
      single.getAs[Double]("hll_estimate"))
    assert(merged.getAs[Long]("n_exact") == single.getAs[Long]("n_exact"))
    assert(merged.getAs[Long]("n_shards") > 1)
  }

  test("embedding dedup: canonical strictly smaller, consistent with pair set") {
    val pairs = Similarity.lshNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    val dd = Similarity.embedDedup(spark, sf).collect()
    dd.foreach { r =>
      val v = r.getAs[Long]("vec_id"); val canon = r.getAs[Long]("canonical_id")
      assert(canon < v)
      assert(pairs.contains((canon, v)), "canonical must be a verified neighbor")
    }
    assert(dd.map(_.getAs[Long]("vec_id")).toSet == pairs.map(_._2).toSet)
  }

  test("incremental dedup: exact dup, near dup, and novel all verdict correctly") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // doc 4 / 9 / 14 are the "new batch" (id % 5 == 4): 4 copies doc 0
    // exactly, 9 shares most shingles with doc 1, 14 is unrelated
    val docs = Seq(
      (0L, base, "en", "src0"),
      (1L, base + " with a small tail of extra words attached", "en", "src0"),
      (2L, "completely different text about database storage engines", "en", "src0"),
      (4L, base, "en", "src1"),
      (9L, base + " with a small tail of extra words appended", "en", "src1"),
      (14L, "unrelated musings on compiler construction and type systems", "en", "src1")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = graft.util.Scratch.dir("incdedup")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.incrementalDedup(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(4L) == ("exact_dup", 0L))
    // doc 9 verifies against both base docs (0 shares the whole base text,
    // 1 shares base + a similar tail); matched_id is the MINIMUM match
    assert(out(9L)._1 == "near_dup" && Set(0L, 1L).contains(out(9L)._2))
    assert(out(14L) == ("novel", -1L))
    assert(out.size == 3) // only the new batch is judged
  }

  test("pq adc: ranks dense, distances monotone, recall beats random") {
    import graft.sim.Similarity
    val out = Similarity.pqTopK(spark, sf).collect()
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 5)
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
      val dists = sorted.map(_.getAs[Long]("approx_l2"))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
    // exact integer-L2 ground truth on the same fixed-point grid
    val vecs = graft.model.Tables.embeddings(spark, sf)
      .collect().map { r =>
        r.getAs[Long]("vec_id") ->
          r.getSeq[Float](1).map(v => math.round(v.toDouble * Similarity.FxScale)).toArray
      }.toMap
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val recalls = byQ.map { case (qid, rs) =>
      val exact = vecs.toSeq.filter(_._1 != qid)
        .sortBy { case (id, v) => (l2(v, vecs(qid)), id) }
        .take(5).map(_._1).toSet
      val approx = rs.map(_.getAs[Long]("vec_id")).toSet
      (approx & exact).size / 5.0
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"PQ recall@5 vs exact grid L2 was $mean — " +
      "codebook no longer informative")
  }

  test("rarity score: every doc scored, verdict consistent with the cutoffs") {
    val rows = graft.text.TextOps.rarityScore(spark, sf).collect()
    assert(rows.length ==
      graft.model.Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_nats"); val v = r.getAs[String]("verdict")
      assert(m > 0 && m < 20, s"self-information out of range: $m")
      val expect = if (m < graft.text.TextOps.RarityLow) "boilerplate"
        else if (m > graft.text.TextOps.RarityHigh) "noise" else "keep"
      assert(v == expect)
    }
  }

  test("source mix: weights normalize to 1 and flattening boosts small sources") {
    val rows = graft.text.TextOps.sourceMix(spark, sf).collect()
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-3, s"weights must normalize, got $wsum")
    val byShare = rows.sortBy(_.getAs[Double]("share"))
    // α = 0.5 flattening: the smallest source gains, the largest loses
    assert(byShare.head.getAs[Double]("boost") >= byShare.last.getAs[Double]("boost"))
  }
}
