package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.text.Lex

/** Document deduplication for large-scale training-data pipelines.
  *
  * Four strategies, all shuffle-parallel and driver-state-free:
  *
  *  - exact: hash-groupBy on the full text digest — one shuffle keyed by a
  *    uniformly distributed hash, no skew, scales to any corpus size.
  *  - MinHash + LSH: shingle → 16-way minhash signature → 8 banded buckets →
  *    bucket-join for candidates → exact-Jaccard verification. The band join
  *    only materializes colliding pairs, so cost is output-bound (near-dup
  *    mass), not O(n²).
  *  - n-gram Jaccard: inverted-index join on shingles (pairs sharing no
  *    shingle are never formed), exact similarity, no probabilistic screen.
  *  - SimHash: 32-bit sign fingerprint per document ([[Lex.SimhashBits]]); near-dup candidates are
  *    equal-fingerprint groups (or small Hamming balls at query time).
  *
  * Oracle parity: every hash/permutation constant comes from [[Lex]] and is
  * embedded in both the Spark plan and the generated DuckDB SQL.
  */
object Dedup {

  /** Exact dedup: one row per distinct text digest with the surviving
    * (minimum) doc id and the duplicate count. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))

  def exactSql: String =
    """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** Distinct (doc_id, shingle) pairs — the shared base for MinHash and
    * Jaccard. Filter-before-explode keeps token positions identical across
    * engines.
    *
    * The token array is materialized as its own column BEFORE the shingle
    * lambda runs: higher-order functions are interpreted (not codegen'd), so
    * an unbound `toks` subtree inside the lambda would re-run the regex
    * split once per array element — O(tokens²) per document. Binding it to
    * an attribute makes each element_at an O(1) read. */
  def docShingles(spark: SparkSession, dir: String): DataFrame =
    // spread BEFORE the tokenize: the regex split + per-shingle md5 is the
    // family's CPU-dominant stage and must not inherit a small scan's
    // 1-split parallelism (Tables.spread — a no-op once splits ≥ cores)
    Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), Lex.toks(col("text")).as("toks"))
      .select(col("doc_id"), explode(array_distinct(Lex.shingles(col("toks")))).as("sh"))

  val docShinglesCte: String =
    s"""SELECT doc_id, unnest(list_distinct(${Lex.shinglesSql(Lex.toksSql("text"))})) AS sh
       |FROM documents""".stripMargin

  /** 16-column minhash signature per document. One shuffle on doc_id with
    * map-side partial min aggregation. The md5-derived hash is bound to a
    * column once so the 16 permutation aggregates read an attribute instead
    * of re-hashing the shingle 16 times. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    signaturesFrom(docShingles(spark, dir))

  private def signaturesFrom(sh: DataFrame): DataFrame = {
    val hashed = sh.select(col("doc_id"), Lex.hex8(col("sh")).as("h"))
    val aggs = (0 until 16).map(j => min(Lex.minhashPerm(j, col("h"))).as(s"mh$j"))
    hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** The 16-permutation signature column list and the 8-band select
    * union — ONE definition for every SQL generator, mirroring how the
    * Spark side shares [[signaturesFrom]]/[[bandsFrom]]: a band-layout
    * change desynchronizing one of three hand-copied lists would split
    * the incremental oracle from the LSH oracle silently. */
  private def sigColsSql(sep: String = ", "): String = {
    val h = Lex.hex8Sql("sh")
    (0 until 16).map(j => s"min(${Lex.minhashPermSql(j, h)}) AS mh$j")
      .mkString(sep)
  }

  private def bandSelectsSql: String =
    (0 until 8).map(b =>
      s"SELECT doc_id, $b AS band, mh${2 * b} || ',' || mh${2 * b + 1} AS sig FROM sigs")
      .mkString("\n  UNION ALL ")

  def minhashSignaturesSql: String =
    s"""WITH s AS ($docShinglesCte)
       |SELECT doc_id,
       |  ${sigColsSql(",\n  ")}
       |FROM s GROUP BY doc_id""".stripMargin

  /** MinHash-LSH near-dup pairs: 8 bands × 2 rows; any band collision makes
    * a candidate; candidates verified with exact Jaccard ≥ 0.5. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // One materialization of the exploded shingles feeds both the signature
    // pipeline and the verification restriction — the tokenize+md5 scan (the
    // CPU-dominant stage) runs exactly once, traded for one local-disk write
    // of the exploded rows (the same volume a shuffle of them would spill).
    val sh0 = docShingles(spark, dir).localCheckpoint(true)
    val bands = bandsFrom(signaturesFrom(sh0))
    // Candidate pairs are materialized once (eager local checkpoint): three
    // downstream branches consume them — the doc-id restriction, both sides
    // of the intersection — and each would otherwise re-run the signature
    // pipeline; an exchange reuse cannot cover sub-plans under different
    // shuffle keys. The candidate set is output-bound (near-dup mass), so
    // this materialization is small at any corpus size.
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .localCheckpoint(true)
    // Verification cost must be candidate-bound, not corpus-bound: the
    // shingle inverted index is first semi-joined down to documents that
    // appear in some candidate pair, so the O(pairs-sharing-a-shingle)
    // intersection join never sees the full corpus. The candidate-doc set
    // is OUTPUT-proportional — near-dup mass, unbounded in corpus size —
    // so it is NOT broadcast-hinted: a shuffle semi-join scales with it,
    // and AQE still picks broadcast when the set measures small.
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct()
    val sh = sh0.join(candDocs, Seq("doc_id"), "left_semi")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    cand.join(intersectionCounts(sh), Seq("doc_a", "doc_b"))
      .transform(withJaccard(sizes, threshold = 0.5))
  }

  /** 8 bands × 2 rows from a 16-column signature frame: one row per
    * (doc, band) with the band's concatenated signature. */
  private def bandsFrom(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          concat_ws(",", col(s"mh${2 * b}"), col(s"mh${2 * b + 1}")).as("sig"))): _*)).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.sig"))

  /** Per-pair shared-shingle counts over an inverted index: pairs sharing no
    * shingle are never materialized. */
  private def intersectionCounts(sh: DataFrame): DataFrame =
    sh.as("sa").join(sh.as("sb"),
        col("sa.sh") === col("sb.sh") && col("sa.doc_id") < col("sb.doc_id"))
      .groupBy(col("sa.doc_id").as("doc_a"), col("sb.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))

  /** Attach |A∪B| via the per-doc set sizes and keep pairs at ≥ threshold. */
  private def withJaccard(sizes: DataFrame, threshold: Double)(
      pairs: DataFrame): DataFrame =
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard",
        round(col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")

  private def verifyJaccardSql(candCte: String, threshold: Double,
      shingleCte: String = docShinglesCte): String =
    s"""WITH s AS ($shingleCte),
       |cand AS ($candCte),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY 1),
       |inter AS (
       |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS n_inter
       |  FROM s sa JOIN s sb ON sa.sh = sb.sh AND sa.doc_id < sb.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b,
       |  round(CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter), 4) AS jaccard
       |FROM cand JOIN inter USING (doc_a, doc_b)
       |JOIN sizes na ON na.doc_id = doc_a
       |JOIN sizes nb ON nb.doc_id = doc_b
       |WHERE round(CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter), 4) >= $threshold""".stripMargin

  def minhashLshSql: String = {
    val candCte =
      s"""WITH s2 AS ($docShinglesCte),
         |sigs AS (SELECT doc_id, ${sigColsSql()} FROM s2 GROUP BY doc_id),
         |bands AS (
         |  $bandSelectsSql)
         |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id""".stripMargin
    // candCte itself starts with WITH — inline it as a subquery instead
    verifyJaccardSql(s"SELECT * FROM ($candCte)", 0.5)
  }

  /** Document-frequency cap for the exact-Jaccard inverted index: a shingle
    * appearing in more documents than this is boilerplate — it contributes
    * a df²/2 posting-list self-join (the one unbounded skew in an inverted
    * index: one hot navigation-bar shingle at corpus scale is a quadratic
    * single-key blowup) while carrying almost no Jaccard signal. Capped
    * shingles are excluded from the shingle universe (intersections AND set
    * sizes, both engines), so the measure stays a true Jaccard over the
    * informative-shingle sets. */
  val MaxShingleDf = 128

  /** Inverted-index exact n-gram Jaccard near-dups (no probabilistic
    * screen): pairs sharing at least one (informative) shingle, kept at
    * ≥ 0.5. The pair counts come straight out of the inverted-index join —
    * no separate candidate pass, no distinct over the (large) pair set.
    * Hot shingles above [[MaxShingleDf]] are removed via a broadcast
    * anti-join against the (tiny) hot-shingle census, bounding every
    * posting-list self-join key at df ≤ cap. */
  /** The df-capped shingle index — the ONE inverted-index universe both
    * [[ngramJaccard]] and [[containmentDedup]] measure over (a change to
    * the capping scheme lands in both by construction). The exploded
    * shingles feed several branches (hot census, both join sides, the size
    * aggregate) — materialized once. */
  private def cappedShingles(spark: SparkSession, dir: String): DataFrame = {
    val sh0 = docShingles(spark, dir).localCheckpoint(true)
    val hot = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") > MaxShingleDf)
    // the hot census is the Zipf HEAD of the shingle vocabulary —
    // it grows with vocabulary, not with the cap, so no broadcast hint:
    // AQE broadcasts when it measures small, shuffles when it does not
    sh0.join(hot.select("sh"), Seq("sh"), "left_anti")
      .localCheckpoint(true)
  }

  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = cappedShingles(spark, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    intersectionCounts(sh).transform(withJaccard(sizes, threshold = 0.5))
  }

  /** Shingles restricted to df ≤ [[MaxShingleDf]] — the ngramJaccard
    * universe, mirrored in SQL. */
  private val cappedShinglesCte: String =
    s"""SELECT * FROM ($docShinglesCte) s0
       |WHERE sh NOT IN (
       |  SELECT sh FROM ($docShinglesCte) GROUP BY sh
       |  HAVING count(*) > $MaxShingleDf)""".stripMargin

  def ngramJaccardSql: String =
    verifyJaccardSql(
      s"""SELECT DISTINCT sa.doc_id AS doc_a, sb.doc_id AS doc_b
         |FROM ($cappedShinglesCte) sa JOIN ($cappedShinglesCte) sb
         |  ON sa.sh = sb.sh AND sa.doc_id < sb.doc_id""".stripMargin, 0.5,
      shingleCte = cappedShinglesCte)

  /** Asymmetric CONTAINMENT near-dup — |A∩B| / |A| over the informative
    * shingle sets (Broder's containment measure, the standard companion to
    * Jaccard in corpus dedup): detects a document that is a near-SUBSET of
    * another — an excerpt, a quote page, a boilerplate-wrapped copy.
    * Symmetric Jaccard misses exactly this case: as the containing
    * document grows, |A∩B|/|A∪B| shrinks while |A∩B|/|A| stays ≈ 1.
    * Same scale shape as [[ngramJaccard]]: the SAME hot-shingle-capped
    * inverted index ([[cappedShingles]]) bounds every posting-list
    * self-join key at df ≤ [[MaxShingleDf]], and the pair counts come out
    * of the ordered (`doc_a < doc_b`) join — each sharing pair is
    * aggregated ONCE, not once per orientation.
    *
    * Emits a TRUE drop list: exactly one row per qualifying pair,
    * oriented smaller-set ⊂ larger-set (`contained` is the candidate to
    * drop, `container` the survivor); equal set sizes keep the smaller
    * doc id (the canonical-survivor convention the cluster dedups use).
    * Scoring only the smaller side loses nothing — n_inter/|smaller| ≥
    * n_inter/|larger|, so any qualifying orientation implies the
    * smaller-side one qualifies — and a mutual near-identical pair can
    * never emit both directions (which, read as a drop list, would drop
    * every copy and keep none). */
  def containmentDedup(spark: SparkSession, dir: String): DataFrame = {
    val sh = cappedShingles(spark, dir)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    intersectionCounts(sh)
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("contained",
        when(col("n_a") < col("n_b"), col("doc_a")).otherwise(col("doc_b")))
      .withColumn("container",
        when(col("n_a") < col("n_b"), col("doc_b")).otherwise(col("doc_a")))
      .withColumn("containment",
        round(col("n_inter").cast("double") / least(col("n_a"), col("n_b")), 4))
      .filter(col("containment") >= 0.8)
      .select("contained", "container", "containment")
  }

  def containmentDedupSql: String =
    s"""WITH s AS ($cappedShinglesCte),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY 1),
       |inter AS (
       |  SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS n_inter
       |  FROM s sa JOIN s sb ON sa.sh = sb.sh AND sa.doc_id < sb.doc_id
       |  GROUP BY 1, 2)
       |SELECT CASE WHEN na.n_sh < nb.n_sh THEN doc_a ELSE doc_b END AS contained,
       |  CASE WHEN na.n_sh < nb.n_sh THEN doc_b ELSE doc_a END AS container,
       |  round(CAST(n_inter AS DOUBLE) / least(na.n_sh, nb.n_sh), 4) AS containment
       |FROM inter
       |JOIN sizes na ON na.doc_id = doc_a
       |JOIN sizes nb ON nb.doc_id = doc_b
       |WHERE round(CAST(n_inter AS DOUBLE) / least(na.n_sh, nb.n_sh), 4) >= 0.8""".stripMargin

  /** Near-dup clusters: connected components over the verified MinHash-LSH
    * pair graph; every clustered document maps to its canonical (minimum)
    * doc id — the "keep one copy per near-dup group" primitive of corpus
    * dedup. Reuses the shuffle-parallel label-propagation loop; component
    * size is bounded by near-dup mass, not corpus size. */
  def lshClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLsh(spark, dir)
    val half = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    // connectedComponents repartitions + materializes the edges itself
    val edges = half.unionByName(
        half.select(col("dst").as("src"), col("src").as("dst")))
    graft.ops.Causality.connectedComponents(edges)
      .select(col("node").as("doc_id"), col("label").as("canonical_id"))
  }

  /** Incremental dedup — the every-crawl workload: a NEW batch of documents
    * checked against the EXISTING corpus without re-pairing the corpus
    * against itself. The batch split is deterministic (doc_id % 5 == 4 is
    * the "fresh crawl", the other 80% the standing corpus). Verdict per new
    * doc: `exact_dup` (text digest already present), else `near_dup` (a
    * MinHash band collision with a base doc verified at Jaccard ≥ 0.5),
    * else `novel`; `matched_id` = the minimum matching base doc id (−1 for
    * novel — a sentinel, not NULL, so the column stays integral in every
    * engine's dataframe bridge).
    *
    * Scale shape: in production the base side's digest table and band
    * table are PERSISTED byproducts of prior ingests (append-only parquet,
    * partitioned by band/sig prefix), so an increment costs
    * O(new·bands + collisions): the band join is new×base only, the
    * shingle verify is semi-joined down to candidate docs on both sides,
    * and the standing corpus is never re-shingled or self-joined. Here
    * both sides derive from one snapshot table because the sandbox has a
    * single corpus version. */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
    val isNew = col("doc_id") % 5 === 4
    // exact layer: base digest dictionary (stored, in production)
    val baseDig = docs.filter(!isNew)
      .groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("base_exact"))
    val exact = docs.filter(isNew)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .join(baseDig, Seq("h"), "left")
      .select(col("doc_id"), col("base_exact"))
    // near layer: band tables per side, candidate join across sides only
    val sh0 = docShingles(spark, dir).localCheckpoint(true)
    val bands = bandsFrom(signaturesFrom(sh0))
    val cand = bands.filter(isNew).as("x")
      .join(bands.filter(!isNew).as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig"))
      .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("base_id"))
      .distinct()
      .localCheckpoint(true)
    val candNew = cand.select(col("new_id").as("doc_id")).distinct()
    val candBase = cand.select(col("base_id").as("doc_id")).distinct()
    // candidate-doc sets are output-proportional (see minhashLsh) — no
    // broadcast hint; AQE decides by measured size
    val shNew = sh0.join(candNew, Seq("doc_id"), "left_semi")
    val shBase = sh0.join(candBase, Seq("doc_id"), "left_semi")
    val inter = shNew.as("sa").join(shBase.as("sb"), col("sa.sh") === col("sb.sh"))
      .groupBy(col("sa.doc_id").as("new_id"), col("sb.doc_id").as("base_id"))
      .agg(count(lit(1)).as("n_inter"))
    val sizes = sh0.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val near = cand.join(inter, Seq("new_id", "base_id"))
      .join(sizes.select(col("doc_id").as("new_id"), col("n_sh").as("n_a")), "new_id")
      .join(sizes.select(col("doc_id").as("base_id"), col("n_sh").as("n_b")), "base_id")
      .filter(round(col("n_inter").cast("double") /
        (col("n_a") + col("n_b") - col("n_inter")), 4) >= 0.5)
      .groupBy("new_id").agg(min("base_id").as("base_near"))
    exact.join(near, col("doc_id") === col("new_id"), "left")
      .select(col("doc_id"),
        when(col("base_exact").isNotNull, "exact_dup")
          .when(col("base_near").isNotNull, "near_dup")
          .otherwise("novel").as("verdict"),
        coalesce(col("base_exact"), col("base_near"), lit(-1L)).as("matched_id"))
  }

  def incrementalDedupSql: String = {
    s"""WITH s AS ($docShinglesCte),
       |base_dig AS (
       |  SELECT md5(text) AS h, min(doc_id) AS base_exact
       |  FROM documents WHERE doc_id % 5 <> 4 GROUP BY 1),
       |exact AS (
       |  SELECT d.doc_id, bd.base_exact
       |  FROM documents d LEFT JOIN base_dig bd ON md5(d.text) = bd.h
       |  WHERE d.doc_id % 5 = 4),
       |sigs AS (SELECT doc_id, ${sigColsSql()} FROM s GROUP BY doc_id),
       |bands AS (
       |  $bandSelectsSql),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS base_id
       |  FROM bands x JOIN bands y ON x.band = y.band AND x.sig = y.sig
       |  WHERE x.doc_id % 5 = 4 AND y.doc_id % 5 <> 4),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY 1),
       |inter AS (
       |  SELECT sa.doc_id AS new_id, sb.doc_id AS base_id, count(*) AS n_inter
       |  FROM s sa JOIN s sb ON sa.sh = sb.sh
       |  WHERE sa.doc_id % 5 = 4 AND sb.doc_id % 5 <> 4
       |  GROUP BY 1, 2),
       |near AS (
       |  SELECT new_id, min(base_id) AS base_near
       |  FROM cand
       |  JOIN inter USING (new_id, base_id)
       |  JOIN sizes na ON na.doc_id = new_id
       |  JOIN sizes nb ON nb.doc_id = base_id
       |  WHERE round(CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter), 4) >= 0.5
       |  GROUP BY 1)
       |SELECT e.doc_id,
       |  CASE WHEN base_exact IS NOT NULL THEN 'exact_dup'
       |       WHEN base_near IS NOT NULL THEN 'near_dup'
       |       ELSE 'novel' END AS verdict,
       |  coalesce(base_exact, base_near, -1) AS matched_id
       |FROM exact e LEFT JOIN near nr ON e.doc_id = nr.new_id""".stripMargin
  }

  /** Near-dup clusters via STAR CONTRACTION instead of label propagation:
    * same verified MinHash-LSH pair graph, same (doc_id, canonical_id)
    * output, but the fixpoint loop is alternating large-star/small-star
    * ([[graft.ops.Causality.connectedComponentsStar]]) — O(log² n) rounds
    * on any component shape vs label propagation's O(diameter). The two
    * implementations are oracle-checked against the SAME recursive-CTE
    * components, which pins them equal to each other; the spec additionally
    * stresses a chain-shaped graph where propagation would need one round
    * per hop. At 100 TB this is the variant to run when near-dup chains
    * (templated boilerplate with drifting payload) make component diameter
    * unbounded. */
  def ccStarClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashLsh(spark, dir)
    graft.ops.Causality.connectedComponentsStar(
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .select(col("node").as("doc_id"), col("label").as("canonical_id"))
  }

  def lshClustersSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT * FROM ($minhashLshSql)),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |reach(node, label) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.src, r.label FROM reach r JOIN edges e ON e.dst = r.node)
       |SELECT node AS doc_id, min(label) AS canonical_id
       |FROM reach GROUP BY node""".stripMargin

  /** SimHash: [[Lex.SimhashBits]]-bit (32) sign fingerprint over
    * distinct-token hashes. Documents with equal fingerprints are near-dup
    * candidates. (16 bits was rejected — it collides far too often; size
    * Hamming-ball buckets from the 2^32 fingerprint space.) */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    // NOT spread (r22, paired both-orders + driver PERF_r21): unlike the
    // shingle family there is no downstream self-join to feed — one
    // tokenize+explode into a map-side-partial aggregate — so the added
    // exchange and cores-wide hash aggregate cost more than the CPU they
    // spread (driver: dedup_simhash_near 0.37×, anti-scaling 0.49)
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(Lex.toks(col("text")))).as("tok"))
      .withColumn("h", Lex.hex8(col("tok")))
    val bitSums = (0 until Lex.SimhashBits).map(b =>
      sum(when((col("h").bitwiseAND(lit(1L << b))) > 0, 1).otherwise(-1)).as(s"s$b"))
    val agg = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until Lex.SimhashBits)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** 64-bit SimHash fingerprint as two 32-bit halves (fp_lo from md5 hex
    * 1-8, fp_hi from hex 9-16) — 64 independent bits per token with every
    * bit kept out of the BIGINT sign position in both engines. 32 bits is
    * not enough for Hamming-ball search on template-heavy corpora: at
    * billions of docs the 32-bit space itself saturates and equal-fp groups
    * go quadratic. */
  def simhash64(spark: SparkSession, dir: String): DataFrame = {
    // Per-bit set-counts packed 4-to-a-long in 16-bit lanes: 16 narrow sum
    // aggregates instead of 64 CASE sums. The ±1 vote sum s_b = 2·c_b − n,
    // so "s_b > 0" ⟺ "2·c_b > n" with c_b = count of tokens setting bit b
    // and n = token count — same fingerprint, but the aggregate buffer is
    // 16+1 longs (hash-aggregate row of ~136 B instead of ~520 B) and each
    // update term is a shift-and-mask, not a branch. Packing bound: the top
    // lane is shifted by 48, so the running sum stays below the long sign
    // bit for counts < 2^15 = 32768 distinct tokens per document — an order
    // of magnitude above real web documents (a pipeline ingesting larger
    // blobs would pre-truncate or fall back to the unpacked 64-sum form).
    // The DuckDB oracle keeps the direct 64-CASE formulation — only the
    // output is compared. TOKEN BOUND, enforced: one pathological blob
    // with ≥ 2^15 distinct tokens (a dumped word list, a genome file)
    // would push a lane sum into the long sign bit — ANSI throws, the
    // non-ANSI sum silently corrupts the fingerprint. Sort-then-slice
    // keeps the SAME deterministic subset in both engines; below the
    // bound the sort is a no-op for the order-independent sums.
    // NOT spread (r22): same rationale as [[simhash]] — the 16 packed sums
    // aggregate map-side; the r21 spread here was the round's worst driver
    // regression (dedup_simhash_near 0.37×, faster at 8 cores than 32)
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(slice(array_sort(array_distinct(Lex.toks(col("text")))),
          1, 32767)).as("tok"))
      .select(col("doc_id"), Lex.hex8(col("tok")).as("h1"), Lex.hex8b(col("tok")).as("h2"))
    def packed(h: Column, prefix: String): Seq[Column] =
      (0 until 8).map { k =>
        val term = (0 until 4).map { l =>
          shiftright(h, 4 * k + l).bitwiseAND(lit(1L)) * lit(1L << (16 * l))
        }.reduce(_ + _)
        sum(term).as(s"$prefix$k")
      }
    val agg = tok.groupBy("doc_id")
      .agg(count(lit(1)).as("n"),
        (packed(col("h1"), "a") ++ packed(col("h2"), "b")): _*)
    def fold(prefix: String) = (0 until 32).map { b =>
      val cnt = shiftright(col(s"$prefix${b / 4}"), 16 * (b % 4)).bitwiseAND(lit(65535L))
      when(cnt * 2 > col("n"), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc_id"), fold("a").as("fp_lo"), fold("b").as("fp_hi"))
  }

  def simhash64Sql: String = {
    val h1 = Lex.hex8Sql("tok")
    val h2 = Lex.hex8bSql("tok")
    val sums = ((0 until 32).map(b => s"sum(CASE WHEN (h1 & ${1L << b}) > 0 THEN 1 ELSE -1 END) AS a$b") ++
      (0 until 32).map(b => s"sum(CASE WHEN (h2 & ${1L << b}) > 0 THEN 1 ELSE -1 END) AS b$b"))
      .mkString(", ")
    def fold(prefix: String) = (0 until 32)
      .map(b => s"CASE WHEN $prefix$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id, $h1 AS h1, $h2 AS h2 FROM (
       |    SELECT doc_id,
       |      unnest(list_sort(list_distinct(${Lex.toksSql("text")}))[1:32767]) AS tok
       |    FROM documents)),
       |agg AS (SELECT doc_id, $sums FROM t GROUP BY doc_id)
       |SELECT doc_id, ${fold("a")} AS fp_lo, ${fold("b")} AS fp_hi FROM agg""".stripMargin
  }

  /** SimHash near-pairs at Hamming distance ≤ k (= [[Lex.SimhashMaxHamming]],
    * 3): by pigeonhole a pair within distance k matches exactly in at least
    * one of k+1 = 4 disjoint 16-bit bands of the 64-bit fingerprint, so
    * candidates come from 4 equi-joins on (band, key) — never a cross join —
    * then the exact popcount filter keeps real neighbors.
    *
    * Scale bound, WITH a recall cost stated honestly: buckets holding
    * more than [[Lex.SimhashBandCap]] docs are dropped before the
    * self-join. Pigeonhole guarantees only ONE matching band per
    * near-pair, so a pair whose single matching band is hot is LOST —
    * and an identical-fingerprint group larger than the cap (the
    * strongest duplicate signal, hot in all 4 bands) emits no pairs at
    * all. That is the deliberate trade: boilerplate mega-clusters are
    * better handled by [[exact]] (which has no cap) than by
    * materializing their quadratic pair set here. The cap bounds
    * within-bucket join cost at cap²/2 pairs per bucket — total
    * candidate volume ≤ 4 bands × 2^16 keys × cap²/2 independent of
    * corpus size — which is what keeps the plan alive at 100 TB where a
    * single hot template bucket would otherwise go quadratic. */
  def simhashNear(spark: SparkSession, dir: String): DataFrame = {
    val fp = simhash64(spark, dir)
    val bandKeys = Seq(
      col("fp_lo") % 65536L, expr("fp_lo div 65536"),
      col("fp_hi") % 65536L, expr("fp_hi div 65536"))
    // one materialization feeds the occupancy census and both join sides
    val bands = fp.select(col("doc_id"), col("fp_lo"), col("fp_hi"),
        explode(array(bandKeys.zipWithIndex.map { case (k, i) =>
          struct(lit(i).as("band"), k.as("key"))
        }: _*)).as("bk"))
      .select(col("doc_id"), col("fp_lo"), col("fp_hi"),
        col("bk.band").as("band"), col("bk.key").as("key"))
      .localCheckpoint(true)
    val hot = bands.groupBy("band", "key").agg(count(lit(1)).as("occ"))
      .filter(col("occ") > Lex.SimhashBandCap)
    val ok = bands.join(broadcast(hot.select("band", "key")), Seq("band", "key"), "left_anti")
    ok.as("a").join(ok.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (bit_count(expr("a.fp_lo ^ b.fp_lo")) +
          bit_count(expr("a.fp_hi ^ b.fp_hi"))).cast("long").as("hamming"))
      .filter(col("hamming") <= Lex.SimhashMaxHamming)
      .distinct()
  }

  def simhashNearSql: String =
    s"""WITH fps AS (SELECT * FROM ($simhash64Sql)),
       |f AS (SELECT doc_id, fp_lo, fp_hi,
       |        fp_lo % 65536 AS b0, fp_lo // 65536 AS b1,
       |        fp_hi % 65536 AS b2, fp_hi // 65536 AS b3 FROM fps),
       |bands AS (
       |  SELECT doc_id, fp_lo, fp_hi, 0 AS band, b0 AS key FROM f
       |  UNION ALL SELECT doc_id, fp_lo, fp_hi, 1, b1 FROM f
       |  UNION ALL SELECT doc_id, fp_lo, fp_hi, 2, b2 FROM f
       |  UNION ALL SELECT doc_id, fp_lo, fp_hi, 3, b3 FROM f),
       |hot AS (SELECT band, key FROM bands GROUP BY band, key
       |        HAVING count(*) > ${Lex.SimhashBandCap}),
       |ok AS (SELECT * FROM bands b WHERE NOT EXISTS (
       |        SELECT 1 FROM hot h WHERE h.band = b.band AND h.key = b.key))
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.fp_lo, b.fp_lo)) +
       |       bit_count(xor(a.fp_hi, b.fp_hi)) AS BIGINT) AS hamming
       |FROM ok a JOIN ok b
       |  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp_lo, b.fp_lo)) +
       |      bit_count(xor(a.fp_hi, b.fp_hi)) <= ${Lex.SimhashMaxHamming}""".stripMargin

  def simhashSql: String = {
    val h = Lex.hex8Sql("tok")
    val bitSums = (0 until Lex.SimhashBits)
      .map(b => s"sum(CASE WHEN (h & ${1L << b}) > 0 THEN 1 ELSE -1 END) AS s$b")
      .mkString(", ")
    val fp = (0 until Lex.SimhashBits)
      .map(b => s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH t AS (
       |  SELECT doc_id, $h AS h FROM (
       |    SELECT doc_id, unnest(list_distinct(${Lex.toksSql("text")})) AS tok
       |    FROM documents)),
       |a AS (SELECT doc_id, $bitSums FROM t GROUP BY doc_id)
       |SELECT doc_id, $fp AS simhash FROM a""".stripMargin
  }

  /** Exact substring-level duplication (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr
    * criterion): a token position is duplicated if the 8-token gram
    * starting there occurs in ≥ 2 distinct documents. Reports, per
    * affected doc, how many of its gram positions are duplicated.
    *
    * Unlike the pairwise dedups above this needs NO candidate pairs at
    * all: positional grams → one keyed aggregate for the ≥2-doc gram set →
    * one semi-join back. Everything is linear in corpus size with
    * hash-partitioned shuffles only — the suffix-array machinery of the
    * paper collapses to an inverted gram index in Spark. Grams travel as
    * 32-bit hashes, not strings, to keep the two shuffles narrow. */
  val SubstrGram = 8

  def substringSpans(spark: SparkSession, dir: String): DataFrame = {
    val n = SubstrGram
    val pos = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), Lex.toks(col("text")).as("toks"))
      .select(col("doc_id"),
        posexplode(when(size(col("toks")) >= n,
          transform(sequence(lit(1), size(col("toks")) - (n - 1)), i =>
            // 64-bit gram identity (hex16): the 32-bit hash collides at
            // ~10^5 distinct grams and saturates at corpus scale, marking
            // never-duplicated positions as duplicated in both engines
            Lex.hex16(concat_ws("_", (0 until n).map(j =>
              element_at(col("toks"), i + j)): _*))))
          .otherwise(array())))
      .select(col("doc_id"), col("pos"), col("col").as("g"))
      // three consumers (gram census, per-doc totals, dup counts) — the
      // tokenize+md5-per-position stage is the CPU-dominant cost, so it is
      // materialized once instead of computed three times; the write is
      // the same volume a shuffle of the frame would spill anyway
      .localCheckpoint(true)
    val dupGrams = pos.groupBy("g")
      .agg(countDistinct("doc_id").as("ndocs"))
      .filter(col("ndocs") >= 2).select("g")
    val perDoc = pos.groupBy("doc_id").agg(count(lit(1)).as("n_pos"))
    val dupPerDoc = pos.join(dupGrams, "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup"))
    perDoc.join(dupPerDoc, "doc_id")
      .withColumn("dup_ratio", round(col("n_dup") / col("n_pos").cast("double"), 4))
      .select("doc_id", "n_pos", "n_dup", "dup_ratio")
  }

  def substringSpansSql: String = {
    val n = SubstrGram
    val toks = Lex.toksSql("text")
    val gram = (0 until n).map(j => s"toks[i+$j]").mkString(" || '_' || ")
    s"""WITH pos AS (
       |  SELECT doc_id, i AS pos, ${Lex.hex16Sql("gram")} AS g FROM (
       |    SELECT doc_id, i, $gram AS gram
       |    FROM (SELECT doc_id, $toks AS toks FROM documents),
       |         unnest(range(1, len(toks) - ${n - 2})) AS t(i))),
       |dup_grams AS (
       |  SELECT g FROM pos GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
       |per_doc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pos FROM pos GROUP BY 1),
       |dup_per_doc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
       |  FROM pos JOIN dup_grams USING (g) GROUP BY 1)
       |SELECT doc_id, n_pos, n_dup,
       |  round(n_dup / CAST(n_pos AS DOUBLE), 4) AS dup_ratio
       |FROM per_doc JOIN dup_per_doc USING (doc_id)""".stripMargin
  }
}
