package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language identification, document fingerprinting.
  * All pure per-row projections — no shuffle, codegen'd, scan-bound at any
  * scale.
  */
object TextOps {

  // regex constants single-sourced for the Spark plan AND the oracle SQL
  // (the Lex pattern: editing one copy of a duplicated pattern silently
  // breaks cross-engine agreement, detected only as a hash mismatch);
  // patterns stay in the common Java-regex/RE2 subset — which EXCLUDES
  // \s itself: Java's \s contains \x0B (vertical tab), RE2's does not,
  // so the class is spelled out explicitly
  private val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\f\\r]"
  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\\b"

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (letter runs / digit runs / single symbols). */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(Lex.toks(col("text"))).cast("long").as("n_tokens"),
      size(regexp_extract_all(lower(col("text")), lit(bpePattern), lit(0))).cast("long").as("n_bpe"),
      col("n_chars"))

  def tokenCountsSql: String =
    s"""SELECT doc_id,
       |  len(${Lex.toksSql("text")}) AS n_tokens,
       |  len(regexp_extract_all(lower(text), '$bpePattern')) AS n_bpe,
       |  n_chars
       |FROM documents""".stripMargin

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  private def inList(t: Column, words: Seq[String]): Column =
    words.map(w => (t === w).cast("int")).reduce(_ + _) > 0

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean token
    * length, plus a combined keep/drop flag — the usual pre-training
    * heuristics, expressed as one projection. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    // Staged projections mirror the oracle's CTE structure: every expensive
    // expression (regex split, regexp_replace, stopword filter) is bound to
    // an attribute before anything references it twice. Multi-referenced
    // non-trivial aliases also stop CollapseProject from re-inlining them.
    val toks = col("toks")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"), Lex.toks(col("text")).as("toks"))
      .select(
        col("doc_id"), col("lang"),
        size(toks).cast("long").as("n_tokens"),
        round((length(col("text")) -
            length(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""))).cast("double") /
          length(col("text")), 4).as("punct_ratio"),
        size(filter(toks, t => inList(t, stopwords))).cast("long").as("stop_cnt"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).as("tok_len_sum"))
      .select(
        col("doc_id"), col("lang"), col("n_tokens"), col("punct_ratio"),
        round(col("stop_cnt").cast("double") / col("n_tokens"), 4).as("stopword_ratio"),
        round(col("tok_len_sum").cast("double") / col("n_tokens"), 4).as("mean_token_len"),
        (col("n_tokens") >= 10 && col("punct_ratio") < 0.1 && col("stop_cnt") > 0)
          .as("quality_ok"))
  }

  def qualityScoreSql: String = {
    val toks = Lex.toksSql("text")
    val stopList = stopwords.map(w => s"(t = '$w')::INT").mkString(" + ")
    s"""WITH d AS (
       |  SELECT doc_id, lang, text,
       |    $toks AS toks,
       |    length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS alnum_len
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, lang,
       |    len(toks) AS n_tokens,
       |    round(CAST(length(text) - alnum_len AS DOUBLE) / length(text), 4) AS punct_ratio,
       |    len(list_filter(toks, t -> ($stopList) > 0)) AS stop_cnt,
       |    round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks), 4) AS mean_token_len
       |  FROM d)
       |SELECT doc_id, lang, n_tokens, punct_ratio,
       |  round(CAST(stop_cnt AS DOUBLE) / n_tokens, 4) AS stopword_ratio,
       |  mean_token_len,
       |  (n_tokens >= 10 AND punct_ratio < 0.1 AND stop_cnt > 0) AS quality_ok
       |FROM m""".stripMargin
  }

  /** Marker words per language for the n-gram/lexicon language-ID
    * heuristic. Shared between engines. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "de" -> Seq("der", "die", "und", "ist", "mit"),
    "es" -> Seq("el", "la", "que", "es", "con"),
    "fr" -> Seq("le", "les", "et", "est", "avec"))

  /** Language ID: score = marker-token hits per language, argmax with a
    * fixed precedence tie-break, 'und' when nothing matches. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val toks = col("toks")
    val scores = langMarkers.map { case (l, ws) =>
      l -> size(filter(toks, t => inList(t, ws)))
    }
    val Seq(en, de, es, fr) = scores.map(_._2)
    val pred = when(en + de + es + fr === 0, "und")
      .when(en >= de && en >= es && en >= fr, "en")
      .when(de >= es && de >= fr, "de")
      .when(es >= fr, "es")
      .otherwise("fr")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), Lex.toks(col("text")).as("toks"))
      .select(
        col("doc_id"), col("lang"),
        en.cast("long").as("s_en"), de.cast("long").as("s_de"),
        es.cast("long").as("s_es"), fr.cast("long").as("s_fr"),
        pred.as("pred_lang"))
  }

  def langIdSql: String = {
    val toks = Lex.toksSql("text")
    val sc = langMarkers.map { case (l, ws) =>
      val hits = ws.map(w => s"(t = '$w')::INT").mkString(" + ")
      s"len(list_filter(toks, t -> ($hits) > 0)) AS s_$l"
    }.mkString(",\n    ")
    s"""WITH d AS (SELECT doc_id, lang, $toks AS toks FROM documents),
       |m AS (
       |  SELECT doc_id, lang,
       |    $sc
       |  FROM d)
       |SELECT doc_id, lang, s_en, s_de, s_es, s_fr,
       |  CASE WHEN s_en + s_de + s_es + s_fr = 0 THEN 'und'
       |       WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
       |       WHEN s_es >= s_fr THEN 'es'
       |       ELSE 'fr' END AS pred_lang
       |FROM m""".stripMargin
  }

  /** Document fingerprinting: exact digest, order-insensitive content
    * digest (sorted distinct tokens), and the minimum shingle hash (a
    * 1-permutation minhash — cheap similarity prefilter). */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    val toks = col("toks")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), Lex.toks(col("text")).as("toks"))
      .select(
        col("doc_id"),
        md5(col("text")).as("exact_fp"),
        md5(array_join(array_sort(array_distinct(toks)), " ")).as("content_fp"),
        array_min(transform(array_distinct(Lex.shingles(toks)), s => Lex.hex8(s)))
          .as("min_shingle_hash"))
  }

  def fingerprintsSql: String = {
    val toks = Lex.toksSql("text")
    s"""SELECT doc_id,
       |  md5(text) AS exact_fp,
       |  md5(array_to_string(list_sort(list_distinct($toks)), ' ')) AS content_fp,
       |  list_min(list_transform(list_distinct(${Lex.shinglesSql(toks)}),
       |    s -> ${Lex.hex8Sql("s")})) AS min_shingle_hash
       |FROM documents""".stripMargin
  }

  /** Corpus n-gram statistics: the 5 most frequent word 3-grams per
    * language — occurrence counts (not distinct-per-doc), one shuffle on
    * (lang, shingle) with map-side partial counts, then a top-k window per
    * language. */
  def ngramFreq(spark: SparkSession, dir: String): DataFrame = {
    // spread before the tokenize+shingle stage (Tables.spread: no-op once
    // the scan has splits ≥ cores — guide §2.5 small-input parallelism)
    val sh = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .select(col("lang"), Lex.toks(col("text")).as("toks"))
      .select(col("lang"), explode(Lex.shingles(col("toks"))).as("sh"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("n").desc, col("sh"))
    sh.groupBy("lang", "sh").agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
  }

  def ngramFreqSql: String =
    s"""WITH s AS (
       |  SELECT lang, unnest(${Lex.shinglesSql(Lex.toksSql("text"))}) AS sh
       |  FROM documents),
       |c AS (SELECT lang, sh, count(*) AS n FROM s GROUP BY 1, 2)
       |SELECT lang, sh, n, rank FROM (
       |  SELECT lang, sh, n,
       |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, sh) AS rank
       |  FROM c)
       |WHERE rank <= 5""".stripMargin

  /** End-to-end corpus curation — the composition a training-data pipeline
    * actually runs: quality gate (length/punctuation/stopword heuristics)
    * AND exact-dedup survivor (minimum doc id per text digest). Both sides
    * are single-scan aggregations/projections; the final semi-join keys on
    * doc_id. */
  def curateCorpus(spark: SparkSession, dir: String): DataFrame = {
    val quality = qualityScore(spark, dir)
      .filter(col("quality_ok"))
      .select("doc_id", "lang", "n_tokens")
    val canon = Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("keep_id"))
      .select(col("keep_id").as("doc_id"))
    quality.join(canon, Seq("doc_id"), "left_semi")
  }

  def curateCorpusSql: String =
    s"""WITH q AS (SELECT * FROM ($qualityScoreSql)),
       |canon AS (SELECT min(doc_id) AS keep_id FROM documents GROUP BY md5(text))
       |SELECT doc_id, lang, n_tokens FROM q
       |WHERE quality_ok AND doc_id IN (SELECT keep_id FROM canon)""".stripMargin

  /** TF-IDF: per document, the top-3 terms by tf·ln(N/df) — the classic
    * relevance weighting, shuffle-shaped like an inverted index: one
    * (doc, term) aggregate for tf, one term-keyed aggregate for df (the
    * tf frame is already distinct per (doc, term), so df is a plain
    * count), one join keyed on term, one per-doc top-k window. All score
    * inputs are integers (tf, df, N), so both engines feed identical
    * doubles into ln; the rounded score is what ranks and what ships.
    * At scale every stage partitions by doc or term — no global state. */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), explode(Lex.toks(col("text"))).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).select(countDistinct("doc_id").as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("tok"))
    tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("doc_id", "rank", "tok", "tfidf")
  }

  def tfidfSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(${Lex.toksSql("text")}) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
       |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.tok,
       |    round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 4) AS tfidf
       |  FROM tf JOIN df USING (tok) CROSS JOIN n)
       |SELECT doc_id, rank, tok, tfidf FROM (
       |  SELECT doc_id, tok, tfidf,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rank
       |  FROM scored)
       |WHERE rank <= 3""".stripMargin

  /** BM25 query scoring: Okapi BM25 (k1 = 1.2, b = 0.75) of every document
    * against a fixed conjunctive query, top-20 by score. Per query term the
    * component is idf·tf·(k1+1)/(tf + k1·(1−b+b·len/avgdl)) with
    * idf = ln(1 + (N−df+0.5)/(df+0.5)); the per-document total is a
    * FIXED-ORDER sum of the (≤3) term components — written as conditional
    * aggregates added left-to-right, never a float `sum()` whose
    * accumulation order the shuffle would choose — so both engines run the
    * identical IEEE op sequence. avgdl divides two integer totals, exact in
    * both. Global top-k is orderBy+limit (TakeOrdered — distributed partial
    * top-k per partition, no single-partition window), rank attached on the
    * 20 surviving rows. */
  /** Default BM25 query — terms present in the synthetic corpus. */
  val Bm25Query: Seq[String] = Seq("data", "vector", "stream")

  def bm25(spark: SparkSession, dir: String,
      query: Seq[String] = Bm25Query, topK: Int = 20): DataFrame = {
    val k1 = 1.2; val b = 0.75
    // NOT spread (r22, paired both-orders 1.68×): the post-tokenize work is
    // a 3-term isin filter + two map-side-partial aggregates — no self-join,
    // no per-row amplification for the exchange to feed; and `docs` has two
    // consumers, so the spread's shuffle was paid twice
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), Lex.toks(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("len"))
    val toks = docs.select(col("doc_id"), col("len"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(query: _*))
    val tf = toks.groupBy("doc_id", "len", "tok").agg(count(lit(1)).as("tf"))
    val dfN = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), sum("len").as("sum_len"))
    val comp = tf.join(broadcast(dfN), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_len").cast("double") / col("n_docs"))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("comp",
        // k1+1 is written as the literal 2.2 (not computed): the Scala-time
        // sum 1.2+1.0 and the SQL parser's literal 2.2 could land on
        // different doubles. The oracle writes CAST(2.2 AS DOUBLE): a bare
        // 2.2 next to the BIGINT tf is DECIMAL in DuckDB — tf*2.2 would be
        // decimal-exact there and IEEE-rounded here, a real 1-ulp split.
        // different last-bit doubles; a shared literal cannot
        col("idf") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avgdl"))))
    // fixed-order total: one conditional max per query term, added in query
    // order (each (doc, term) appears at most once, so max = the component)
    val termCols = query.map(t =>
      coalesce(max(when(col("tok") === t, col("comp"))), lit(0.0)))
    val total = comp.groupBy("doc_id")
      .agg(termCols.reduceLeft(_ + _).as("raw"))
      .select(col("doc_id"), round(col("raw"), 4).as("bm25"))
    val top = total.orderBy(col("bm25").desc, col("doc_id")).limit(topK)
    // constant partition key: the frame is ≤ topK rows by construction, so
    // a single-task window is the intent, not an accident (and no
    // "No Partition Defined" noise in the logs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("bm25").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select("doc_id", "rank", "bm25")
  }

  def bm25Sql(query: Seq[String] = Bm25Query, topK: Int = 20): String = {
    val comps = query.map(t =>
      s"coalesce(max(CASE WHEN tok = '$t' THEN comp END), 0.0)")
      .mkString("\n      + ")
    s"""WITH d AS (
       |  SELECT doc_id, ${Lex.toksSql("text")} AS toks FROM documents),
       |docs AS (SELECT doc_id, len(toks) AS len, toks FROM d),
       |toks AS (
       |  SELECT doc_id, len, unnest(toks) AS tok FROM docs),
       |tf AS (
       |  SELECT doc_id, len, tok, count(*) AS tf FROM toks
       |  WHERE tok IN (${query.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY 1, 2, 3),
       |dfn AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |stats AS (SELECT count(*) AS n_docs, sum(len) AS sum_len FROM docs),
       |comp AS (
       |  SELECT tf.doc_id, tf.tok,
       |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
       |      * (tf.tf * CAST(2.2 AS DOUBLE))
       |      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.len / (CAST(sum_len AS DOUBLE) / n_docs)))
       |      AS comp
       |  FROM tf JOIN dfn USING (tok) CROSS JOIN stats),
       |total AS (
       |  SELECT doc_id, round($comps, 4) AS bm25
       |  FROM comp GROUP BY doc_id),
       |top AS (SELECT doc_id, bm25 FROM total ORDER BY bm25 DESC, doc_id LIMIT $topK)
       |SELECT doc_id,
       |  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank, bm25
       |FROM top""".stripMargin
  }

  /** Repetition detection (the Gopher-style quality rule): per document,
    * the fraction of all 3-gram occurrences taken by the single most
    * repeated 3-gram. Boilerplate/template text concentrates mass in one
    * shingle; rep_ratio above ~0.2 is a standard drop signal. Two
    * aggregates keyed by doc (one through (doc, shingle)) — inverted-index
    * shuffle shape, no skew (keys are doc-scoped). Documents too short for
    * any shingle keep ratio 0. */
  def repetition(spark: SparkSession, dir: String, flagAt: Double = 0.2): DataFrame = {
    // NOT spread (r22, paired 1.15×): both aggregates are doc-keyed and
    // map-side partial — nothing downstream amplifies per-row work
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Lex.shingles(Lex.toks(col("text")))).as("sh"))
    val perSh = sh.groupBy("doc_id", "sh").agg(count(lit(1)).as("n"))
    val perDoc = perSh.groupBy("doc_id")
      .agg(sum("n").as("n_sh"), max("n").as("max_sh"))
      .select(col("doc_id"),
        round(col("max_sh").cast("double") / col("n_sh"), 4).as("rep_ratio"))
    Tables.documents(spark, dir).select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("rep_ratio"), lit(0.0)).as("rep_ratio"))
      .withColumn("repetitive", col("rep_ratio") > flagAt)
  }

  def repetitionSql(flagAt: Double = 0.2): String =
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(${Lex.shinglesSql(Lex.toksSql("text"))}) AS sh
       |  FROM documents),
       |per_sh AS (SELECT doc_id, sh, count(*) AS n FROM sh GROUP BY 1, 2),
       |per_doc AS (
       |  SELECT doc_id, round(CAST(max(n) AS DOUBLE) / sum(n), 4) AS rep_ratio
       |  FROM per_sh GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(p.rep_ratio, 0.0) AS rep_ratio,
       |  coalesce(p.rep_ratio, 0.0) > $flagAt AS repetitive
       |FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id""".stripMargin

  /** Token-budget sequence packing — the concat-then-chunk step that turns
    * a curated corpus into fixed-size training sequences: within each
    * language, documents are laid out in doc_id order and cut into chunks
    * of `budget` tokens; a document's chunk_id is the chunk its first token
    * lands in, chunk_offset its position inside that chunk. One window sum
    * of integers per language partition — exact in both engines. The
    * partition key bounds window size; at corpus scale the same plan runs
    * with a finer layout key ((lang, shard) — any deterministic function of
    * doc_id works) so no single window partition exceeds an executor. */
  def packChunks(spark: SparkSession, dir: String, budget: Int = 2048): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("doc_id")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(Lex.toks(col("text"))).cast("long").as("n_tokens"))
      .withColumn("start_tok", coalesce(sum("n_tokens").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        // integer div, not double-divide-then-cast: exact at any magnitude
        expr(s"start_tok div $budget").as("chunk_id"),
        (col("start_tok") % budget).as("chunk_offset"))
  }

  def packChunksSql(budget: Int = 2048): String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, len(${Lex.toksSql("text")}) AS n_tokens
       |  FROM documents),
       |laid AS (
       |  -- CAST: DuckDB sum(BIGINT) is HUGEINT; uncast it leaks int128 into
       |  -- chunk_id/chunk_offset and the driver's hash sees float, not int
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
       |  FROM d)
       |SELECT doc_id, lang, n_tokens,
       |  start_tok // $budget AS chunk_id,
       |  start_tok % $budget AS chunk_offset
       |FROM laid""".stripMargin

  /** Deterministic stratified sampling: exactly `k` documents per language
    * (fewer when the stratum is smaller), chosen by ranking on the shared
    * content hash — a reproducible pseudorandom draw with per-class quotas,
    * the shape used to balance a training mix. One window per stratum;
    * strata partition the corpus, so the window never concentrates more
    * than a class's own rows (sub-shard the key if one class dominates). */
  def stratifiedSample(spark: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), Lex.hex8(col("text")).as("h"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("lang", "rn", "doc_id")
  }

  def stratifiedSampleSql(k: Int = 50): String =
    s"""SELECT lang, rn, doc_id FROM (
       |  SELECT lang, doc_id,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY ${Lex.hex8Sql("text")}, doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= $k""".stripMargin

  /** PII scrubbing: email and phone-number redaction with per-document
    * redaction counts — pure regexp projections, scan-bound at any scale.
    * The synthetic corpus carries no PII, so the query plants a
    * deterministic contact line derived from doc_id into the text in BOTH
    * engines before scrubbing — the operator (patterns, replacement,
    * counting) is what the oracle checks. Patterns stay in the common
    * subset of Java regex and RE2 (character classes, bounded repeats, \\b;
    * no lookaround), so both engines match identical spans. Output carries
    * the redacted text's digest, not the text — constant-width rows. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val (email, phone) = (EmailRe, PhoneRe)
    val planted = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or 555-"),
      lpad(col("doc_id") % 1000, 3, "0"), lit("-"),
      lpad(col("doc_id") % 10000, 4, "0"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), planted.as("t"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(email), lit(0))).cast("long").as("n_email"),
        size(regexp_extract_all(col("t"), lit(phone), lit(0))).cast("long").as("n_phone"),
        md5(regexp_replace(regexp_replace(col("t"), email, "<EMAIL>"),
          phone, "<PHONE>")).as("redacted_fp"))
  }

  def piiRedactSql: String = {
    val (email, phone) = (EmailRe, PhoneRe)
    s"""WITH p AS (
       |  SELECT doc_id,
       |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
       |    '@example.com or 555-' ||
       |    lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
       |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(t, '$email')) AS n_email,
       |  len(regexp_extract_all(t, '$phone')) AS n_phone,
       |  md5(regexp_replace(regexp_replace(t, '$email', '<EMAIL>', 'g'),
       |    '$phone', '<PHONE>', 'g')) AS redacted_fp
       |FROM p""".stripMargin
  }

  /** Eval-set contamination detection: what fraction of a training
    * document's distinct 3-gram shingles also appear anywhere in the
    * held-out split (doc_id ≡ 0 mod 10 stands in for the benchmark set).
    * The eval side collapses to its DISTINCT shingle vocabulary — bounded
    * by the (small) eval corpus, so it broadcasts and the train side is one
    * scan + one aggregation by doc_id; no shuffle ever carries the corpus ×
    * eval cross product. Docs with <3 tokens have no shingles and are
    * excluded (no signal to test). */
  def contamination(spark: SparkSession, dir: String, flagAt: Double = 0.5): DataFrame = {
    // Per-doc shingle dedup happens INSIDE the row (array_distinct before
    // the explode, via docShingles — which also binds the token array to an
    // attribute first; an unbound lambda re-runs the regex split per
    // element, O(tokens²) per doc): zero shuffle, versus a global
    // (doc_id, sh) DISTINCT that would reshuffle the whole exploded corpus.
    // The only wide ops left are the small eval-vocabulary distinct (10% of
    // docs) and the map-side-combinable per-doc counts.
    val sh = graft.dedup.Dedup.docShingles(spark, dir)
    val evalSh = sh.filter(col("doc_id") % 10 === 0).select("sh").distinct()
    val train = sh.filter(col("doc_id") % 10 =!= 0)
    val perDoc = train.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    // no broadcast hint: a REAL eval vocabulary is tiny and AQE broadcasts
    // it on its measured size; the hint would pin the choice even for a
    // fixture-style split where the "eval" side is corpus-proportional
    val overlap = train.join(evalSh, "sh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    perDoc.join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("overlap_ratio",
        round(col("n_overlap").cast("double") / col("n_shingles"), 4))
      .withColumn("contaminated", col("overlap_ratio") >= flagAt)
  }

  def contaminationSql(flagAt: Double = 0.5): String =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, unnest(${Lex.shinglesSql(Lex.toksSql("text"))}) AS sh
       |  FROM documents),
       |ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 10 = 0),
       |train AS (SELECT doc_id, sh FROM sh WHERE doc_id % 10 <> 0),
       |per_doc AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY doc_id),
       |ov AS (
       |  SELECT t.doc_id, count(*) AS n_overlap
       |  FROM train t JOIN ev ON t.sh = ev.sh
       |  GROUP BY t.doc_id)
       |SELECT p.doc_id, p.n_shingles,
       |  coalesce(o.n_overlap, 0) AS n_overlap,
       |  round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / p.n_shingles, 4) AS overlap_ratio,
       |  round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / p.n_shingles, 4) >= $flagAt AS contaminated
       |FROM per_doc p LEFT JOIN ov o ON p.doc_id = o.doc_id""".stripMargin

  /** Sliding-window chunking with overlap — the RAG/pre-training splitter
    * dual to [[packChunks]] (which concatenates; this one windows each
    * document independently): windows of `win` tokens advancing by `stride`
    * (< win ⇒ adjacent chunks share win−stride tokens of context). Chunk
    * count per doc is exact integer arithmetic (1 + ⌈(n−win)/stride⌉,
    * clamped at 1); the per-chunk fingerprint digests the joined token
    * slice so the oracle verifies the actual window contents, not just the
    * offsets. Pure per-row explode — scan-bound, no shuffle, fan-out
    * bounded by n/stride per document. */
  def chunkWindows(spark: SparkSession, dir: String, win: Int = 64,
      stride: Int = 48): DataFrame = {
    // overlapping-or-adjacent windows only: stride > win makes the last
    // chunk's slice length negative — Spark's slice() throws mid-job while
    // the SQL twin's list_slice tolerates it, so reject the shape up front
    require(stride > 0 && win > 0 && stride <= win,
      s"chunkWindows needs 0 < stride <= win, got win=$win stride=$stride")
    val toked = Tables.documents(spark, dir)
      .select(col("doc_id"), Lex.toks(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("n"))
      .filter(col("n") > 0)
      // ceil_div((n - win), stride) in pure integer math, clamped at 0
      .withColumn("n_chunks",
        lit(1L) + greatest(lit(0L),
          expr(s"(n - $win + $stride - 1) div $stride")))
    toked
      .select(col("doc_id"), col("toks"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * stride + 1)
      .withColumn("n_chunk_toks", least(lit(win.toLong), col("n") - col("chunk_idx") * stride))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"), col("n_chunk_toks"),
        md5(concat_ws(" ",
          slice(col("toks"), col("start_tok").cast("int"), col("n_chunk_toks").cast("int"))))
          .as("chunk_fp"))
  }

  def chunkWindowsSql(win: Int = 64, stride: Int = 48): String =
    s"""WITH d AS (
       |  SELECT doc_id, ${Lex.toksSql("text")} AS toks FROM documents),
       |n AS (
       |  SELECT doc_id, toks, len(toks) AS n,
       |    1 + greatest(0, (len(toks) - $win + $stride - 1) // $stride) AS n_chunks
       |  FROM d WHERE len(toks) > 0),
       |c AS (
       |  SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS chunk_idx FROM n)
       |SELECT doc_id, chunk_idx,
       |  chunk_idx * $stride + 1 AS start_tok,
       |  least($win, n - chunk_idx * $stride) AS n_chunk_toks,
       |  md5(array_to_string(list_slice(toks, chunk_idx * $stride + 1,
       |    chunk_idx * $stride + least($win, n - chunk_idx * $stride)), ' ')) AS chunk_fp
       |FROM c""".stripMargin

  /** PMI collocations: the top-25 adjacent-token bigrams by frequency with
    * their pointwise mutual information — the standard phrase-mining /
    * tokenizer-vocabulary signal. Counts are exact integers; the PMI ratio
    * is assembled left-associatively in double in BOTH engines (identical
    * operation order ⇒ identical bits) and rounded to 3 digits to absorb
    * any last-ulp ln() divergence between libm implementations. Ranking is
    * by integer count with a lexical tie-break, so row selection never
    * depends on floating-point order. */
  def pmiBigrams(spark: SparkSession, dir: String, minCount: Int = 20,
      topK: Int = 25): DataFrame = {
    // NOT spread (r22, paired both-orders 2.02× — the round's largest
    // text-family regression): `toked` fans into TWO grouped explodes (uni,
    // bi), so the r21 spread re-ran its exchange per consumer while the
    // aggregates were already map-side partial; anti-scaling 0.39 at 8 cores
    val toked = Tables.documents(spark, dir)
      .select(col("doc_id"), Lex.toks(col("text")).as("toks"))
    val uni = toked.select(explode(col("toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c_tok"))
    val nUni = uni.agg(sum("c_tok").as("n_uni"))
    val bi = toked
      .select(explode(when(size(col("toks")) >= 2,
        transform(sequence(lit(1), size(col("toks")) - 1), i =>
          struct(element_at(col("toks"), i).as("w1"),
                 element_at(col("toks"), i + 1).as("w2"))))
        .otherwise(array())).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_big"))
    val nBi = bi.agg(sum("c_big").as("n_bi"))
    val u1 = uni.select(col("tok").as("w1"), col("c_tok").as("c_w1"))
    val u2 = uni.select(col("tok").as("w2"), col("c_tok").as("c_w2"))
    bi.filter(col("c_big") >= minCount)
      // no broadcast hint on the unigram dictionary: the VOCABULARY grows
      // with the corpus (Heaps' law — far past any broadcast budget at
      // 100 TB), while the min-count-filtered bigram side is the bounded
      // one; AQE broadcasts whichever side measures small at runtime
      .join(u1, "w1").join(u2, "w2")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .withColumn("pmi", round(log(
        col("c_big").cast("double") * col("n_uni") * col("n_uni") /
          (col("n_bi").cast("double") * col("c_w1") * col("c_w2"))), 3))
      .orderBy(col("c_big").desc, col("w1"), col("w2"))
      .limit(topK)
      .select("w1", "w2", "c_big", "pmi")
  }

  def pmiBigramsSql(minCount: Int = 20, topK: Int = 25): String =
    s"""WITH toked AS (
       |  SELECT doc_id, ${Lex.toksSql("text")} AS toks FROM documents),
       |uni AS (
       |  SELECT tok, count(*) AS c_tok FROM (
       |    SELECT unnest(toks) AS tok FROM toked) GROUP BY tok),
       |n_uni_t AS (SELECT CAST(sum(c_tok) AS BIGINT) AS n_uni FROM uni),
       |bi AS (
       |  SELECT b[1] AS w1, b[2] AS w2, count(*) AS c_big FROM (
       |    SELECT unnest(list_transform(range(1, len(toks)),
       |      i -> [toks[i], toks[i+1]])) AS b
       |    FROM toked WHERE len(toks) >= 2)
       |  GROUP BY 1, 2),
       |n_bi_t AS (SELECT CAST(sum(c_big) AS BIGINT) AS n_bi FROM bi)
       |SELECT w1, w2, c_big,
       |  round(ln(CAST(c_big AS DOUBLE) * n_uni * n_uni /
       |    (CAST(n_bi AS DOUBLE) * u1.c_tok * u2.c_tok)), 3) AS pmi
       |FROM bi
       |JOIN uni u1 ON w1 = u1.tok
       |JOIN uni u2 ON w2 = u2.tok
       |CROSS JOIN n_uni_t CROSS JOIN n_bi_t
       |WHERE c_big >= $minCount
       |ORDER BY c_big DESC, w1, w2
       |LIMIT $topK""".stripMargin

  /** Paragraph "lines" for corpus-level dedup: non-overlapping
    * [[ParaBlock]]-token blocks with their 0-based position. The synthetic
    * corpus has no newlines, so fixed-width token blocks stand in for
    * paragraphs; a real pipeline would split on '\n' and the rest of the
    * plan is unchanged. The token array is bound to an attribute before the
    * block lambda runs (same interpreted-lambda trap as Dedup.docShingles). */
  private val ParaBlock = 4

  /** Corpus-level paragraph dedup (C4/RefinedWeb-style "remove duplicated
    * lines across documents"): a block occurrence survives iff it is the
    * globally FIRST occurrence of that block (min (doc_id, pos)); every
    * later copy anywhere in the corpus is removed. Per-doc summary: blocks,
    * kept, and the removed ratio.
    *
    * Scale shape: one explode + ONE aggregate per stage, never a self-join —
    * the first-occurrence rule is `min(struct(doc_id, pos))` per block, so a
    * boilerplate block repeated 10⁹ times is just a large min() group
    * (map-side partial min; no posting-list blowup, unlike a naive
    * block↔block join), and the per-doc rollup shuffles on uniform doc_id. */
  def paraDedup(spark: SparkSession, dir: String): DataFrame = {
    val b = ParaBlock
    // `div`, not `/` (Column./ on ints is double division); empty docs are
    // filtered BEFORE the sequence (Spark's sequence(0, -1) counts DOWN).
    // First-occurrence key packs (doc_id, pos) into one long — an integer
    // min is ordering-parity-safe across engines where a struct min's
    // comparison semantics are not. The pos slot is 2^20 (≈1M blocks =
    // 4M tokens per doc, far beyond any real document; doc_id keeps 2^43),
    // NOT a 10^3 slot sized to the test fixture: a >1000-block document
    // would alias another doc's early blocks and silently mis-elect the
    // first occurrence.
    val blocks = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), Lex.toks(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, (size(toks) + ${b - 1}) div $b - 1), " +
          s"i -> concat_ws('_', slice(toks, i * $b + 1, $b)))")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("block"))
      .withColumn("occ_key", shiftleft(col("doc_id"), 20) + col("pos"))
    val firstOcc = blocks.groupBy("block").agg(min("occ_key").as("f"))
    blocks.join(firstOcc, "block")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("occ_key") === col("f"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("removed_ratio",
        round((col("n_blocks") - col("n_kept")).cast("double") / col("n_blocks"), 4))
  }

  def paraDedupSql: String = {
    val b = ParaBlock
    s"""WITH t AS (
       |  SELECT doc_id, ${Lex.toksSql("text")} AS toks FROM documents),
       |b0 AS (
       |  SELECT doc_id, list_transform(range(0, (len(toks) + ${b - 1}) // $b),
       |    i -> array_to_string(list_slice(toks, i*$b+1, i*$b+$b), '_')) AS blocks
       |  FROM t WHERE len(toks) > 0),
       |blocks AS (
       |  SELECT doc_id, unnest(range(0, len(blocks))) AS pos,
       |    unnest(blocks) AS block FROM b0),
       |keyed AS (SELECT doc_id, block, (doc_id << 20) + pos AS occ_key FROM blocks),
       |first_occ AS (SELECT block, min(occ_key) AS f FROM keyed GROUP BY block)
       |SELECT doc_id, count(*) AS n_blocks,
       |  CAST(sum(CASE WHEN occ_key = f THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  round(CAST(count(*) - sum(CASE WHEN occ_key = f THEN 1 ELSE 0 END)
       |      AS DOUBLE) / count(*), 4) AS removed_ratio
       |FROM keyed JOIN first_occ USING (block)
       |GROUP BY doc_id""".stripMargin
  }

  /** Gopher-style composite quality gate (Rae et al. 2021 §A1.1 document
    * filters, re-parameterized to the synthetic corpus): each rule is a
    * named boolean column, the verdict their conjunction — downstream
    * curation reads WHY a document failed, not just that it did. Pure
    * per-row projection: no shuffle, scan-bound at any corpus size; every
    * expensive subexpression (the token split) is bound to an attribute
    * once. */
  def gopherRules(spark: SparkSession, dir: String): DataFrame = {
    val toks = col("toks")
    val n = col("n_toks")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), Lex.toks(col("text")).as("toks"))
      .select(col("doc_id"), toks,
        size(toks).cast("long").as("n_toks"),
        length(concat_ws("", toks)).cast("long").as("tok_chars"))
      .select(col("doc_id"), n.as("n_toks"),
        // word-count window (Gopher: 50..100k words; synthetic docs run 10..99)
        (n >= 30 && n <= 110).as("r_word_count"),
        // mean word length in [2, 8] — cross-multiplied, so the compare is
        // integer-exact in both engines (no division)
        (col("tok_chars") >= n * 2 && col("tok_chars") <= n * 8).as("r_mean_len"),
        // ≥ 2 occurrences of closed-class anchor words ("the"/"a" here;
        // Gopher requires 2 of its stop-set)
        (size(filter(toks, t => t === "the" || t === "a")) >= 2).as("r_stopwords"),
        // type/token ratio ≥ 0.45 — below that the doc is dominated by
        // repeated tokens (Gopher's duplicate-line/ngram family collapsed
        // to one array-level rule; cross-multiplied ×100 to stay integer)
        (size(array_distinct(toks)) * 100 >= n * 45).as("r_distinct_ratio"),
        // no token longer than 20 chars (Gopher: max word length)
        (size(filter(toks, t => length(t) > 20)) === 0).as("r_max_word_len"))
      .withColumn("pass",
        col("r_word_count") && col("r_mean_len") && col("r_stopwords") &&
          col("r_distinct_ratio") && col("r_max_word_len"))
  }

  def gopherRulesSql: String = {
    val toks = Lex.toksSql("text")
    s"""WITH t AS (
       |  SELECT doc_id, $toks AS toks FROM documents),
       |m AS (
       |  SELECT doc_id, toks, len(toks) AS n,
       |    length(array_to_string(toks, '')) AS tok_chars FROM t)
       |SELECT doc_id, CAST(n AS BIGINT) AS n_toks,
       |  n >= 30 AND n <= 110 AS r_word_count,
       |  tok_chars >= n * 2 AND tok_chars <= n * 8 AS r_mean_len,
       |  len(list_filter(toks, x -> x = 'the' OR x = 'a')) >= 2 AS r_stopwords,
       |  len(list_distinct(toks)) * 100 >= n * 45 AS r_distinct_ratio,
       |  len(list_filter(toks, x -> length(x) > 20)) = 0 AS r_max_word_len,
       |  (n >= 30 AND n <= 110) AND (tok_chars >= n * 2 AND tok_chars <= n * 8)
       |    AND len(list_filter(toks, x -> x = 'the' OR x = 'a')) >= 2
       |    AND len(list_distinct(toks)) * 100 >= n * 45
       |    AND len(list_filter(toks, x -> length(x) > 20)) = 0 AS pass
       |FROM m""".stripMargin
  }

  /** Unigram-LM rarity score — the CCNet-style perplexity-proxy quality
    * filter: each token's self-information −ln(df/N) under the corpus
    * unigram distribution (document frequency over total token
    * occurrences), averaged per document. Low scores = boilerplate built
    * from the corpus's most common tokens; high scores = rare-token noise;
    * the middle band is the keep zone — the verdict column buckets each
    * document accordingly (cutoffs in nats, tuned to the corpus's observed
    * information band; a production pipeline would set them from a held-out
    * quantile sweep).
    *
    * Determinism across engines: ln is evaluated once per DISTINCT TOKEN
    * on identical double inputs and rounded to 6 decimals BEFORE any
    * summation (libm log implementations agree to ≪1e-6); the per-doc
    * totals then run in DECIMAL — order-free — and the final mean is a
    * single IEEE division rounded to 4.
    *
    * Scale shape: the token-frequency dictionary is one hash aggregate
    * over the exploded token stream; scoring is a broadcast-sized (or
    * shuffle, at vocabulary scale) join of tokens→nats followed by one
    * per-doc sum. No windows, no self-joins. */
  def rarityScore(spark: SparkSession, dir: String): DataFrame = {
    // NOT spread (r22, paired 1.25×): `tok` fans into the totals agg, the
    // dict agg and the scoring join — three consumers each re-paying the
    // spread's exchange over a plain tokenize
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(Lex.toks(col("text"))).as("tok"))
    val totals = tok.agg(count(lit(1)).as("n_total"))
    val dict = tok.groupBy("tok").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(totals))
      .select(col("tok"),
        round(-log(col("df").cast("double") / col("n_total")), 6)
          .cast("decimal(18,6)").as("nats"))
    tok.join(dict, Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("nats")).as("nats_sum"))
      .select(col("doc_id"), col("n_tok"),
        round(col("nats_sum").cast("double") / col("n_tok"), 4).as("mean_nats"))
      .withColumn("verdict",
        when(col("mean_nats") < RarityLow, "boilerplate")
          .when(col("mean_nats") > RarityHigh, "noise")
          .otherwise("keep"))
  }

  val RarityLow = 3.39
  val RarityHigh = 3.45

  def rarityScoreSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(${Lex.toksSql("text")}) AS tok FROM documents),
       |tot AS (SELECT count(*) AS n_total FROM tok),
       |dict AS (
       |  SELECT tok,
       |    CAST(round(-ln(CAST(df AS DOUBLE) / n_total), 6) AS DECIMAL(18,6)) AS nats
       |  FROM (SELECT tok, count(*) AS df FROM tok GROUP BY 1), tot),
       |scored AS (
       |  SELECT doc_id, count(*) AS n_tok, sum(nats) AS nats_sum
       |  FROM tok JOIN dict USING (tok) GROUP BY 1)
       |SELECT doc_id, n_tok,
       |  round(CAST(nats_sum AS DOUBLE) / n_tok, 4) AS mean_nats,
       |  CASE WHEN round(CAST(nats_sum AS DOUBLE) / n_tok, 4) < $RarityLow THEN 'boilerplate'
       |       WHEN round(CAST(nats_sum AS DOUBLE) / n_tok, 4) > $RarityHigh THEN 'noise'
       |       ELSE 'keep' END AS verdict
       |FROM scored""".stripMargin

  /** Temperature-flattened source-sampling mix — the multinomial mix step
    * of a pretraining data pipeline: per-source token mass → share^α with
    * α = 0.5 → normalized sampling weight. Flattening up-weights small
    * high-quality sources against the web-scale head; `boost` =
    * weight/share is the implied duplication factor a sampler applies to
    * each source at one epoch of the mixture.
    *
    * Determinism across engines: per-source token sums are exact longs;
    * `share` and `sqrt(share)` are single IEEE operations on identical
    * inputs (sqrt is correctly-rounded, so bit-identical in any engine);
    * the one order-sensitive step — the normalizing SUM of weights — runs
    * in DECIMAL(18,9) after rounding each weight to 9 digits, so it is
    * order-free; the final divisions are again single IEEE ops.
    *
    * Scale shape: one scan of documents with map-side partial sums into a
    * ~sources-sized aggregate; the two normalizing totals are one-row
    * broadcasts. Cost is the token count itself — everything after the
    * first groupBy is constant-size. */
  def sourceMix(spark: SparkSession, dir: String): DataFrame = {
    val bySrc = Tables.documents(spark, dir)
      .select(col("source"), size(Lex.toks(col("text"))).cast("long").as("n_tok"))
      .groupBy("source").agg(sum(col("n_tok")).as("toks"))
    val tot = bySrc.agg(sum(col("toks")).as("tot_toks"))
    val w = bySrc.crossJoin(broadcast(tot))
      .withColumn("share", col("toks").cast("double") / col("tot_toks"))
      .withColumn("w_raw", round(sqrt(col("share")), 9).cast("decimal(18,9)"))
    val wsum = w.agg(sum(col("w_raw")).as("wsum"))
    w.crossJoin(broadcast(wsum))
      .withColumn("weight",
        round(col("w_raw").cast("double") / col("wsum").cast("double"), 6))
      .select(col("source"), col("toks"),
        round(col("share"), 6).as("share"),
        col("weight"),
        round(col("weight") / col("share"), 4).as("boost"))
  }

  def sourceMixSql: String =
    s"""WITH by_src AS (
       |  -- CAST: DuckDB widens sum(BIGINT) to HUGEINT, which pandas
       |  -- surfaces as float64 and the driver's hash then splits on dtype
       |  SELECT source, CAST(sum(len(${Lex.toksSql("text")})) AS BIGINT) AS toks
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT sum(toks) AS tot_toks FROM by_src),
       |w AS (
       |  SELECT source, toks,
       |    CAST(toks AS DOUBLE) / tot_toks AS share,
       |    CAST(round(sqrt(CAST(toks AS DOUBLE) / tot_toks), 9)
       |      AS DECIMAL(18,9)) AS w_raw
       |  FROM by_src, tot),
       |ws AS (SELECT sum(w_raw) AS wsum FROM w),
       |wt AS (
       |  SELECT source, toks, share,
       |    round(CAST(w_raw AS DOUBLE) / CAST(wsum AS DOUBLE), 6) AS weight
       |  FROM w, ws)
       |SELECT source, toks, round(share, 6) AS share, weight,
       |  round(weight / share, 4) AS boost
       |FROM wt""".stripMargin
}
