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

  private val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

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
       |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe,
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
    val sh = Tables.documents(spark, dir)
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

  /** Multimodal column plumbing: the text payload stands in for an opaque
    * binary blob (image/audio); metadata extraction and a deterministic
    * fake "decode" run over the bytes. The real decode stub lives in
    * [[graft.multimodal.Multimodal]]; this query proves the schema and the
    * byte-level plumbing against the oracle. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val bin = encode(col("text"), "UTF-8")
    Tables.documents(spark, dir).select(
      col("doc_id"),
      octet_length(bin).cast("long").as("n_bytes"),
      (octet_length(bin).cast("long") % 640).as("fake_width"),
      ((octet_length(bin).cast("long") * 7) % 480).as("fake_height"),
      (Lex.hex8(col("text")) % 256).as("fake_brightness"))
  }

  def multimodalMetaSql: String =
    s"""SELECT doc_id,
       |  octet_length(encode(text)) AS n_bytes,
       |  octet_length(encode(text)) % 640 AS fake_width,
       |  (octet_length(encode(text)) * 7) % 480 AS fake_height,
       |  ${Lex.hex8Sql("text")} % 256 AS fake_brightness
       |FROM documents""".stripMargin
}
