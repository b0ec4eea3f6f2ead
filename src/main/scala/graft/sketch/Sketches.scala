package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.text.Lex

/** Distributed sketches with EXACT cross-engine parity — the trick is to
  * keep every intermediate an integer (register indexes, leading-zero
  * ranks) and every float a sum of exact powers of two, so shuffle order
  * cannot perturb a single bit and the DuckDB oracle hash-matches a
  * probabilistic data structure.
  *
  * HyperLogLog (Flajolet et al. 2007): m = 64 registers; each value's
  * 32-bit hash splits into a 6-bit register index and a 26-bit suffix
  * whose leading-zero rank the register max-folds. The estimate
  * α·m²/Σ 2^(−rank_j) is deterministic because each 2^(−rank) has a
  * one-bit mantissa and the 64-term sum spans < 53 bits of exponent —
  * every partial sum is exact in double, in ANY accumulation order.
  * One shuffle on (group, register) + one on group; register count is
  * constant, so sketch state is O(groups × 64) regardless of corpus size —
  * the whole point of sketching 100 TB.
  */
object Sketches {

  val M = 64 // registers; 6-bit index, relative error ≈ 1.04/√64 ≈ 13%
  val Alpha64 = 0.709 // α_m for m = 64 (Flajolet's constant, shared literal)

  /** The HLL rank column over the 26-bit suffix v = h div M, and the
    * present-register aggregate -> corrected estimate — ONE definition
    * each for the sketch AND its merge (a formula drift would split them
    * silently, detected only as an oracle hash mismatch; the SQL twins
    * share [[hllRankSql]]/[[hllEstCteSql]] the same way). */
  private def hllRank: Column = {
    val v = expr(s"h div $M")
    when(v === 0, lit(27L))
      .otherwise(lit(27L) - length(conv(v.cast("string"), 10, 2)))
  }

  /** small-range correction (Flajolet §4): below 2.5m with empty
    * registers, linear counting m·ln(m/V) is the accurate regime — the
    * raw estimator overshoots badly when registers are sparse. V and m
    * are integers, so ln sees the identical double in both engines. */
  private def hllEstimated(agg: DataFrame, out: String): DataFrame =
    agg.withColumn("raw_est",
        lit(Alpha64) * M * M / (col("present_sum") + (lit(M) - col("n_present"))))
      .withColumn(out,
        when(col("raw_est") <= 2.5 * M && col("n_present") < M,
          round(lit(M.toDouble) * log(lit(M.toDouble) / (lit(M) - col("n_present"))), 2))
          .otherwise(round(col("raw_est"), 2)))

  private def hllRankSql: String =
    s"max(CASE WHEN h // $M = 0 THEN 27\n             ELSE 27 - length(bin(h // $M)) END) AS r"

  private def hllEstCteSql(sel: String, out: String): String =
    s"""SELECT $sel
       |    CASE WHEN raw_est <= 2.5 * $M AND n_present < $M
       |         THEN round($M.0 * ln($M.0 / ($M - n_present)), 2)
       |         ELSE round(raw_est, 2) END AS $out
       |  FROM (
       |    SELECT ${sel}n_present,
       |      $Alpha64 * $M * $M / (present_sum + ($M - n_present)) AS raw_est
       |    FROM agg)""".stripMargin

  /** Per-language distinct-token cardinality: exact count vs the HLL
    * estimate and its signed relative error. */
  def hllTokens(spark: SparkSession, dir: String): DataFrame =
    // NOT spread (r22, paired 1.15×): register/exact aggregates are
    // map-side partial; no downstream amplification to feed
    hllFromTokens(Tables.documents(spark, dir)
      .select(col("lang"), explode(array_distinct(Lex.toks(col("text")))).as("tok")))

  /** HLL core over any (lang, tok) frame — split out so specs can drive a
    * high-cardinality stratum through the RAW-estimator branch (the tiny
    * per-language strata of the test corpus all land in linear counting). */
  def hllFromTokens(langTok: DataFrame): DataFrame = {
    val tok = langTok
      .select(col("lang"), col("tok"), Lex.hex8(col("tok")).as("h"))
    // register = low 6 bits; rank = leading-zeros-within-26-bit-suffix + 1
    // = 27 − bitlen(v) for v > 0 (bitlen = binary digit count, integer-exact
    // in both engines: Spark conv(v,10,2) / DuckDB bin(v) string length);
    // v = 0 → rank 27 (all 26 suffix bits zero). A stray +1 here inflates
    // every nonzero rank, halving Σ2^-rank and biasing the raw estimate ~2×.
    val reg = tok
      .withColumn("register", col("h") % M)
      .withColumn("rank", hllRank)
      .groupBy("lang", "register").agg(max("rank").as("r"))
    // Σ 2^-rank over present registers + 1.0 per empty register (rank 0).
    // 2^-r is written CAST(1 AS DOUBLE)/(1<<r): each term is an exactly
    // representable power of two, and every partial sum of ≤ M terms with
    // r ≤ 27 needs ≤ 33 mantissa bits — exact in DOUBLE in ANY addition
    // order, in both engines. (A bare `1.0` literal parses as DECIMAL and
    // rounds ranks ≥ 23 at the decimal scale cap — engine-dependent.)
    val agg = hllEstimated(reg.groupBy("lang")
      .agg(sum(expr("cast(1 as double) / shiftleft(cast(1 as bigint), cast(r as int))"))
        .as("present_sum"),
        count(lit(1)).as("n_present")), "hll_estimate")
    val exact = tok.groupBy("lang").agg(countDistinct("tok").as("n_exact"))
    exact.join(agg.select("lang", "hll_estimate"), "lang")
      .withColumn("rel_err",
        round((col("hll_estimate") - col("n_exact")) / col("n_exact"), 4))
  }

  /** Count-min sketch parameters: d independent hash rows (reusing the
    * MinHash permutation family) × w buckets. Point estimate = min over
    * rows of the bucket count — always ≥ the true count, within εN with
    * ε = e/w at the usual guarantees. */
  val CmRows = 4
  val CmWidth = 1024

  /** Heavy hitters via count-min: the exact top-k tokens by occurrence,
    * each with its sketch estimate. Sketch state is d×w = 4096 counters
    * TOTAL (one narrow aggregate over (row, bucket)), so the frequency
    * table of a 100 TB corpus fits in a broadcast; the estimate join
    * touches only the k candidate tokens. Counters are integers — parity
    * with the oracle is exact by construction. */
  def cmTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    // materialized once: the bucketed counts and the exact top-k would
    // otherwise each re-run the tokenize+md5 scan (the dominant cost —
    // the kmvDistinct rationale)
    // NOT spread (r22, paired 1.14×; driver PERF_r21 0.65×): the checkpoint
    // below pins the spread's cores-wide layout into every downstream pass,
    // multiplying small-task overhead past the tokenize CPU it spreads
    val tok = Tables.documents(spark, dir)
      .select(explode(Lex.toks(col("text"))).as("tok"))
      .select(col("tok"), Lex.hex8(col("tok")).as("h"))
      .localCheckpoint(true)
    val bucketed = tok.select(col("tok"),
      explode(array((0 until CmRows).map(r =>
        struct(lit(r).as("r"), (Lex.minhashPerm(r, col("h")) % CmWidth).as("bucket"))): _*))
        .as("rb"))
      .select(col("tok"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    val counts = bucketed.groupBy("r", "bucket").agg(count(lit(1)).as("n_bucket"))
    // global top-k = distributed TakeOrdered; the rank window runs on the
    // k survivors only (same pattern as the BM25 top-k)
    // constant partition key: frame is ≤ k rows post-limit — single-task
    // window is intended, and the constant spec keeps logs warning-free
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("n_exact").desc, col("tok"))
    val top = tok.groupBy("tok").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok")).limit(k)
      .withColumn("rank", row_number().over(wTop).cast("long"))
    val candBuckets = top.select(col("tok"), col("rank"), col("n_exact"),
      explode(array((0 until CmRows).map(r =>
        struct(lit(r).as("r"),
          (Lex.minhashPerm(r, Lex.hex8(col("tok"))) % CmWidth).as("bucket"))): _*)).as("rb"))
      .select(col("tok"), col("rank"), col("n_exact"),
        col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    candBuckets.join(counts, Seq("r", "bucket"))
      .groupBy("tok", "rank", "n_exact")
      .agg(min("n_bucket").as("cm_estimate"))
  }

  def cmTopKSql(k: Int = 10): String = {
    val h = Lex.hex8Sql("tok")
    val rowSelects = (0 until CmRows).map(r =>
      s"SELECT tok, $r AS r, (${Lex.minhashPermSql(r, "h")}) % $CmWidth AS bucket FROM tok")
      .mkString("\n  UNION ALL ")
    s"""WITH tok AS (
       |  SELECT tok, $h AS h FROM (
       |    SELECT unnest(${Lex.toksSql("text")}) AS tok FROM documents)),
       |bucketed AS (
       |  $rowSelects),
       |counts AS (SELECT r, bucket, count(*) AS n_bucket FROM bucketed GROUP BY 1, 2),
       |top AS (
       |  SELECT tok, n_exact, rank FROM (
       |    SELECT tok, count(*) AS n_exact,
       |      row_number() OVER (ORDER BY count(*) DESC, tok) AS rank
       |    FROM tok GROUP BY tok)
       |  WHERE rank <= $k),
       |cand AS (
       |  SELECT t.tok, t.rank, t.n_exact, b.r, b.bucket
       |  FROM top t JOIN bucketed b USING (tok))
       |SELECT tok, rank, n_exact, min(n_bucket) AS cm_estimate
       |FROM (SELECT DISTINCT tok, rank, n_exact, r, bucket FROM cand) c
       |JOIN counts USING (r, bucket)
       |GROUP BY 1, 2, 3""".stripMargin
  }

  /** Bloom filter parameters: m bits in 32-bit words (bit 63 shifts
    * overflow DuckDB's checked `<<`, so words stay below the sign bit in
    * both engines), k hash probes from the MinHash permutation family.
    * m is sized for ~1% fp at the oracle-scale member count; production
    * sizes m to the expected cardinality the same way. */
  val BloomBits = 16384
  val BloomWords = BloomBits / 32
  val BloomHashes = 3

  private def bloomPos(j: Int, h: org.apache.spark.sql.Column) =
    Lex.minhashPerm(j, h) % BloomBits

  /** Bloom-filter semi-join — THE shuffle-elimination primitive for 100 TB
    * joins: build a ~[[BloomBits]]-bit filter over the small side's keys
    * (one bit_or aggregate → [[BloomWords]] rows, broadcastable at any key
    * count with m sized to the expected cardinality), probe the big side
    * with k bit tests, and only survivors shuffle to the real join. The
    * query builds the filter over the customer keys that actually placed
    * orders and probes EVERY customer: true members all pass (no false
    * negatives — asserted by the oracle's exact n_members), non-members
    * pass only as false positives. Every quantity is an integer, so the
    * probabilistic structure hash-matches the SQL oracle exactly. */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.table(spark, dir, "orders")
      .select(col("o_custkey").as("key")).distinct()
    val oh = orders.withColumn("h", Lex.hex8(col("key").cast("string")))
    val setBits = oh.select(col("key"),
        explode(array((0 until BloomHashes).map(j =>
          bloomPos(j, col("h"))): _*)).as("pos"))
      .select(expr(s"pos div 32").as("word"),
        expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))").as("mask"))
    val words = setBits.groupBy("word").agg(bit_or(col("mask")).as("bits"))
    // probe set = every customer (true members at this SF) plus an offset
    // copy guaranteed OUTSIDE the member domain — the measurable
    // false-positive population
    val custKeys = Tables.table(spark, dir, "customer")
      .select(col("c_custkey").as("key"))
    val probes = custKeys
      .unionByName(custKeys.select((col("key") + 10000000L).as("key")))
      .withColumn("h", Lex.hex8(col("key").cast("string")))
      .select(col("key"), explode(array((0 until BloomHashes).map(j =>
        bloomPos(j, col("h"))): _*)).as("pos"))
      .select(col("key"), expr(s"pos div 32").as("word"),
        expr("shiftleft(cast(1 as bigint), cast(pos % 32 as int))").as("mask"))
    val accepted = probes.join(broadcast(words), "word")
      .groupBy("key")
      .agg(sum(when(col("bits").bitwiseAND(col("mask")) =!= 0, 1).otherwise(0)).as("hits"))
      .filter(col("hits") === BloomHashes)
    // `orders` IS the distinct member-key set already — re-distincting it
    // would re-run the orders scan and a second aggregate for nothing
    accepted.select(count(lit(1)).as("n_accepted"))
      .crossJoin(orders.select(count(lit(1)).as("n_members")))
      .crossJoin(custKeys.select((count(lit(1)) * 2).as("n_probed")))
      .select(col("n_probed"), col("n_members"), col("n_accepted"),
        (col("n_accepted") - col("n_members")).as("n_false_positives"))
  }

  def bloomSemiJoinSql: String = {
    def posSql(j: Int) = s"(${Lex.minhashPermSql(j, "h")}) % $BloomBits"
    val buildPos = (0 until BloomHashes).map(j =>
      s"SELECT ${posSql(j)} AS pos FROM okeys").mkString("\n  UNION ALL ")
    val probePos = (0 until BloomHashes).map(j =>
      s"SELECT key, ${posSql(j)} AS pos FROM ckeys").mkString("\n  UNION ALL ")
    s"""WITH okeys AS (
       |  SELECT key, ${Lex.hex8Sql("CAST(key AS VARCHAR)")} AS h FROM (
       |    SELECT DISTINCT o_custkey AS key FROM orders)),
       |ckeys AS (
       |  SELECT key, ${Lex.hex8Sql("CAST(key AS VARCHAR)")} AS h FROM (
       |    SELECT c_custkey AS key FROM customer
       |    UNION ALL SELECT c_custkey + 10000000 FROM customer)),
       |words AS (
       |  SELECT pos // 32 AS word, bit_or(1::BIGINT << (pos % 32)) AS bits
       |  FROM ($buildPos) GROUP BY 1),
       |probes AS (
       |  SELECT key, pos // 32 AS word, 1::BIGINT << (pos % 32) AS mask
       |  FROM ($probePos)),
       |accepted AS (
       |  SELECT key FROM probes p JOIN words w USING (word)
       |  GROUP BY key
       |  HAVING sum(CASE WHEN (w.bits & p.mask) <> 0 THEN 1 ELSE 0 END) = $BloomHashes)
       |SELECT
       |  (SELECT count(*) * 2 FROM customer) AS n_probed,
       |  (SELECT count(*) FROM okeys) AS n_members,
       |  (SELECT count(*) FROM accepted) AS n_accepted,
       |  (SELECT count(*) FROM accepted) -
       |    (SELECT count(*) FROM okeys) AS n_false_positives""".stripMargin
  }

  def hllTokensSql: String =
    s"""WITH tok AS (
       |  SELECT lang, tok, ${Lex.hex8Sql("tok")} AS h FROM (
       |    SELECT lang, unnest(list_distinct(${Lex.toksSql("text")})) AS tok
       |    FROM documents)),
       |reg AS (
       |  SELECT lang, h % $M AS register,
       |    $hllRankSql
       |  FROM tok GROUP BY 1, 2),
       |agg AS (
       |  SELECT lang, sum(CAST(1 AS DOUBLE) / (1::BIGINT << r)) AS present_sum,
       |    count(*) AS n_present
       |  FROM reg GROUP BY 1),
       |est AS (
       |  ${hllEstCteSql("lang,", "hll_estimate")}),
       |exact AS (SELECT lang, count(DISTINCT tok) AS n_exact FROM tok GROUP BY 1)
       |SELECT lang, n_exact, hll_estimate,
       |  round((hll_estimate - n_exact) / n_exact, 4) AS rel_err
       |FROM exact JOIN est USING (lang)""".stripMargin

  /** HLL MERGE — the property that makes sketches the 100 TB answer to
    * distinct counting: one sketch per shard (here: per source, the
    * ingest-partition stand-in), union = register-wise max, estimate from
    * the merged registers. At scale each shard's 64-register sketch is
    * computed where its data lives and only 64 (register, rank) integers
    * per shard ever travel — the union never reshuffles raw values. The
    * merged estimate is BY CONSTRUCTION bit-identical to a single sketch
    * built over the whole corpus (max over shard-maxes = global max per
    * register; SketchesSpec pins it); the oracle recomputes the same merge
    * in SQL. */
  def hllMerge(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .select(col("source"), explode(array_distinct(Lex.toks(col("text")))).as("tok"))
      .select(col("source"), col("tok"), Lex.hex8(col("tok")).as("h"))
    val shardRegs = tok
      .withColumn("register", col("h") % M)
      .withColumn("rank", hllRank)
      .groupBy("source", "register").agg(max("rank").as("r"))
    val nShards = shardRegs.select(countDistinct("source").as("n_shards"))
    val merged = shardRegs.groupBy("register").agg(max("r").as("r"))
    val est = hllEstimated(merged
      .agg(sum(expr("cast(1 as double) / shiftleft(cast(1 as bigint), cast(r as int))"))
        .as("present_sum"), count(lit(1)).as("n_present")), "hll_merged")
    val exact = tok.agg(countDistinct("tok").as("n_exact"))
    nShards.crossJoin(exact).crossJoin(est.select("hll_merged"))
      .withColumn("rel_err",
        round((col("hll_merged") - col("n_exact")) / col("n_exact"), 4))
  }

  /** Fixed-width-histogram quantile sketch over `events.value`: width
    * [[HistW]] buckets counted per shard (user_id % 16, the
    * ingest-partition stand-in), merged by plain SUM — the simplest
    * mergeable quantile sketch, and the reason it scales: per-shard state
    * is a few hundred (bucket, count) pairs regardless of row count, the
    * merge is associative, and the estimate reads the cumulative counts of
    * the merged histogram (≤ range/width rows — the unpartitioned window
    * is over that bounded sketch, never the data). The estimate is the
    * covering bucket's upper edge, so est − exact ∈ (0, width] by
    * construction.
    *
    * The exact-rank witness is ALSO sketch-guided, not a global sort: rank
    * k's covering bucket is read off the merged histogram, and only rows
    * inside that one bucket are ranked (rank within bucket = k − cumulative
    * count below the bucket). The window is partitioned per quantile and
    * scans bucket-occupancy rows, so the witness costs one semi-join plus a
    * bounded local sort instead of funnelling the whole table through a
    * single unpartitioned WindowExec task. */
  val HistW = 0.5
  val HistQs: Seq[Double] = Seq(0.5, 0.9, 0.99)

  def histQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, dir)
      .select(col("value"), (col("user_id") % 16).as("shard"),
        floor(col("value") / HistW).cast("long").as("bucket"))
    val shardHist = ev.groupBy("shard", "bucket").agg(count(lit(1)).as("n"))
    val merged = shardHist.groupBy("bucket").agg(sum("n").as("n"))
    val total = merged.agg(sum("n").as("total"))
    // merged histogram is ≤ range/width rows — constant-key single-task
    // window by design (not the events table; see bucket-local rank below)
    val cum = merged.withColumn("cum",
      sum("n").over(Window.partitionBy(lit(0)).orderBy("bucket")))
    val qs = HistQs.map(q => lit(q))
    val tgt = spark.range(0, 1, 1, 1) // 1 partition, not 32 empties
      .select(explode(array(qs: _*)).as("q"))
      .crossJoin(broadcast(total))
      .select(col("q"), ceil(col("q") * col("total")).as("k"))
    val est = tgt.join(broadcast(cum), col("cum") >= col("k"))
      .groupBy("q", "k").agg(min("bucket").as("bkt"))
    // Exact witness, bucket-locally: `below` = rows strictly before rank
    // k's bucket, so within that bucket the target is local rank k − below.
    // The join broadcasts 3 target rows; the window partitions by q and
    // only ever sees one bucket's occupancy per partition.
    val tgtBelow = est.join(broadcast(cum.select(col("bucket"), col("n"), col("cum"))),
        col("bkt") === col("bucket"))
      .select(col("q"), col("k"), col("bkt"), (col("cum") - col("n")).as("below"))
    val inBucket = ev.join(broadcast(tgtBelow), col("bucket") === col("bkt"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("q").orderBy("value")).cast("long"))
      .filter(col("rn") === col("k") - col("below"))
    inBucket.select(col("q"),
      ((col("bkt") + 1) * HistW).as("hist_est"),
      col("value").as("exact_val"),
      round((col("bkt") + 1) * HistW - col("value"), 4).as("err"))
  }

  def histQuantilesSql: String = {
    val qlist = HistQs.mkString("[", ", ", "]")
    s"""WITH ev AS (
       |  SELECT value, CAST(floor(value / $HistW) AS BIGINT) AS bucket,
       |    user_id % 16 AS shard FROM events),
       |sh AS (SELECT shard, bucket, count(*) AS n FROM ev GROUP BY 1, 2),
       |merged AS (SELECT bucket, sum(n) AS n FROM sh GROUP BY 1),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM merged),
       |cum AS (
       |  SELECT bucket, n, sum(n) OVER (ORDER BY bucket) AS cum FROM merged),
       |tgt AS (
       |  SELECT q, CAST(ceil(q * total) AS BIGINT) AS k
       |  FROM (SELECT unnest($qlist) AS q) CROSS JOIN tot),
       |est AS (
       |  SELECT q, k, min(bucket) AS bkt FROM tgt JOIN cum ON cum >= k
       |  GROUP BY q, k),
       |tgt_below AS (
       |  SELECT q, k, bkt, cum - n AS below
       |  FROM est JOIN cum ON bkt = cum.bucket),
       |in_bucket AS (
       |  SELECT q, k, bkt, below, value,
       |    row_number() OVER (PARTITION BY q ORDER BY value) AS rn
       |  FROM ev JOIN tgt_below ON ev.bucket = tgt_below.bkt)
       |SELECT q, (bkt + 1) * $HistW AS hist_est, value AS exact_val,
       |  round((bkt + 1) * $HistW - value, 4) AS err
       |FROM in_bucket WHERE rn = k - below""".stripMargin
  }

  def hllMergeSql: String =
    s"""WITH tok AS (
       |  SELECT source, tok, ${Lex.hex8Sql("tok")} AS h FROM (
       |    SELECT source, unnest(list_distinct(${Lex.toksSql("text")})) AS tok
       |    FROM documents)),
       |shard_regs AS (
       |  SELECT source, h % $M AS register,
       |    $hllRankSql
       |  FROM tok GROUP BY 1, 2),
       |merged AS (
       |  SELECT register, max(r) AS r FROM shard_regs GROUP BY 1),
       |agg AS (
       |  SELECT sum(CAST(1 AS DOUBLE) / (1::BIGINT << r)) AS present_sum, count(*) AS n_present
       |  FROM merged),
       |est AS (
       |  ${hllEstCteSql("", "hll_merged")})
       |SELECT
       |  (SELECT count(DISTINCT source) FROM tok) AS n_shards,
       |  (SELECT count(DISTINCT tok) FROM tok) AS n_exact,
       |  hll_merged,
       |  round((hll_merged - (SELECT count(DISTINCT tok) FROM tok)) /
       |    (SELECT count(DISTINCT tok) FROM tok), 4) AS rel_err
       |FROM est""".stripMargin

  /** KMV (k-minimum-values / bottom-k theta) distinct sketch over tokens,
    * per language plus a merged all-corpus row (Bar-Yossef et al. 2002;
    * the reference counts distinct keys only exactly — this is the
    * 100 TB-sized replacement). Estimate = (k−1)·2³²/h_k from the k
    * smallest distinct 32-bit token hashes; strata with < k distinct
    * hashes report the exact count (the sketch IS the set there).
    *
    * Scale shape: k-mins are computed per (lang, shard) — 32 hash shards,
    * so no window partition ever exceeds one shard's distinct tokens —
    * then merged by taking the k smallest of the ≤ 32·k shard survivors;
    * the '*all*' row merges the per-lang k-sets the same way, which by the
    * KMV union property equals the sketch computed directly on the union.
    * Sketch state: k integers per stratum, trivially broadcastable.
    * Every value is an integer until the single final division — exact
    * cross-engine parity by construction. */
  val KmvK = 128

  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = KmvK
    // shingles, not tokens: the 3-gram space is the high-cardinality domain
    // (the token vocabulary of the test corpus is tiny, which would leave
    // the estimator branch of the sketch untested) — and distinct
    // n-grams per stratum is also the quantity a curation pipeline actually
    // tracks (vocabulary growth, contamination overlap denominators)
    // three consumers (shard mins, per-lang exact witness, global exact
    // witness) — materialize the shingle scan once instead of tokenizing
    // the corpus three times. At production scale the exact witness branch
    // disappears (it exists as the oracle diagnostic) and with it this
    // checkpoint; the sketch path alone reads the scan once.
    val hs = Tables.spread(Tables.documents(spark, dir), col("doc_id"))
      .select(col("lang"), Lex.toks(col("text")).as("toks"))
      .select(col("lang"), explode(array_distinct(Lex.shingles(col("toks")))).as("sh"))
      .select(col("lang"), Lex.hex8(col("sh")).as("h"))
      .distinct()
      .localCheckpoint(true)
    // phase 1: k smallest per (lang, hash-shard) — bounded window partitions
    val wShard = Window.partitionBy("lang", "shard").orderBy("h")
    val shardMins = hs.withColumn("shard", col("h") % 32)
      .withColumn("rn", row_number().over(wShard)).filter(col("rn") <= k)
      .select("lang", "h")
    // phase 2: merge shards → per-lang k-set (≤ 32k input rows per lang)
    val wLang = Window.partitionBy("lang").orderBy("h")
    val kset = shardMins.withColumn("rn", row_number().over(wLang))
      .filter(col("rn") <= k)
    // '*all*' = k smallest of the union of per-lang k-sets (KMV union)
    val wAll = Window.partitionBy(lit(0)).orderBy("h")
    val allSet = kset.select(col("h")).distinct()
      .withColumn("rn", row_number().over(wAll)).filter(col("rn") <= k)
      .withColumn("lang", lit("*all*"))
    val sets = kset.select("lang", "h", "rn").unionByName(allSet.select("lang", "h", "rn"))
    val sk = sets.groupBy("lang").agg(
      max("rn").as("m"),
      max(when(col("rn") === k, col("h"))).as("hk"))
    val exact = hs.groupBy("lang").agg(countDistinct("h").as("n_exact"))
      .unionByName(hs.select("h").distinct()
        .agg(countDistinct("h").as("n_exact")).withColumn("lang", lit("*all*")))
    exact.join(sk, "lang")
      .withColumn("kmv_est",
        when(col("m") < k, col("m").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * 4294967296.0 / col("hk"), 2)))
      .withColumn("rel_err",
        round((col("kmv_est") - col("n_exact")) / col("n_exact"), 4))
      .select("lang", "n_exact", "kmv_est", "rel_err")
  }

  def kmvDistinctSql: String = {
    val k = KmvK
    s"""WITH hs AS (
       |  SELECT DISTINCT lang, ${Lex.hex8Sql("sh")} AS h FROM (
       |    SELECT lang, unnest(list_distinct(${Lex.shinglesSql("toks")})) AS sh
       |    FROM (SELECT lang, ${Lex.toksSql("text")} AS toks FROM documents))),
       |kset AS (
       |  SELECT lang, h, rn FROM (
       |    SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
       |    FROM hs) WHERE rn <= $k),
       |allset AS (
       |  SELECT '*all*' AS lang, h, rn FROM (
       |    SELECT h, row_number() OVER (ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT h FROM kset)) WHERE rn <= $k),
       |sets AS (SELECT * FROM kset UNION ALL SELECT * FROM allset),
       |sk AS (
       |  SELECT lang, max(rn) AS m,
       |         max(CASE WHEN rn = $k THEN h END) AS hk
       |  FROM sets GROUP BY 1),
       |exact AS (
       |  SELECT lang, count(DISTINCT h) AS n_exact FROM hs GROUP BY 1
       |  UNION ALL
       |  SELECT '*all*', count(DISTINCT h) FROM hs),
       |est AS (
       |  SELECT exact.lang, CAST(n_exact AS BIGINT) AS n_exact,
       |    CASE WHEN m < $k THEN CAST(m AS DOUBLE)
       |         ELSE round(${(k - 1).toDouble} * 4294967296.0 / hk, 2) END AS kmv_est
       |  FROM exact JOIN sk ON exact.lang = sk.lang)
       |SELECT lang, n_exact, kmv_est,
       |  round((kmv_est - n_exact) / n_exact, 4) AS rel_err
       |FROM est""".stripMargin
  }
}
