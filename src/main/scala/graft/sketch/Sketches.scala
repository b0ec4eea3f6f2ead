package graft.sketch

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Per-language distinct-token cardinality: exact count vs the HLL
    * estimate and its signed relative error. */
  def hllTokens(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("lang"), explode(array_distinct(Lex.toks(col("text")))).as("tok"))
      .select(col("lang"), col("tok"), Lex.hex8(col("tok")).as("h"))
    // register = low 6 bits; rank = leading-zeros-within-26-bit-suffix + 1,
    // computed as 27 − msb(v) with msb = binary digit count (integer-exact
    // in both engines: Spark conv(v,10,2) / DuckDB bin(v) string length)
    val v = expr(s"h div $M")
    val reg = tok
      .withColumn("register", col("h") % M)
      .withColumn("rank",
        when(v === 0, lit(27L))
          .otherwise(lit(27L) - length(conv(v.cast("string"), 10, 2)) + 1L))
      .groupBy("lang", "register").agg(max("rank").as("r"))
    // Σ 2^-rank over present registers + 1.0 per empty register (rank 0).
    // 2^-r is written 1.0/(1<<r): integer shift + exact division — no libm
    // pow in either engine, so not even a 1-ulp divergence is possible
    val agg = reg.groupBy("lang")
      .agg(sum(expr("1.0 / shiftleft(cast(1 as bigint), cast(r as int))"))
        .as("present_sum"),
        count(lit(1)).as("n_present"))
      .withColumn("denom", col("present_sum") + (lit(M) - col("n_present")))
      .withColumn("raw_est", lit(Alpha64) * M * M / col("denom"))
      // small-range correction (Flajolet §4): below 2.5m with empty
      // registers, linear counting m·ln(m/V) is the accurate regime — the
      // raw estimator overshoots badly when registers are sparse. V and m
      // are integers, so ln sees the identical double in both engines.
      .withColumn("hll_estimate",
        when(col("raw_est") <= 2.5 * M && col("n_present") < M,
          round(lit(M.toDouble) * log(lit(M.toDouble) / (lit(M) - col("n_present"))), 2))
          .otherwise(round(col("raw_est"), 2)))
    val exact = tok.groupBy("lang").agg(countDistinct("tok").as("n_exact"))
    exact.join(agg.select("lang", "hll_estimate"), "lang")
      .withColumn("rel_err",
        round((col("hll_estimate") - col("n_exact")) / col("n_exact"), 4))
  }

  def hllTokensSql: String =
    s"""WITH tok AS (
       |  SELECT lang, tok, ${Lex.hex8Sql("tok")} AS h FROM (
       |    SELECT lang, unnest(list_distinct(${Lex.toksSql("text")})) AS tok
       |    FROM documents)),
       |reg AS (
       |  SELECT lang, h % $M AS register,
       |    max(CASE WHEN h // $M = 0 THEN 27
       |             ELSE 27 - length(bin(h // $M)) + 1 END) AS r
       |  FROM tok GROUP BY 1, 2),
       |agg AS (
       |  SELECT lang, sum(1.0 / (1::BIGINT << r)) AS present_sum,
       |    count(*) AS n_present
       |  FROM reg GROUP BY 1),
       |est AS (
       |  SELECT lang,
       |    CASE WHEN raw_est <= 2.5 * $M AND n_present < $M
       |         THEN round($M.0 * ln($M.0 / ($M - n_present)), 2)
       |         ELSE round(raw_est, 2) END AS hll_estimate
       |  FROM (
       |    SELECT lang, n_present,
       |      $Alpha64 * $M * $M / (present_sum + ($M - n_present)) AS raw_est
       |    FROM agg)),
       |exact AS (SELECT lang, count(DISTINCT tok) AS n_exact FROM tok GROUP BY 1)
       |SELECT lang, n_exact, hll_estimate,
       |  round((hll_estimate - n_exact) / n_exact, 4) AS rel_err
       |FROM exact JOIN est USING (lang)""".stripMargin
}
