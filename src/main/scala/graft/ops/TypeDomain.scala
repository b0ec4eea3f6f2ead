package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.text.Lex

/** M9/T6: MySQL type-domain fidelity — decode and round-trip the value
  * domains the reference ships downstream
  * (ref: drainer/translator/kafka.go:227-294 `DatumToColumn` maps
  * date/time→string, unsigned int→uint64, decimal→string, bit→bytes,
  * enum/set→uint64; tests/dailytest/case.go:94-146 exercises
  * DECIMAL(38,19), BIT(64), BIGINT extremes, enum/set; pkg/loader and
  * drainer/sync/mysql.go:184-233 format them for the wire).
  *
  * Spark-first: every conversion is a codegen'd projection (CAST chains,
  * CASE, format_string) — no UDFs, no shuffle; fidelity costs nothing at
  * 100 TB because it's applied inside the scan's whole-stage codegen.
  *
  * Oracle parity rules used here:
  *  - decimals are emitted as strings (exactly what DatumToColumn does) and
  *    every intermediate arithmetic type is pinned with explicit CASTs so
  *    both engines print identical full-scale text;
  *  - the 64-bit pattern is built from two md5-derived 32-bit halves with
  *    explicit two's-complement folding (no engine-specific overflow
  *    behavior is relied on);
  *  - `%016x` two's-complement formatting is identical in Java's Formatter
  *    and DuckDB's printf.
  */
object TypeDomain {

  // ---- shared M9 derivations: the gated m9_* projections AND the
  // typedEnvelope feeding the real substrates (binlog codec, JDBC
  // loader) read the SAME definitions — a drift between the copies
  // would de-synchronize the envelope from its oracle silently ----
  private val dec38Col: Column =
    expr("""CAST(CAST(pk AS DECIMAL(20,0)) +
           |     CAST(commit_ts % 1000 AS DECIMAL(10,0)) * CAST(0.001 AS DECIMAL(4,3))
           |     AS DECIMAL(38,19))""".stripMargin).cast("string")

  private val dec38SqlF: String =
    "CAST(CAST(CAST(pk AS DECIMAL(20,0)) + " +
      "CAST(commit_ts % 1000 AS DECIMAL(10,0)) * CAST(0.001 AS DECIMAL(4,3)) " +
      "AS DECIMAL(38,19)) AS VARCHAR)"

  private def unsignedStr(x: Column): Column =
    (x.cast("decimal(20,0)") +
      when(x < 0, expr("CAST('18446744073709551616' AS DECIMAL(20,0))"))
        .otherwise(expr("CAST('0' AS DECIMAL(20,0))"))).cast("string")

  private def unsignedStrSqlF(x: String): String =
    s"CAST(CAST($x AS DECIMAL(20,0)) + " +
      s"CASE WHEN $x < 0 THEN CAST('18446744073709551616' AS DECIMAL(20,0)) " +
      s"ELSE CAST('0' AS DECIMAL(20,0)) END AS VARCHAR)"

  // ENUM('click','purchase','signup','view','error'), 1-based
  private val enumOrdCol: Column =
    when(col("event_type") === "click", 1L)
      .when(col("event_type") === "purchase", 2L)
      .when(col("event_type") === "signup", 3L)
      .when(col("event_type") === "view", 4L)
      .when(col("event_type") === "error", 5L)
      .otherwise(0L)

  private val enumOrdSqlF: String =
    "CASE event_type WHEN 'click' THEN 1 WHEN 'purchase' THEN 2 " +
      "WHEN 'signup' THEN 3 WHEN 'view' THEN 4 WHEN 'error' THEN 5 " +
      "ELSE 0 END"

  /** DECIMAL(38,19) arithmetic round-trip: integer + scaled fraction and a
    * scaled product, emitted at full 19-digit scale as strings (mirrors the
    * reference's decimal-as-string wire format; dailytest case inserts
    * DECIMAL(38,19) literals and diffs the round-trip). */
  def decimal38(spark: SparkSession, dir: String): DataFrame =
    Cdc.changes(spark, dir).select(
      col("commit_ts"),
      dec38Col.as("dec38_str"),
      expr("""CAST(CAST(-pk AS DECIMAL(20,0)) -
             |     CAST(commit_ts % 97 AS DECIMAL(10,0)) * CAST(0.01 AS DECIMAL(3,2))
             |     AS DECIMAL(38,19))""".stripMargin).cast("string").as("dec38_neg_str"),
      expr("CAST(CAST(commit_ts AS DECIMAL(18,0)) * CAST(1.25 AS DECIMAL(5,2)) AS DECIMAL(38,19))")
        .cast("string").as("dec38_mul_str"))

  def decimal38Sql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT commit_ts,
       |  $dec38SqlF AS dec38_str,
       |  CAST(CAST(CAST(-pk AS DECIMAL(20,0)) -
       |       CAST(commit_ts % 97 AS DECIMAL(10,0)) * CAST(0.01 AS DECIMAL(3,2))
       |       AS DECIMAL(38,19)) AS VARCHAR) AS dec38_neg_str,
       |  CAST(CAST(CAST(commit_ts AS DECIMAL(18,0)) * CAST(1.25 AS DECIMAL(5,2))
       |       AS DECIMAL(38,19)) AS VARCHAR) AS dec38_mul_str
       |FROM c""".stripMargin

  /** Two's-complement 64-bit pattern from two md5-derived 32-bit halves —
    * covers the full signed range (negative = unsigned upper half) without
    * relying on either engine's overflow behavior: the high half is folded
    * to its signed value BEFORE the shift-equivalent multiply. */
  private def bitPattern(seed: Column): Column = {
    val h1 = Lex.hex8(seed)
    val h2 = Lex.hex8b(seed)
    (h1 - when(h1 >= 2147483648L, 4294967296L).otherwise(0L)) * 4294967296L + h2
  }

  private def bitPatternSql(seed: String): String = {
    val h1 = Lex.hex8Sql(seed)
    val h2 = Lex.hex8bSql(seed)
    s"($h1 - CASE WHEN $h1 >= 2147483648 THEN 4294967296 ELSE 0 END) * 4294967296 + $h2"
  }

  /** Unsigned BIGINT → DECIMAL(20,0) (ref: kafka.go:246-254 unsigned flag →
    * uint64; loader renders it as the unsigned decimal) and BIT(64) →
    * fixed-width pattern (ref: kafka.go:262-263 bit → bytes; emitted here as
    * the 16-hex-char two's-complement image plus popcount). */
  def unsignedBit(spark: SparkSession, dir: String): DataFrame = {
    val x = bitPattern(col("commit_ts").cast("string"))
    Cdc.changes(spark, dir)
      .withColumn("x", x)
      .select(
        col("commit_ts"),
        col("x").as("signed_v"),
        unsignedStr(col("x")).as("unsigned_str"),
        format_string("%016x", col("x")).as("bit64_hex"),
        bit_count(col("x")).cast("long").as("bit64_popcount"))
  }

  def unsignedBitSql: String = {
    val x = bitPatternSql("CAST(commit_ts AS VARCHAR)")
    s"""WITH c AS (${Cdc.changesCte}), b AS (SELECT commit_ts, $x AS x FROM c)
       |SELECT commit_ts, x AS signed_v,
       |  ${unsignedStrSqlF("x")} AS unsigned_str,
       |  printf('%016x', x) AS bit64_hex,
       |  CAST(bit_count(x) AS BIGINT) AS bit64_popcount
       |FROM b""".stripMargin
  }

  /** ENUM/SET → integer dictionary (ref: kafka.go:276-279 enum/set →
    * uint64): the enum index is 1-based in definition order, the set value
    * is the element bitmask, and the set round-trips back to its
    * comma-joined text form exactly like MySQL prints it. */
  def enumSet(spark: SparkSession, dir: String): DataFrame = {
    val bits = Lex.hex8(concat(col("commit_ts").cast("string"), lit(":set"))) % 8
    Cdc.changes(spark, dir)
      .withColumn("set_bits", bits)
      .select(
        col("commit_ts"),
        col("event_type"),
        enumOrdCol.as("enum_val"),
        col("set_bits").as("set_val"),
        // SET('a','b','c') printed in definition order, empty set = ''
        concat_ws(",",
          when(col("set_bits").bitwiseAND(lit(1L)) > 0, "a"),
          when(col("set_bits").bitwiseAND(lit(2L)) > 0, "b"),
          when(col("set_bits").bitwiseAND(lit(4L)) > 0, "c")).as("set_str"))
  }

  /** M9 SET numeric representation from a TRACKED dictionary (ref:
    * drainer/translator/mysql.go:266-269 — `GetMysqlSet().Value` is the
    * bitmask of 1<<position in declaration order): comma-joined member
    * text → the bitmask, through a driver-local constant map literal (a
    * SET holds at most 64 members by MySQL's own limit, so the literal is
    * tiny and the expression codegen-friendly). The empty set ('') is 0;
    * an unknown member or NULL text yields NULL — loud, never a silent 0.
    * The comma split is sound because MySQL itself FORBIDS commas inside
    * SET members (the wire text is therefore unambiguous); a tracked
    * dictionary carrying a comma member (the tracker's grammar admits the
    * quoting) maps such rows to the loud NULL.
    * Pairs with the decode's tracked ENUM ordinal derivation
    * ([[graft.streaming.SchemaTracker]] `dicts`). */
  def setMask(dict: Seq[String], member: Column): Column = {
    val bits = dict.zipWithIndex.map { case (v, i) => v -> (1L << i) }.toMap
    // try_element_at, not element_at: under the default ANSI mode a
    // missing map key THROWS — one drifted row must yield the contract's
    // loud NULL, not kill the query
    when(member === "", 0L).otherwise(
      aggregate(split(member, ","), lit(0L),
        (acc, m) => acc + try_element_at(typedLit(bits), m)))
  }

  def enumSetSql: String = {
    val bits = s"${Lex.hex8Sql("CAST(commit_ts AS VARCHAR) || ':set'")} % 8"
    s"""WITH c AS (${Cdc.changesCte}), b AS (SELECT *, $bits AS set_bits FROM c)
       |SELECT commit_ts, event_type,
       |  $enumOrdSqlF AS enum_val,
       |  set_bits AS set_val,
       |  concat_ws(',',
       |    CASE WHEN (set_bits & 1) > 0 THEN 'a' END,
       |    CASE WHEN (set_bits & 2) > 0 THEN 'b' END,
       |    CASE WHEN (set_bits & 4) > 0 THEN 'c' END) AS set_str
       |FROM b""".stripMargin
  }

  /** Timezone-shifted timestamp formatting (ref: drainer/sync/mysql.go and
    * the loader set the session time_zone to a fixed offset before writing;
    * kafka.go renders date/time types as strings). Formats the same instant
    * at UTC, +08:00 and -05:00, plus the (offset-sensitive) date bucket —
    * a +8h shift moves late-evening events across the date boundary. */
  def tzFormat(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_utc_str"),
      date_format(col("ts") + expr("INTERVAL 8 HOURS"), "yyyy-MM-dd HH:mm:ss").as("ts_p8_str"),
      date_format(col("ts") - expr("INTERVAL 5 HOURS"), "yyyy-MM-dd HH:mm:ss").as("ts_m5_str"),
      (col("ts") + expr("INTERVAL 8 HOURS")).cast("date").cast("string").as("date_p8_str"))

  /** The M9 domains as wire-envelope columns, derived deterministically
    * from the change stream — shared by the binlog codec round-trip
    * (`PbBinlogFile.typedRoundtripQuery`) and the multi-table JDBC loader,
    * so BOTH real substrates carry the full type domain end-to-end, not
    * just the standalone m9_* projections (ref:
    * drainer/translator/pb.go:242-296 datum cells;
    * tests/dailytest/case.go:97-146 round-trips these exact domains). */
  def typedEnvelope(changes: DataFrame): DataFrame =
    changes
      .withColumn("x", bitPattern(col("commit_ts").cast("string")))
      .withColumn("dec38", dec38Col)
      .withColumn("udec", unsignedStr(col("x")))
      .withColumn("bits", col("x"))
      .withColumn("enum_ord", enumOrdCol.cast("int"))
      .drop("x")

  /** DuckDB form of [[typedEnvelope]] over the change CTE: same column
    * names, same derivations. */
  def typedEnvelopeCte: String = {
    val x = bitPatternSql("CAST(commit_ts AS VARCHAR)")
    s"""SELECT commit_ts, pk, op, event_type, ts, value, props,
       |  $dec38SqlF AS dec38,
       |  ${unsignedStrSqlF("x")} AS udec,
       |  x AS bits,
       |  $enumOrdSqlF AS enum_ord
       |FROM (SELECT *, $x AS x FROM (${Cdc.changesCte}) c) b""".stripMargin
  }

  def tzFormatSql: String =
    """SELECT event_id,
      |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_utc_str,
      |  strftime(CAST(ts AS TIMESTAMP) + INTERVAL 8 HOUR, '%Y-%m-%d %H:%M:%S') AS ts_p8_str,
      |  strftime(CAST(ts AS TIMESTAMP) - INTERVAL 5 HOUR, '%Y-%m-%d %H:%M:%S') AS ts_m5_str,
      |  CAST(CAST(CAST(ts AS TIMESTAMP) + INTERVAL 8 HOUR AS DATE) AS VARCHAR) AS date_p8_str
      |FROM events""".stripMargin
}
