package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables

/** Format translators (SURVEY.md §2.4): the map-only operators that encode
  * change events for downstream consumers or decode loosely-typed payloads.
  *
  * All of these are pure projections — whole-stage codegen'd string/JSON
  * expressions with no shuffle — so they scale with scan bandwidth alone.
  * Numeric-to-string formatting goes through DECIMAL so the byte output is
  * engine-independent (double formatting is not).
  */
object Translators {

  private val valueStr = col("value").cast("decimal(18,2)").cast("string")

  // a value interpolated into single-quoted SQL literal text must escape
  // embedded quotes, or a kind value carrying one emits a malformed — and
  // injectable — statement; both engines escape identically so the hash
  // gate stays aligned. ''-doubling is complete for the ORACLE dialect
  // generated here (no backslash escapes); a MySQL-dialect reuse must ALSO
  // double backslashes — under MySQL's default (NO_BACKSLASH_ESCAPES off)
  // a value ending in `\` would otherwise escape the closing quote
  private def q(c: Column): Column = replace(c, lit("'"), lit("''"))
  private def qSql(e: String): String = s"replace($e, '''', '''''')"

  /** M2: secondary-binlog / Kafka message encoding
    * (ref: drainer/translator/kafka.go:38-150 — self-describing message
    * carrying database, table, type and column values). The message is built
    * by explicit concatenation, not a JSON library, so key order and number
    * formatting are deterministic across engines.
    */
  def kafkaEncode(spark: SparkSession, dir: String): DataFrame =
    Cdc.changes(spark, dir).select(
      col("commit_ts"),
      concat(
        lit("{\"database\":\"app\",\"table\":\"events\",\"type\":\""), col("op"),
        lit("\",\"commit_ts\":"), col("commit_ts"),
        lit(",\"pk\":"), col("pk"),
        lit(",\"value\":\""), valueStr,
        lit("\"}")).as("msg"))

  def kafkaEncodeSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT commit_ts,
       |  '{"database":"app","table":"events","type":"' || op ||
       |  '","commit_ts":' || CAST(commit_ts AS VARCHAR) ||
       |  ',"pk":' || CAST(pk AS VARCHAR) ||
       |  ',"value":"' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) ||
       |  '"}' AS msg
       |FROM c""".stripMargin

  /** M6: typed decode of a self-describing payload
    * (ref: pkg/loader/translate.go:30-161 `columnToArg` maps wire values to
    * typed driver args). `from_json` with an explicit schema is the Spark
    * analog of the proto column decoder; fully codegen-compatible.
    */
  def typedDecode(spark: SparkSession, dir: String): DataFrame = {
    val decoded = from_json(col("props"),
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
    // parse bound once, fields read from the attribute: two inline
    // `decoded.getField` references are two JsonToStructs evaluations per
    // row (CodegenFallback — no codegen subexpression elimination; the
    // CdcStream.decodeSlice measurement), and CollapseProject keeps the
    // split rather than duplicate a non-cheap expression
    Tables.events(spark, dir)
      .select(col("event_id"), decoded.getField("k").as("k"))
      .select(col("event_id"), col("k"), (col("k") * 2).as("k2"))
  }

  def typedDecodeSql: String =
    """SELECT event_id,
      |  CAST(props->>'$.k' AS BIGINT) AS k,
      |  CAST(props->>'$.k' AS BIGINT) * 2 AS k2
      |FROM events""".stripMargin

  /** M7: per-DML SQL text generation
    * (ref: pkg/loader/model.go:187-445 — INSERT / UPDATE…LIMIT 1 /
    * DELETE…LIMIT 1 with the unique-key WHERE clause; here pk is the unique
    * key, the single-PK fast path of `whereSlice` model.go:303-322).
    */
  def sqlTextGen(spark: SparkSession, dir: String): DataFrame =
    Cdc.changes(spark, dir).select(
      col("commit_ts"),
      when(col("op") === "I",
        concat(lit("INSERT INTO app.events(pk,value) VALUES("),
          col("pk"), lit(","), valueStr, lit(")")))
      .when(col("op") === "U",
        concat(lit("UPDATE app.events SET value = "), valueStr,
          lit(" WHERE pk = "), col("pk"), lit(" LIMIT 1")))
      .otherwise(
        concat(lit("DELETE FROM app.events WHERE pk = "), col("pk"),
          lit(" LIMIT 1"))).as("sql"))

  def sqlTextGenSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT commit_ts,
       |  CASE WHEN op = 'I' THEN
       |    'INSERT INTO app.events(pk,value) VALUES(' || CAST(pk AS VARCHAR) ||
       |    ',' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) || ')'
       |  WHEN op = 'U' THEN
       |    'UPDATE app.events SET value = ' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) ||
       |    ' WHERE pk = ' || CAST(pk AS VARCHAR) || ' LIMIT 1'
       |  ELSE
       |    'DELETE FROM app.events WHERE pk = ' || CAST(pk AS VARCHAR) || ' LIMIT 1'
       |  END AS sql
       |FROM c""".stripMargin

  /** M3: pb-file record encoding (ref: drainer/translator/pb.go:242-296 —
    * each row cell is a marshalled column{name, tp, mysql_type, value};
    * records are length-prefixed into ts-named files). Analog: the cell list
    * as a deterministic `name:type:value` text encoding; the file layout
    * itself is parquet in this engine (SURVEY §2.4 M3). */
  def pbEncode(spark: SparkSession, dir: String): DataFrame =
    Cdc.changes(spark, dir).select(
      col("commit_ts"),
      concat(
        lit("pk:bigint:"), col("pk"),
        lit(";value:decimal:"), valueStr,
        lit(";event_type:varchar:"), col("event_type")).as("cells"),
      concat(lit("binlog-"), lpad(col("commit_ts"), 16, "0")).as("file_name"))

  def pbEncodeSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT commit_ts,
       |  'pk:bigint:' || CAST(pk AS VARCHAR) ||
       |  ';value:decimal:' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) ||
       |  ';event_type:varchar:' || event_type AS cells,
       |  'binlog-' || lpad(CAST(commit_ts AS VARCHAR), 16, '0') AS file_name
       |FROM c""".stripMargin

  /** M4: Oracle-dialect SQL generation (ref: drainer/translator/oracle.go:18-136
    * and pkg/loader/model.go:216-299 — `rownum <= 1` instead of LIMIT,
    * RTRIM() around CHAR comparisons, schema routing uppercased). */
  def oracleDialect(spark: SparkSession, dir: String): DataFrame =
    Cdc.changes(spark, dir).select(
      col("commit_ts"),
      when(col("op") === "I",
        // KIND rides the INSERT: the dialect's own UPDATE predicates on
        // RTRIM(KIND), and RTRIM(NULL) = NULL would match ZERO rows on a
        // real Oracle for every row this INSERT created
        concat(lit("INSERT INTO APP.EVENTS(PK,VALUE,KIND) VALUES("),
          col("pk"), lit(","), valueStr, lit(",'"), q(col("event_type")),
          lit("')")))
      .when(col("op") === "U",
        concat(lit("UPDATE APP.EVENTS SET VALUE = "), valueStr,
          lit(" WHERE PK = "), col("pk"),
          lit(" AND RTRIM(KIND) = RTRIM('"), q(col("event_type")),
          lit("') AND ROWNUM <= 1")))
      .otherwise(
        concat(lit("DELETE FROM APP.EVENTS WHERE PK = "), col("pk"),
          lit(" AND ROWNUM <= 1"))).as("sql"))

  def oracleDialectSql: String =
    s"""WITH c AS (${Cdc.changesCte})
       |SELECT commit_ts,
       |  CASE WHEN op = 'I' THEN
       |    'INSERT INTO APP.EVENTS(PK,VALUE,KIND) VALUES(' || CAST(pk AS VARCHAR) ||
       |    ',' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) ||
       |    ',''' || ${qSql("event_type")} || ''')'
       |  WHEN op = 'U' THEN
       |    'UPDATE APP.EVENTS SET VALUE = ' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) ||
       |    ' WHERE PK = ' || CAST(pk AS VARCHAR) ||
       |    ' AND RTRIM(KIND) = RTRIM(''' || ${qSql("event_type")} || ''') AND ROWNUM <= 1'
       |  ELSE
       |    'DELETE FROM APP.EVENTS WHERE PK = ' || CAST(pk AS VARCHAR) ||
       |    ' AND ROWNUM <= 1'
       |  END AS sql
       |FROM c""".stripMargin

  /** M4 safe mode: idempotent-replay statement rewriting for the Oracle
    * path (ref: pkg/loader/executor.go:445-499 singleOracleExec — in safe
    * mode an UPDATE becomes DELETE-old + DELETE-new + INSERT-new and an
    * INSERT becomes DELETE + INSERT, so replaying a batch after a partial
    * failure converges instead of erroring; pkg/loader/model.go:216-299
    * buildOracleWhere — CHAR comparisons wrapped in RTRIM, NULL/empty
    * values become IS NULL, every statement bounded by `rownum <= 1`).
    * The old image for UPDATEs is the per-pk lag of value (same convention
    * as [[Transforms.updateImages]]). One window + a pure projection; the
    * explode multiplies rows by ≤ 3. Output: (commit_ts, seq, sql) — the
    * exact ordered statement sequence the applier would execute. */
  def oracleSafeMode(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("pk").orderBy("commit_ts")
    // the old image is the per-pk lag of BOTH carried columns: pairing
    // the lagged value with the CURRENT event's kind would predicate the
    // delete-old on an image no stored row holds — the old row survives,
    // the following INSERT duplicates the key, and replay diverges
    // instead of converging (the delete-new and the D-branch predicate
    // on the row's OWN carried image, the reference's binlog contract)
    val withOld = Cdc.changes(spark, dir)
      .withColumn("before_value", lag("value", 1).over(w))
      .withColumn("before_kind", lag("event_type", 1).over(w))
    val oldStr = col("before_value").cast("decimal(18,2)").cast("string")
    def kindTail(k: Column) = concat(
      when(k.isNull, lit(" AND KIND IS NULL"))
        .otherwise(concat(lit(" AND RTRIM(KIND) = RTRIM('"), q(k), lit("')"))),
      lit(" AND ROWNUM <= 1"))
    val delNew = concat(
      lit("DELETE FROM APP.EVENTS WHERE PK = "), col("pk"),
      lit(" AND VALUE = "), valueStr, kindTail(col("event_type")))
    val delOld = concat(
      lit("DELETE FROM APP.EVENTS WHERE PK = "), col("pk"),
      when(col("before_value").isNull, lit(" AND VALUE IS NULL"))
        .otherwise(concat(lit(" AND VALUE = "), oldStr)),
      kindTail(col("before_kind")))
    val ins = concat(
      lit("INSERT INTO APP.EVENTS(PK,VALUE,KIND) VALUES("),
      col("pk"), lit(","), valueStr, lit(",'"), q(col("event_type")), lit("')"))
    val stmts = when(col("op") === "I", array(delNew, ins))
      .when(col("op") === "U", array(delOld, delNew, ins))
      .otherwise(array(delNew))
    withOld.select(col("commit_ts"), posexplode(stmts).as(Seq("seq", "sql")))
      .select(col("commit_ts"), col("seq").cast("long").as("seq"), col("sql"))
  }

  def oracleSafeModeSql: String = {
    val vNew = "CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)"
    val vOld = "CAST(CAST(before_value AS DECIMAL(18,2)) AS VARCHAR)"
    val tail = "' AND RTRIM(KIND) = RTRIM(''' || " + qSql("event_type") +
      " || ''') AND ROWNUM <= 1'"
    val oldTail = "CASE WHEN before_kind IS NULL THEN ' AND KIND IS NULL' " +
      "ELSE ' AND RTRIM(KIND) = RTRIM(''' || " + qSql("before_kind") +
      " || ''')' END || ' AND ROWNUM <= 1'"
    s"""WITH c AS (${Cdc.changesCte}), i AS (
       |  SELECT commit_ts, pk, op, event_type, value,
       |    lag(value, 1) OVER (PARTITION BY pk ORDER BY commit_ts) AS before_value,
       |    lag(event_type, 1) OVER (PARTITION BY pk ORDER BY commit_ts) AS before_kind
       |  FROM c),
       |s AS (
       |  SELECT commit_ts,
       |    CASE WHEN op = 'I' THEN [
       |      'DELETE FROM APP.EVENTS WHERE PK = ' || CAST(pk AS VARCHAR) ||
       |        ' AND VALUE = ' || $vNew || $tail,
       |      'INSERT INTO APP.EVENTS(PK,VALUE,KIND) VALUES(' || CAST(pk AS VARCHAR) ||
       |        ',' || $vNew || ',''' || ${qSql("event_type")} || ''')']
       |    WHEN op = 'U' THEN [
       |      'DELETE FROM APP.EVENTS WHERE PK = ' || CAST(pk AS VARCHAR) ||
       |        CASE WHEN before_value IS NULL THEN ' AND VALUE IS NULL'
       |             ELSE ' AND VALUE = ' || $vOld END || $oldTail,
       |      'DELETE FROM APP.EVENTS WHERE PK = ' || CAST(pk AS VARCHAR) ||
       |        ' AND VALUE = ' || $vNew || $tail,
       |      'INSERT INTO APP.EVENTS(PK,VALUE,KIND) VALUES(' || CAST(pk AS VARCHAR) ||
       |        ',' || $vNew || ',''' || ${qSql("event_type")} || ''')']
       |    ELSE [
       |      'DELETE FROM APP.EVENTS WHERE PK = ' || CAST(pk AS VARCHAR) ||
       |        ' AND VALUE = ' || $vNew || $tail]
       |    END AS stmts
       |  FROM i)
       |SELECT commit_ts, unnest(range(0, len(stmts))) AS seq,
       |  unnest(stmts) AS sql
       |FROM s""".stripMargin
  }

  /** M8: DDL rewriting (ref: pkg/loader/load.go:401-506 — `use db;`
    * prefixing so the DDL runs in the routed schema, and stripping of
    * placement options the downstream doesn't understand;
    * drainer/translator/pb.go:43-55). The raw DDL is synthesized from the
    * documents table; every third statement carries a placement clause.
    */
  def ddlRewrite(spark: SparkSession, dir: String): DataFrame = {
    val raw = concat(
      lit("CREATE TABLE docs_"), pmod(col("doc_id"), lit(10)), lit(" (id INT)"),
      when(col("doc_id") % 3 === 0, lit(" PLACEMENT POLICY p1")).otherwise(lit("")))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      raw.as("raw_ddl"),
      concat(lit("USE "), col("source"), lit("; "),
        regexp_replace(raw, " PLACEMENT POLICY \\w+", "")).as("ddl"))
  }

  def ddlRewriteSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    'CREATE TABLE docs_' || CAST(doc_id % 10 AS VARCHAR) || ' (id INT)' ||
      |    CASE WHEN doc_id % 3 = 0 THEN ' PLACEMENT POLICY p1' ELSE '' END AS raw_ddl
      |  FROM documents)
      |SELECT doc_id, raw_ddl,
      |  'USE ' || source || '; ' ||
      |  regexp_replace(raw_ddl, ' PLACEMENT POLICY \w+', '') AS ddl
      |FROM d""".stripMargin
}
