package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M5: DDL-text parsing — extract (statement kind, schema, table) from raw
  * DDL SQL (ref: reparo/ddl.go:25-80 `parseDDL` handles an optional
  * `use db;` prefix plus create/drop database, create/drop/alter/rename/
  * truncate table, create/drop index and create view, taking the schema
  * from the statement when qualified and falling back to the `use`
  * database — `setSchemaIfExists`, ddl.go:76-84; rename reports the OLD
  * table, ddl.go:60).
  *
  * The reference links a full SQL parser; Spark-first the extraction is a
  * fixed set of codegen'd `regexp_extract` projections — a DDL stream is
  * tiny by nature, but the same expressions run distributed over any
  * volume. The DDL corpus is synthesized deterministically from the change
  * stream (10 statement kinds × optional use-prefix × optional schema
  * qualifier × optional backtick quoting × IF [NOT] EXISTS variants), and
  * BOTH the generator and the parser are mirrored into the DuckDB oracle,
  * so the hash gate proves generator and parser agree byte-for-byte across
  * engines.
  */
object Ddl {

  /** Qualified-name capture: optional `schema`. prefix (group 1) then the
    * object name (group 2), both optionally backtick-quoted. */
  private val QualRe = "(?:`?([a-z0-9_]+)`?\\.)?`?([a-z0-9_]+)`?"
  private val DbRe = "DATABASE `?([a-z0-9_]+)`?"
  private val UseRe = "^USE `?([a-z0-9_]+)`?; "

  private val KindRe: Seq[(String, String)] = Seq(
    "create_database" -> "^CREATE DATABASE ",
    "drop_database"   -> "^DROP DATABASE ",
    "create_table"    -> ("^CREATE TABLE (?:IF NOT EXISTS )?" + QualRe),
    "drop_table"      -> ("^DROP TABLE (?:IF EXISTS )?" + QualRe),
    "alter_table"     -> ("^ALTER TABLE " + QualRe),
    "rename_table"    -> ("^RENAME TABLE " + QualRe + " TO"),
    "truncate_table"  -> ("^TRUNCATE TABLE " + QualRe),
    "create_index"    -> ("^CREATE INDEX .* ON " + QualRe),
    "drop_index"      -> ("^DROP INDEX .* ON " + QualRe),
    "create_view"     -> ("^CREATE VIEW " + QualRe))

  // ---- deterministic DDL-corpus generator (mirrored in SQL below) ----

  /** Synthesized DDL statement per change row: kind from commit_ts % 10,
    * names from pk, quoting/qualification/prefix variants from parities. */
  private def stmtCol: Column = {
    val bt = pmod(col("pk"), lit(2)) === 0
    def q(name: Column) = when(bt, concat(lit("`"), name, lit("`"))).otherwise(name)
    val dbn  = concat(lit("db"), pmod(col("pk"), lit(5)).cast("string"))
    val sn   = concat(lit("s"), pmod(col("pk"), lit(5)).cast("string"))
    val tn   = concat(lit("t"), pmod(col("pk"), lit(7)).cast("string"))
    val tn2  = concat(lit("t"), pmod(col("pk") + 1, lit(7)).cast("string"))
    val idxn = concat(lit("idx"), pmod(col("pk"), lit(4)).cast("string"))
    val qual = when(pmod(col("commit_ts"), lit(3)) === 0, concat(q(sn), lit("."), q(tn)))
      .otherwise(q(tn))
    val ine = when(pmod(col("pk"), lit(3)) === 0, "IF NOT EXISTS ").otherwise("")
    val ie  = when(pmod(col("pk"), lit(3)) === 0, "IF EXISTS ").otherwise("")
    val k = pmod(col("commit_ts"), lit(10))
    val body =
      when(k === 0, concat(lit("CREATE DATABASE "), q(dbn)))
        .when(k === 1, concat(lit("DROP DATABASE "), q(dbn)))
        .when(k === 2, concat(lit("CREATE TABLE "), ine, qual, lit(" (id BIGINT, v DOUBLE)")))
        .when(k === 3, concat(lit("DROP TABLE "), ie, qual))
        .when(k === 4, concat(lit("ALTER TABLE "), qual, lit(" ADD COLUMN c0 INT")))
        .when(k === 5, concat(lit("RENAME TABLE "), qual, lit(" TO "), q(tn2)))
        .when(k === 6, concat(lit("TRUNCATE TABLE "), qual))
        .when(k === 7, concat(lit("CREATE INDEX "), q(idxn), lit(" ON "), qual, lit(" (id)")))
        .when(k === 8, concat(lit("DROP INDEX "), q(idxn), lit(" ON "), qual))
        .otherwise(concat(lit("CREATE VIEW "), qual, lit(" AS SELECT 1")))
    // the USE-prefix parity must be INDEPENDENT of the kind selector
    // (commit_ts % 10) — keying it on commit_ts % 2 aliased them, so odd
    // kinds (DROP/RENAME/CREATE INDEX/VIEW) never drew a use-db prefix
    // and that half of the parser's fallback went unswept
    when(pmod(expr("commit_ts div 10"), lit(2)) === 0,
      concat(lit("USE "), q(concat(lit("db"), pmod(col("commit_ts"), lit(5)).cast("string"))),
        lit("; "), body))
      .otherwise(body)
  }

  private def stmtSql: String = {
    val bt = "(pk % 2 = 0)"
    def q(name: String) = s"CASE WHEN $bt THEN '`' || $name || '`' ELSE $name END"
    val dbn  = "'db' || CAST(pk % 5 AS VARCHAR)"
    val sn   = "'s' || CAST(pk % 5 AS VARCHAR)"
    val tn   = "'t' || CAST(pk % 7 AS VARCHAR)"
    val tn2  = "'t' || CAST((pk + 1) % 7 AS VARCHAR)"
    val idxn = "'idx' || CAST(pk % 4 AS VARCHAR)"
    val qual = s"CASE WHEN commit_ts % 3 = 0 THEN ${q(sn)} || '.' || ${q(tn)} ELSE ${q(tn)} END"
    val ine = "CASE WHEN pk % 3 = 0 THEN 'IF NOT EXISTS ' ELSE '' END"
    val ie  = "CASE WHEN pk % 3 = 0 THEN 'IF EXISTS ' ELSE '' END"
    val body =
      s"""CASE commit_ts % 10
         |  WHEN 0 THEN 'CREATE DATABASE ' || ${q(dbn)}
         |  WHEN 1 THEN 'DROP DATABASE ' || ${q(dbn)}
         |  WHEN 2 THEN 'CREATE TABLE ' || $ine || $qual || ' (id BIGINT, v DOUBLE)'
         |  WHEN 3 THEN 'DROP TABLE ' || $ie || $qual
         |  WHEN 4 THEN 'ALTER TABLE ' || $qual || ' ADD COLUMN c0 INT'
         |  WHEN 5 THEN 'RENAME TABLE ' || $qual || ' TO ' || ${q(tn2)}
         |  WHEN 6 THEN 'TRUNCATE TABLE ' || $qual
         |  WHEN 7 THEN 'CREATE INDEX ' || ${q(idxn)} || ' ON ' || $qual || ' (id)'
         |  WHEN 8 THEN 'DROP INDEX ' || ${q(idxn)} || ' ON ' || $qual
         |  ELSE 'CREATE VIEW ' || $qual || ' AS SELECT 1' END""".stripMargin
    val useDb = q("'db' || CAST(commit_ts % 5 AS VARCHAR)")
    s"CASE WHEN (commit_ts // 10) % 2 = 0 THEN 'USE ' || $useDb || '; ' ELSE '' END || ($body)"
  }

  // ---- the parser ----

  def ddlParse(spark: SparkSession, dir: String): DataFrame = {
    val base = Cdc.changes(spark, dir)
      .select(col("commit_ts"), col("pk"))
      .withColumn("stmt", stmtCol)
      .withColumn("use_db", regexp_extract(col("stmt"), UseRe, 1))
      .withColumn("body", regexp_replace(col("stmt"), UseRe, ""))
    val kind = KindRe.foldRight(lit("unknown"): Column) { case ((name, re), els) =>
      when(col("body").rlike(re), name).otherwise(els)
    }
    val parsed = base.withColumn("stmt_kind", kind)
    val explicitSchema = KindRe.foldRight(lit(""): Column) { case ((name, re), els) =>
      val grp = if (name.endsWith("_database")) regexp_extract(col("body"), DbRe, 1)
                else regexp_extract(col("body"), re, 1)
      when(col("stmt_kind") === name, grp).otherwise(els)
    }
    val tableName = KindRe.foldRight(lit(""): Column) { case ((name, re), els) =>
      val grp = if (name.endsWith("_database")) lit("")
                else regexp_extract(col("body"), re, 2)
      when(col("stmt_kind") === name, grp).otherwise(els)
    }
    parsed
      .withColumn("explicit_schema", explicitSchema)
      .withColumn("table_name", tableName)
      // setSchemaIfExists: statement schema wins, else the use-db prefix
      .withColumn("schema_name",
        when(col("explicit_schema") =!= "", col("explicit_schema"))
          .when(col("use_db") =!= "", col("use_db"))
          .otherwise(""))
      .select("commit_ts", "stmt", "stmt_kind", "schema_name", "table_name")
  }

  def ddlParseSql: String = {
    // DuckDB standard strings don't process backslash escapes — the regex
    // text goes into the literal verbatim; only quotes need doubling
    def esc(re: String) = re.replace("'", "''")
    val kindCase = KindRe.map { case (name, re) =>
      s"WHEN regexp_matches(body, '${esc(re)}') THEN '$name'"
    }.mkString("\n    ")
    val schemaCase = KindRe.map { case (name, re) =>
      val grp = if (name.endsWith("_database")) s"regexp_extract(body, '${esc(DbRe)}', 1)"
                else s"regexp_extract(body, '${esc(re)}', 1)"
      s"WHEN stmt_kind = '$name' THEN $grp"
    }.mkString("\n    ")
    val tableCase = KindRe.map { case (name, re) =>
      val grp = if (name.endsWith("_database")) "''"
                else s"regexp_extract(body, '${esc(re)}', 2)"
      s"WHEN stmt_kind = '$name' THEN $grp"
    }.mkString("\n    ")
    s"""WITH c AS (${Cdc.changesCte}),
       |g AS (SELECT commit_ts, pk, ($stmtSql) AS stmt FROM c),
       |u AS (SELECT commit_ts, stmt,
       |        regexp_extract(stmt, '${esc(UseRe)}', 1) AS use_db,
       |        regexp_replace(stmt, '${esc(UseRe)}', '') AS body
       |      FROM g),
       |k AS (SELECT *, CASE
       |    $kindCase
       |    ELSE 'unknown' END AS stmt_kind FROM u),
       |p AS (SELECT *, CASE
       |    $schemaCase
       |    ELSE '' END AS explicit_schema,
       |  CASE
       |    $tableCase
       |    ELSE '' END AS table_name FROM k)
       |SELECT commit_ts, stmt, stmt_kind,
       |  CASE WHEN explicit_schema <> '' THEN explicit_schema
       |       WHEN use_db <> '' THEN use_db ELSE '' END AS schema_name,
       |  table_name
       |FROM p""".stripMargin
  }
}
