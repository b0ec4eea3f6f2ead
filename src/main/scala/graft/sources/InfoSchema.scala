package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.SchemaTracker

/** S8: downstream schema/key catalog read
  * (ref: pkg/loader/util.go:68-123 `getTableInfo` — the loader bootstraps
  * each table's column list and unique-key set from
  * information_schema.columns / information_schema.statistics, hoists the
  * PRIMARY index to the front of the unique-key list, and excludes
  * generated columns from the writable set).
  *
  * Spark-first: the information_schema tables ARE DataFrames — in
  * production `spark.read.jdbc(url, "information_schema.statistics", …)`
  * yields exactly these shapes; tests construct them in-memory. The catalog
  * is tiny (one row per column/index), so it collects once at the driver
  * and feeds the [[SchemaTracker]] / decode broadcast, never a per-row
  * lookup on the data path.
  */
object InfoSchema {

  case class IndexInfo(name: String, columns: Seq[String])
  case class TableInfo(schema: String, table: String, columns: Seq[String],
      primaryKey: Option[IndexInfo], uniqueKeys: Seq[IndexInfo])

  /** Build the per-table info from the two catalog frames.
    *
    * `columnsDf`: (table_schema, table_name, column_name, ordinal_position,
    * extra) — rows whose `extra` contains GENERATED are excluded from the
    * writable column list (ref: util.go getColsOfTbl / mysql.go:212-222).
    * `statsDf`: (table_schema, table_name, index_name, non_unique,
    * seq_in_index, column_name) — unique keys are the non_unique = 0
    * indexes, columns in seq_in_index order, PRIMARY hoisted first. */
  def tableInfo(columnsDf: DataFrame, statsDf: DataFrame,
      schema: String, table: String): TableInfo = {
    val cols = columnsDf
      .filter(col("table_schema") === schema && col("table_name") === table)
      .filter(!upper(coalesce(col("extra"), lit(""))).contains("GENERATED"))
      .orderBy("ordinal_position")
      .select("column_name")
      .collect().map(_.getString(0)).toSeq
    val keyRows = statsDf
      .filter(col("table_schema") === schema && col("table_name") === table)
      .filter(col("non_unique") === 0)
      .orderBy("index_name", "seq_in_index")
      .select("index_name", "column_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val grouped = keyRows.groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
      .map { case (name, cs) => IndexInfo(name, cs) }.toSeq
      .sortBy(_.name)
    // PRIMARY first (ref: util.go:96-104)
    val (primary, others) = grouped.partition(_.name == "PRIMARY")
    val uniqueKeys = primary ++ others
    TableInfo(schema, table, cols, primary.headOption, uniqueKeys)
  }

  /** All (schema, table) pairs present in the catalog frame. */
  def tables(columnsDf: DataFrame): Seq[(String, String)] =
    columnsDf.select("table_schema", "table_name").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted

  /** Populate a [[SchemaTracker]] from the catalog — the S8 bootstrap the
    * reference does once per table before applying DMLs. */
  def loadInto(tracker: SchemaTracker, columnsDf: DataFrame, statsDf: DataFrame,
      version: Long): Seq[TableInfo] =
    tables(columnsDf).map { case (s, t) =>
      val info = tableInfo(columnsDf, statsDf, s, t)
      tracker.createTable(s, t, info.columns, version)
      info
    }
}
