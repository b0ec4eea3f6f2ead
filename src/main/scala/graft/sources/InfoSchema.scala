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
    * reference does once per table before applying DMLs.
    *
    * Each catalog frame is collected ONCE and bucketed driver-side: a
    * per-table `tableInfo` call would re-filter and re-collect both frames
    * per table — against a real JDBC-backed information_schema that is
    * 2·T+1 database round-trips for T tables, for data this doc already
    * promises "collects once at the driver". */
  def loadInto(tracker: SchemaTracker, columnsDf: DataFrame, statsDf: DataFrame,
      version: Long): Seq[TableInfo] = {
    val colRows = columnsDf
      .filter(!upper(coalesce(col("extra"), lit(""))).contains("GENERATED"))
      .select("table_schema", "table_name", "column_name", "ordinal_position")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3)))
      .toSeq.groupBy(r => (r._1, r._2))
    val keyRows = statsDf
      .filter(col("non_unique") === 0)
      .select("table_schema", "table_name", "index_name", "seq_in_index",
        "column_name")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getInt(3),
        r.getString(4)))
      .toSeq.groupBy(r => (r._1, r._2))
    colRows.keys.toSeq.sorted.map { case (s, t) =>
      val cols = colRows(s -> t).sortBy(_._4).map(_._3)
      val grouped = keyRows.getOrElse(s -> t, Seq.empty)
        .sortBy(r => (r._3, r._4))
        .groupBy(_._3).view.mapValues(_.map(_._5)).toMap
        .map { case (name, cs) => IndexInfo(name, cs) }.toSeq
        .sortBy(_.name)
      val (primary, others) = grouped.partition(_.name == "PRIMARY")
      val info = TableInfo(s, t, cols, primary.headOption, primary ++ others)
      tracker.createTable(s, t, info.columns, version)
      info
    }
  }
}
