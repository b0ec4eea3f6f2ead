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
  /** Assemble one table's info from pre-collected, pre-ordered rows — the
    * ONE copy of the unique-key construction rules (group by index name,
    * PRIMARY hoisted first, ref: util.go:96-104) shared by the per-table
    * and bulk bootstrap paths, so they cannot desynchronize. `keyRows`
    * must already be in (index_name, seq_in_index) order. */
  private def assemble(schema: String, table: String, cols: Seq[String],
      keyRows: Seq[(String, String)]): TableInfo = {
    val grouped = keyRows.groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
      .map { case (name, cs) => IndexInfo(name, cs) }.toSeq
      .sortBy(_.name)
    val (primary, others) = grouped.partition(_.name == "PRIMARY")
    TableInfo(schema, table, cols, primary.headOption, primary ++ others)
  }

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
    assemble(schema, table, cols, keyRows)
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
    // ordinals cast to LONG before collecting: a JDBC-backed catalog maps
    // unsigned ORDINAL_POSITION/SEQ_IN_INDEX to LongType (or wider), so a
    // getInt would ClassCastException on exactly the production shape this
    // file promises to read. Tables are enumerated from the UNFILTERED
    // rows (the generated-ness rides as a flag): a table whose every
    // column is generated still registers, with an empty writable list,
    // exactly like the per-table path.
    val colRows = columnsDf
      .select(col("table_schema"), col("table_name"), col("column_name"),
        col("ordinal_position").cast("long"),
        upper(coalesce(col("extra"), lit(""))).contains("GENERATED").as("gen"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getBoolean(4)))
      .toSeq.groupBy(r => (r._1, r._2))
    val keyRows = statsDf
      .filter(col("non_unique") === 0)
      .select(col("table_schema"), col("table_name"), col("index_name"),
        col("seq_in_index").cast("long"), col("column_name"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getString(4)))
      .toSeq.groupBy(r => (r._1, r._2))
    colRows.keys.toSeq.sorted.map { case (s, t) =>
      val cols = colRows(s -> t).filterNot(_._5).sortBy(_._4).map(_._3)
      val keys = keyRows.getOrElse(s -> t, Seq.empty)
        .sortBy(r => (r._3, r._4)).map(r => (r._3, r._5))
      val info = assemble(s, t, cols, keys)
      tracker.createTable(s, t, info.columns, version)
      info
    }
  }
}
