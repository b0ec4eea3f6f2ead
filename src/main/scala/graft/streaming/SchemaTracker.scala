package graft.streaming

/** Versioned schema catalog derived from the DDL stream
  * (ref: drainer/schema.go:43-62 keeps tableIDToName/schemas plus a
  * per-table history of TableInfo keyed by SchemaVersion, last two versions
  * retained at schema.go:211-234; DDL jobs are replayed up to each DML's
  * SchemaVersion at schema.go:293-331; handleDDL at schema.go:360-561
  * implements create/drop/rename/truncate/recover).
  *
  * In the Spark engine this is driver-side state consulted inside
  * `foreachBatch` (and broadcast to executors when decode needs it): DDL is
  * rare and totally ordered, so a single-writer catalog is not a
  * bottleneck — the per-row work (decode against a version) happens
  * distributed, against an immutable snapshot of this map.
  */
class SchemaTracker(historyDepth: Int = 2) {

  case class TableInfo(schema: String, table: String, columns: Vector[String], version: Long)

  private var byName = Map.empty[(String, String), Vector[TableInfo]]
  private var currentVersion = 0L

  def version: Long = currentVersion

  private def push(key: (String, String), info: TableInfo): Unit = {
    val hist = byName.getOrElse(key, Vector.empty) :+ info
    byName += key -> hist.takeRight(historyDepth)
  }

  def createTable(schema: String, table: String, columns: Seq[String], version: Long): Unit = {
    currentVersion = version
    push((schema, table), TableInfo(schema, table, columns.toVector, version))
  }

  def addColumn(schema: String, table: String, column: String, version: Long): Unit = {
    currentVersion = version
    val key = (schema, table)
    val cur = current(schema, table).getOrElse(
      throw new NoSuchElementException(s"$schema.$table"))
    push(key, cur.copy(columns = cur.columns :+ column, version = version))
  }

  def dropColumn(schema: String, table: String, column: String, version: Long): Unit = {
    currentVersion = version
    val cur = current(schema, table).getOrElse(
      throw new NoSuchElementException(s"$schema.$table"))
    push((schema, table), cur.copy(columns = cur.columns.filterNot(_ == column), version = version))
  }

  /** rename keeps history under the new name (ref: schema.go renameTable). */
  def renameTable(schema: String, from: String, to: String, version: Long): Unit = {
    currentVersion = version
    val hist = byName.getOrElse((schema, from), Vector.empty)
    byName -= ((schema, from))
    byName += (schema, to) -> hist.map(i => i.copy(table = to, version = version))
  }

  /** truncate resets the table identity but not its shape. */
  def truncateTable(schema: String, table: String, version: Long): Unit = {
    currentVersion = version
    current(schema, table).foreach(i => push((schema, table), i.copy(version = version)))
  }

  def dropTable(schema: String, table: String, version: Long): Unit = {
    currentVersion = version
    byName -= ((schema, table))
  }

  def current(schema: String, table: String): Option[TableInfo] =
    byName.get((schema, table)).flatMap(_.lastOption)

  /** Schema valid at a DML's SchemaVersion: the newest entry whose version
    * is ≤ the requested one (ref: schema.go:221-234). */
  def atVersion(schema: String, table: String, version: Long): Option[TableInfo] =
    byName.get((schema, table)).flatMap(_.reverse.find(_.version <= version))
}
