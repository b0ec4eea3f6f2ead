package graft.sinks

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K1 made real: the loader's apply path against an actual SQL engine
  * (embedded Derby, which ships on the Spark classpath), not a parquet
  * stand-in. [[UpsertSink]] remains the lake variant; this class is the
  * `foreachBatch` twin of the reference's MySQL loader:
  *
  *  - **merge by primary key** before touching the database — one DML per
  *    key per batch, newest image wins (ref: pkg/loader/executor.go:264-268
  *    `mergeByPrimaryKey`, merge.go);
  *  - **delete → insert → update ordering** across the whole batch, so a
  *    key deleted and re-inserted under a different unique value can never
  *    collide mid-apply (ref: executor.go:273-316 `execTableBatch` applies
  *    all deletes, then inserts, then updates);
  *  - **128-row statement batches** applied in parallel workers over
  *    disjoint key ranges (ref: executor.go:38 `defaultBatchSize = 128`,
  *    load.go:529-575 hash dispatch; here: repartition by pk-hash +
  *    `foreachPartition`, each partition holding its own connection);
  *  - **REPLACE semantics** for non-delete DMLs, ALWAYS, in the batched
  *    path (ref: executor.go:206-244 `bulkReplace` — the batched executor
  *    unconditionally REPLACEs, which is what makes the merge rule
  *    "delete + insert → insert" safe: merge.go:30 drops the earlier
  *    delete because REPLACE removes the pre-existing row anyway). Derby
  *    has no REPLACE INTO; the rewrite is the same one the reference
  *    itself uses — DELETE of the key then multi-VALUES INSERT inside one
  *    transaction (executor.go:407-443). Whole-batch replay is therefore
  *    idempotent by construction;
  *  - **singleExec mode** (`singleExec = true`): the reference's
  *    non-batched, non-safe statement path (executor.go:407-443 with safe
  *    mode off) — merged inserts run as plain INSERT, so a replayed batch,
  *    or a merged delete+insert on a pre-existing key, hits the engine's
  *    real duplicate-key error. That is exactly the failure the
  *    reference's post-restart safe-mode window exists to absorb; the
  *    mode exists here to prove that behavior against a real engine, not
  *    as a default anyone should run;
  *  - **checkpoint table in the target database** with the reference's
  *    savepoint fields — commitTS, schema version, consistent flag, ts-map
  *    pair — saved after each batch, loaded on restart, replayed batch ids
  *    skipped (ref: drainer/checkpoint/mysql.go:34-51,130-163).
  *
  * Scale shape: the per-batch work is one shuffle of the micro-batch (the
  * pk-hash repartition) plus JDBC round-trips proportional to the batch,
  * never to the table — the same O(batch) profile as the reference loader.
  * Swapping the URL for a real MySQL/TiDB endpoint changes nothing above
  * the driver.
  */
object JdbcUpsertSink {

  /** Oracle-checked K1 query: apply the first 20% (by commit ts) of the
    * change stream through the REAL loader path — merge-by-pk, delete-first
    * ordering, 128-row batched REPLACE statements — into a fresh
    * embedded Derby database, then read the table back over JDBC. The
    * result must hash-match DuckDB computing the same compacted state from
    * parquet, which pins the loader's semantics (and the SQL engine round
    * trip of BIGINT/DOUBLE values) under the driver's correctness gate.
    * The database is rebuilt every run; the applied slice is ts-bounded so
    * the query's cost scales with the prefix, not the corpus. */
  def stateQuery(spark: SparkSession, dir: String): DataFrame = {
    val changes = graft.ops.Cdc.changes(spark, dir)
    val maxTs = graft.ops.Cdc.maxCommitTs(changes)
    val slice = changes.filter(col("commit_ts") <= maxTs * 2 / 10)
      .select("pk", "commit_ts", "op", "value")
    // per-invocation in-memory database, reclaimed prefix-scoped (the
    // previous invocation's database is dropped here — see Scratch)
    val sink = new JdbcUpsertSink(graft.util.Scratch.derbyMemUrl("graft_k1_state"))
    sink.applyBatch(slice, batchId = 0L)
    sink.currentState(spark)
  }

  def stateSql: String =
    s"""WITH c AS (${graft.ops.Cdc.changesCte}),
       |f AS (SELECT * FROM c
       |      WHERE commit_ts <= (SELECT max(commit_ts) * 2 // 10 FROM c)),
       |r AS (SELECT pk, commit_ts, value, op,
       |        row_number() OVER (PARTITION BY pk ORDER BY commit_ts DESC) AS rn
       |      FROM f)
       |SELECT pk, commit_ts, value FROM r WHERE rn = 1 AND op <> 'D'""".stripMargin
}

class JdbcUpsertSink(url: String, stateTable: String = "GRAFT_STATE",
    batchSize: Int = 128, singleExec: Boolean = false, clusterId: Long = 1L,
    // ref: executor.go:39 defaultWorkerCount = 16 parallel connections
    applyPartitions: Int = 16) extends Serializable {

  import JdbcMeta.Checkpoint

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  /** Bootstrap state + checkpoint + ddl-log tables (ref: the loader creates
    * nothing, but the checkpoint package creates its own schema/table on
    * first use — drainer/checkpoint/mysql.go:75-84). */
  def ensureTables(): Unit = withConn { c =>
    JdbcMeta.createIfAbsent(c,
      s"CREATE TABLE $stateTable (pk BIGINT PRIMARY KEY, commit_ts BIGINT, val DOUBLE)")
    JdbcMeta.ensureMeta(c)
  }

  def lastCheckpoint: Checkpoint = withConn(JdbcMeta.load(_, clusterId))

  def lastCommitted: Long = lastCheckpoint.batchId
  def lastCommitTs: Long = lastCheckpoint.commitTs
  def lastSchemaVersion: Long = lastCheckpoint.schemaVersion

  private def saveCheckpoint(ck: Checkpoint): Unit =
    withConn(JdbcMeta.save(_, clusterId, ck))

  /** The materialized state, read back through Spark's JDBC source as a
    * PARTITIONED scan: pk bounds come from one two-value metadata query,
    * then `readPartitions` connections stride the key range in parallel —
    * the default unpartitioned JDBC read drags the whole table through a
    * single connection, which is exactly the bottleneck the loader's
    * 16-worker write side exists to avoid. Empty table → plain load. */
  def currentState(spark: SparkSession, readPartitions: Int = 16): DataFrame = {
    ensureTables()
    JdbcMeta.partitionedRead(spark, url, stateTable, Some("pk"), readPartitions)
      .select(col("PK").as("pk"), col("COMMIT_TS").as("commit_ts"),
        col("VAL").as("value"))
  }

  /** Apply one micro-batch of change rows (pk, commit_ts, op, value[, ...]).
    * Returns true if applied, false if skipped as a replay. DDL rows are
    * barriers: the batch is split at each DDL commit_ts, sub-batches apply
    * in order, and the DDL itself EXECUTES alone between them against the
    * real engine (ref: pkg/loader/load.go:845-866 — DDL flushes pending
    * DML, then runs by itself; a failed DDL halts the load). The statement
    * text rides in an optional `ddl_sql` string column on the DDL row
    * (already rewritten to the target dialect — M8's job); DDL rows
    * without it are barrier-only, recorded but not executed. */
  def applyBatch(batch0: DataFrame, batchId: Long, schemaVersion: Long = -1L): Boolean = {
    ensureTables()
    val prev = lastCheckpoint
    if (batchId <= prev.batchId) return false // idempotent replay skip
    // pinned: the DDL collect, each barrier slice's emptiness probe, and
    // each slice's merge would otherwise re-run the caller's full lineage
    // 3+2k times — UpsertSink.applyBatch and applyToJdbcTables persist for
    // exactly this reason; this was the one unpinned apply path
    val batch = batch0.persist()
    try {

    val hasDdlSql = batch.columns.contains("ddl_sql")
    val ddls = batch.filter(col("op") === "DDL")
      .select(col("commit_ts"),
        (if (hasDdlSql) col("ddl_sql") else lit(null).cast("string")).as("ddl_sql"))
      .collect()
    val barriers = ddls.map(r =>
        (r.getAs[Long]("commit_ts"), Option(r.getAs[String]("ddl_sql"))))
      .sortBy(_._1) :+ ((Long.MaxValue, None: Option[String]))
    var lower = Long.MinValue
    var maxTs = prev.commitTs
    barriers.foreach { case (upper, stmt) =>
      val slice = batch.filter(col("op") =!= "DDL" &&
        col("commit_ts") > lower && col("commit_ts") <= upper)
      maxTs = math.max(maxTs, applySlice(slice))
      if (upper != Long.MaxValue) {
        withConn { c =>
          // skip a barrier this batch already executed AND logged: a crash
          // between a DDL and the checkpoint save replays the batch, and
          // re-running the ALTER would throw and wedge every retry (same
          // guard as JdbcSchemaLoader.applyBatch). Otherwise execute alone,
          // then log; an exception propagates and leaves the checkpoint at
          // the previous batch — replay re-runs from the barrier.
          if (!JdbcMeta.ddlLogged(c, batchId, upper, stmt.getOrElse(s"ddl@$upper"))) {
            stmt.foreach { sql =>
              val st = c.createStatement()
              try st.execute(sql) finally st.close()
            }
            JdbcMeta.logDdl(c, batchId, upper, stmt.getOrElse(s"ddl@$upper"))
          }
        }
        maxTs = math.max(maxTs, upper)
      }
      lower = upper
    }
    val version = math.max(schemaVersion, prev.schemaVersion)
    saveCheckpoint(Checkpoint(batchId, maxTs, version, consistent = true))
    true
    } finally { batch.unpersist(); () }
  }

  /** Returns the slice's max applied commit_ts (Long.MinValue when empty),
    * computed with the emptiness check in ONE aggregate over the
    * checkpointed merged frame — the caller's checkpoint watermark costs
    * no second pass over the raw batch lineage (same shape as
    * JdbcSchemaLoader.applyTable). */
  private def applySlice(slice: DataFrame): Long = {
    // cheap early exit (a limit-1 job): empty slices — e.g. the sub-batch
    // before a leading DDL barrier — must not pay the window + repartition
    // + eager checkpoint machinery below just to count zero rows
    if (slice.isEmpty) return Long.MinValue
    // merge by PK: one DML per key, newest image wins; classify the merged
    // DML by its final op (ref: pkg/loader/merge.go — the merged type is
    // what execTableBatch groups on). Same-ts ties break DETERMINISTICALLY
    // like UpsertSink.mergeSlice: TiDB stamps a whole txn with one commit
    // ts, so the T9 seq (when the frame carries it) picks the txn's net
    // effect, else D outranks U outranks I — row_number over a bare ts
    // order would pick a shuffle-dependent winner and break replay
    // idempotence
    val hasSeq = slice.columns.contains("seq")
    val seqOrder = if (hasSeq)
      Seq(coalesce(col("seq"), lit(Long.MinValue)).desc) else Nil
    val opRank = when(col("op") === "D", 2)
      .when(col("op") === "U", 1).otherwise(0)
    val w = Window.partitionBy("pk")
      .orderBy(col("commit_ts").desc +: seqOrder :+ opRank.desc: _*)
    val merged = slice
      .select(("pk" +: "commit_ts" +: "op" +: "value" +:
        (if (hasSeq) Seq("seq") else Nil)).map(col): _*)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "seq")
      // disjoint key ranges per worker — the loader's causality-free hash
      // dispatch (load.go:529-575); partitions never contend on a key
      .repartition(applyPartitions, col("pk"))
      .localCheckpoint(true) // applied twice (delete pass, upsert pass)
    // the merged max equals the slice max: each pk's newest row survives,
    // so the row holding the global max commit_ts is always kept
    val stats = merged.agg(count(lit(1)), max("commit_ts")).collect()(0)
    if (stats.getLong(0) == 0L) return Long.MinValue
    val sliceMaxTs = stats.getLong(1)

    // capture locals, not `this`-bound config lookups, inside the closures
    val (u, tbl, bs, single) = (url, stateTable, batchSize, singleExec)

    // pass 1: ALL deletes, whole batch, before any insert/update
    merged.filter(col("op") === "D").foreachPartition {
      rows: Iterator[org.apache.spark.sql.Row] =>
        val c = DriverManager.getConnection(u)
        try {
          c.setAutoCommit(false)
          val del = c.prepareStatement(s"DELETE FROM $tbl WHERE pk = ?")
          rows.grouped(bs).foreach { chunk =>
            chunk.foreach { r => del.setLong(1, r.getAs[Long]("pk")); del.addBatch() }
            del.executeBatch()
            c.commit()
          }
          del.close()
        } finally {
          // Derby refuses to close with an open (even no-op) transaction
          try c.rollback() catch { case _: SQLException => () }
          c.close()
        }
    }

    // pass 2: inserts and updates as 128-row multi-VALUES statements, all
    // with REPLACE semantics (delete+insert txn) — the batched executor
    // REPLACEs unconditionally (executor.go:206-244 bulkReplace), which is
    // what makes the merge rule "delete + insert -> insert" safe on a
    // pre-existing key. singleExec mode applies merged inserts as plain
    // INSERT instead (the reference's non-batched non-safe statement path).
    merged.filter(col("op") =!= "D").foreachPartition {
      rows: Iterator[org.apache.spark.sql.Row] =>
        val c = DriverManager.getConnection(u)
        try {
          c.setAutoCommit(false)
          rows.grouped(bs).foreach { chunk =>
            val needsDelete =
              if (single) chunk.filter(_.getAs[String]("op") != "I") else chunk
            if (needsDelete.nonEmpty) {
              val del = c.prepareStatement(s"DELETE FROM $tbl WHERE pk = ?")
              needsDelete.foreach { r =>
                del.setLong(1, r.getAs[Long]("pk")); del.addBatch()
              }
              del.executeBatch(); del.close()
            }
            val holders = Seq.fill(chunk.size)("(?, ?, ?)").mkString(", ")
            // explicit column list (ref: executor.go:210 buildColumnList):
            // a positional VALUES breaks the moment a DDL barrier widens
            // the table mid-stream
            val ins = c.prepareStatement(
              s"INSERT INTO $tbl (pk, commit_ts, val) VALUES $holders")
            chunk.zipWithIndex.foreach { case (r, i) =>
              ins.setLong(3 * i + 1, r.getAs[Long]("pk"))
              ins.setLong(3 * i + 2, r.getAs[Long]("commit_ts"))
              // null-safe bind: a NULL value column must become SQL NULL,
              // not a primitive-unboxing crash (ref: the loader binds every
              // datum nullable — model.go:253-257 handles NULL explicitly)
              val vIdx = r.fieldIndex("value")
              if (r.isNullAt(vIdx)) ins.setNull(3 * i + 3, java.sql.Types.DOUBLE)
              else ins.setDouble(3 * i + 3, r.getDouble(vIdx))
            }
            ins.executeUpdate(); ins.close()
            c.commit() // one txn per 128-row chunk, like one executed batch
          }
        } finally {
          try c.rollback() catch { case _: SQLException => () }
          c.close()
        }
    }
    sliceMaxTs
  }
}
