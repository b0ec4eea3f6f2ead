package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.MetaFs

/** The ONE same-commit-ts tie-break every sink merge window composes (ref:
  * drainer/translator/sequence_iterator.go:32-70 statement order within a
  * txn; pkg/loader/merge.go:79-133 fold order). TiDB stamps a whole txn
  * with one commit ts, so a batch can carry several same-(key, ts) rows;
  * a window ordered by the bare ts picks a SHUFFLE-DEPENDENT winner and
  * breaks replay idempotence — the r17/r18 drift class this helper exists
  * to end. The full order, highest wins:
  *
  *   (commit_ts, seq', opRank, payload)
  *
  *  - `seq'`: the T9 intra-txn sequence when the frame carries one. Nulls
  *    coalesce to [[NullSeq]] (`Long.MinValue + 1`) — above [[MaterializedSeq]]
  *    (`Long.MinValue`, reserved for already-MATERIALIZED state rows that
  *    re-enter a merge window), below any real statement sequence;
  *  - `opRank`: D outranks U outranks I — the net effect of the common
  *    same-ts chains (I→U, I→D, U→D) without a seq;
  *  - payload columns (`desc_nulls_last` each): pins the winner between
  *    rows identical in (key, ts, seq, op) — an upstream anomaly or an
  *    at-least-once duplicate — to a DETERMINISTIC image.
  *
  * History-order (ascending) windows use the same keys with `.asc` /
  * `asc_nulls_first`, which makes the LAST element of the chain the same
  * row this order's first element is under `desc`. */
private[graft] object MergeOrder {
  import org.apache.spark.sql.Column

  /** Seq sentinel for materialized state rows: below every incoming row. */
  val MaterializedSeq: Long = Long.MinValue
  private val NullSeq: Long = Long.MinValue + 1

  /** The frame's seq with nulls ranked just above materialized rows. */
  def seqKey: Column = coalesce(col("seq"), lit(NullSeq))

  /** D > U > I at a tied (key, commit_ts, seq). */
  def opRank: Column =
    when(col("op") === "D", 2).when(col("op") === "U", 1).otherwise(0)
}

/** Idempotent, checkpointed upsert sink — the `foreachBatch` twin of the
  * reference loader (ref: pkg/loader/load.go:637-703 batch manager;
  * executor.go:407-443 safe-mode INSERT→REPLACE/UPDATE→DELETE+REPLACE;
  * drainer/checkpoint commitTs checkpointing; load.go:845-866 DDL as a
  * batch barrier).
  *
  * Semantics:
  *  - each micro-batch is compacted per key (merge-by-PK) and merged into
  *    the materialized state: last image wins, a final D removes the key —
  *    i.e. REPLACE-semantics apply, idempotent under whole-batch replay;
  *  - the committed batchId is persisted with the state and replayed
  *    batches are skipped — exactly-once effect on top of an at-least-once
  *    stream (the reference gets this from checkpoint commitTs + safe mode);
  *  - DDL rows act as barriers: the batch is split at each DDL, sub-batches
  *    apply in order with the DDL recorded between them (mirrors the
  *    loader's flush-then-execute-alone rule).
  *
  * The parquet-directory "table" stands in for the JDBC target; on a real
  * cluster the same logic runs against MERGE INTO / rewriteBatchedStatements.
  * Every metadata and state-swap operation goes through the Hadoop
  * `FileSystem` of the root's URI ([[graft.util.MetaFs]]), so the root may
  * be a `file:`-, `hdfs:`- or object-store path — the checkpoint marker and
  * the bucket swap work wherever the state lives.
  *
  * State layout is the production shape, not a flat file: the materialized
  * table is hash-partitioned into `nBuckets` directories by
  * `pmod(hash(pk), nBuckets)` — the parquet analog of the target table's
  * key-hash distribution. A micro-batch first computes the bucket set it
  * touches (bounded by nBuckets, a metadata-sized collect), reads ONLY those
  * buckets back (partition pruning skips the rest at the file listing), and
  * rewrites ONLY those bucket directories. Per-batch work is therefore
  * O(batch + touched-state), not O(total-state): with 2^12 buckets at 100 TB
  * a skewless batch touching 1% of keys reads/writes ~1% of the table. This
  * is exactly the work profile of `MERGE INTO` on a clustered target or of
  * dynamic-partition-overwrite on a lakehouse table — swap the directory
  * move for the engine's commit and nothing else changes.
  */
class UpsertSink(root: String, nBuckets: Int = 16) {
  private val statePath = s"$root/state"
  private val metaPath = s"$root/_committed_batch"
  // one marker file per DDL barrier (append-free: object stores and
  // ChecksumFileSystem have no usable append) — the name orders by
  // (batchId, ddl commit ts), the content repeats it for auditability
  private val ddlLogDir = s"$root/_ddl_log"

  /** Checkpoint record (ref: drainer/checkpoint/mysql.go:34-51 — the saved
    * point carries commitTS + ts-map + schema-version + consistent flag,
    * not just a batch counter). `batchId` doubles as the downstream half of
    * the ts-map pair: (commitTs upstream ↔ batchId downstream) is what PITR
    * needs to align the two histories. */
  case class Checkpoint(batchId: Long, commitTs: Long, schemaVersion: Long,
      consistent: Boolean)

  def lastCheckpoint: Checkpoint =
    if (MetaFs.exists(metaPath)) {
      // MetaFs.writeString makes a torn marker unreachable by construction;
      // a parse failure therefore means external corruption — name the file
      // instead of wedging every restart on a bare NumberFormatException
      try MetaFs.readString(metaPath).trim.split(' ') match {
        case Array(b, ts, v, c) => Checkpoint(b.toLong, ts.toLong, v.toLong, c.toBoolean)
        case Array(b)           => Checkpoint(b.toLong, -1L, -1L, consistent = true)
        // a wrong token count is external corruption like a garbage field
        // — resetting to batchId=-1 here would silently disable the
        // replay-skip guard and move the resume position to the origin
        case parts => throw new IllegalArgumentException(
          s"${parts.length} fields where 1 or 4 expected")
      } catch {
        // IllegalArgumentException covers both the numeric fields (NFE is
        // its subclass) and a corrupt boolean field (`toBoolean` throws
        // the parent directly)
        case e: IllegalArgumentException => throw new IllegalStateException(
          s"corrupt checkpoint marker $metaPath — delete it to force an " +
            "idempotent replay of the last batch", e)
      }
    } else Checkpoint(-1L, -1L, -1L, consistent = true)

  def lastCommitted: Long = lastCheckpoint.batchId

  /** Highest upstream commit ts durably applied — the resume position for a
    * ts-addressed source replay (ref: drainer restarts from checkpoint
    * CommitTS, not from a batch counter). */
  def lastCommitTs: Long = lastCheckpoint.commitTs

  def lastSchemaVersion: Long = lastCheckpoint.schemaVersion

  private def bucketOf(pk: org.apache.spark.sql.Column) =
    pmod(xxhash64(pk), lit(nBuckets)).cast("int")

  // the bucket modulus is part of the ON-DISK layout: reopening an
  // existing state with a different nBuckets would route keys to the
  // wrong directories (pruned reads miss their real bucket, writes land
  // a second copy elsewhere) with no error — pin it beside the
  // checkpoint and fail loudly on mismatch
  private val layoutPath = s"$root/_n_buckets"
  private def checkLayout(): Unit =
    if (MetaFs.exists(layoutPath)) {
      val n = MetaFs.readString(layoutPath).trim.toInt
      require(n == nBuckets,
        s"state at $root is laid out with $n buckets; reopening with " +
          s"$nBuckets would split keys across mismatched directories — " +
          "rebucket (read + rewrite) or recreate the state")
    } else MetaFs.writeString(layoutPath, s"$nBuckets\n")

  private def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pk", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("commit_ts", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType))))

  /** Roll back (or finish) a bucket swap a crash interrupted. The swap
    * sequence is vacate(dst→old) then promote(src→dst) then delete(old); a
    * crash between the renames leaves the ONLY copy of the bucket at `old`
    * with `dst` missing — restore it, or the replayed batch would merge
    * into an empty bucket and silently lose every pre-existing key. A
    * leftover `old` WITH `dst` present means the promote succeeded and only
    * the final delete was lost — drop the stale copy. */
  private def healBucket(b: String): Unit = {
    val old = s"$root/bucket_old=$b"
    if (MetaFs.exists(old)) {
      val dst = s"$statePath/bucket=$b"
      if (!MetaFs.exists(dst)) MetaFs.rename(old, dst)
      else MetaFs.delete(old)
    }
  }

  /** At most one bucket can be half-swapped (the swap loop is sequential),
    * but the old names are deterministic per bucket, so healing is one
    * directory listing — run before any state read. */
  private def healHalfSwaps(): Unit =
    MetaFs.listNames(root).filter(_.startsWith("bucket_old="))
      .foreach(n => healBucket(n.stripPrefix("bucket_old=")))

  def currentState(spark: SparkSession): DataFrame = {
    healHalfSwaps()
    // bucket-dir presence, not statePath presence: a state whose every
    // key was deleted keeps the (empty) state dir but no bucket dirs —
    // a parquet read of that throws schema-inference instead of empty
    val hasBuckets = MetaFs.exists(statePath) &&
      MetaFs.listNames(statePath).exists(_.startsWith("bucket="))
    if (hasBuckets)
      spark.read.option("basePath", statePath).parquet(statePath)
        .select("pk", "commit_ts", "value")
    else emptyState(spark)
  }

  /** The state rows of a bucket subset — a partition-pruned read: only the
    * named bucket directories are listed and scanned. */
  private def stateForBuckets(spark: SparkSession, buckets: Seq[Int]): DataFrame = {
    val existing = buckets.map(b => s"$statePath/bucket=$b")
      .filter(MetaFs.exists)
    // keep the partition column the pruned read provides: re-hashing
    // existing rows per batch is wasted work, and rows staying in the
    // directory they were read from holds by construction
    if (existing.isEmpty) emptyState(spark).withColumn("bucket", lit(0))
    else spark.read.option("basePath", statePath).parquet(existing: _*)
      .select(col("pk"), col("commit_ts"), col("value"),
        col("bucket").cast("int").as("bucket"))
  }

  /** Apply one micro-batch of change rows (pk, commit_ts, op, value[, ddl]).
    * Returns true if applied, false if skipped as a replay. On success the
    * checkpoint advances to (batchId, max applied commit_ts, schemaVersion,
    * consistent=true) in one marker write — a crash mid-apply leaves the
    * previous checkpoint, and whole-batch replay is idempotent. */
  def applyBatch(batch0: DataFrame, batchId: Long, schemaVersion: Long = -1L): Boolean = {
    val prev = lastCheckpoint // one marker read serves guard + fallbacks
    if (batchId <= prev.batchId) return false // idempotent replay skip
    checkLayout()
    healHalfSwaps() // a crash mid-swap must be rolled back BEFORE state reads
    val spark = batch0.sparkSession
    // pinned: the barrier collect, one filter-scan per slice, and the max
    // agg would otherwise re-run the source scan 3+k times (the
    // applyToJdbcTables rationale)
    val batch = batch0.persist()
    try {
      // DDL barrier: order sub-batches around DDL rows by commit_ts.
      // DISTINCT: several DDLs sharing one commit ts (one upstream txn's
      // jobs) are ONE barrier — duplicate ts values would write the same
      // marker name twice and slice nothing in between
      val barriers = batch.filter(col("op") === "DDL")
        .select("commit_ts").distinct()
        .collect().map(_.getLong(0)).sorted :+ Long.MaxValue
      var lower = Long.MinValue
      barriers.foreach { upper =>
        val slice = batch.filter(col("op") =!= "DDL" &&
          col("commit_ts") > lower && col("commit_ts") <= upper)
        mergeSlice(spark, slice)
        if (upper != Long.MaxValue) {
          // the log was a single append-file before it became a marker
          // directory: a pre-existing file under the name must step aside,
          // not wedge mkdirs on its first post-upgrade DDL batch
          if (MetaFs.exists(ddlLogDir) && !MetaFs.isDirectory(ddlLogDir))
            MetaFs.rename(ddlLogDir, s"$ddlLogDir.v1")
          MetaFs.mkdirs(ddlLogDir)
          MetaFs.writeString(f"$ddlLogDir/$batchId%020d-$upper%020d", s"$batchId:$upper\n")
        }
        lower = upper
      }
      val maxTsRow = batch.agg(max("commit_ts")).collect()(0)
      val maxTs = if (maxTsRow.isNullAt(0)) prev.commitTs else maxTsRow.getLong(0)
      val version = if (schemaVersion >= 0) schemaVersion else prev.schemaVersion
      MetaFs.writeString(metaPath,
        s"$batchId ${math.max(maxTs, prev.commitTs)} $version true")
      true
    } finally { batch.unpersist(); () }
  }

  private def mergeSlice(spark: SparkSession, slice: DataFrame): Unit = {
    if (slice.isEmpty) return
    // a frame carrying the T9 intra-txn sequence resolves same-ts chains
    // by STATEMENT ORDER (ref: drainer/translator/sequence_iterator.go:
    // 32-70 + pkg/loader/merge.go:79-133) — the highest seq at a ts is
    // the txn's net effect, so a same-ts delete-then-reinsert lands the
    // reinsert; without seq the D>U>I tie-break below stands
    val hasSeq = slice.columns.contains("seq")
    val cols = Seq("pk", "commit_ts", "op", "value") ++
      (if (hasSeq) Seq("seq") else Nil)
    val incoming = slice.select(cols.map(col): _*)
      .withColumn("bucket", bucketOf(col("pk")))
      .localCheckpoint(true) // read twice (bucket set + merge); cut the lineage
    // the touched-bucket set: ≤ nBuckets values, a metadata-sized collect
    val touched = incoming.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    val existing0 = stateForBuckets(spark, touched)
      .withColumn("op", lit("I")) // materialized rows behave as inserts
    // materialized rows sit BELOW every sequenced statement at their ts
    val existing = if (hasSeq)
      existing0.withColumn("seq", lit(MergeOrder.MaterializedSeq)) else existing0
    // same-ts ties broken by the ONE shared order ([[MergeOrder]]): the T9
    // seq when carried (the only resolver of a within-txn
    // delete-then-reinsert), else D>U>I net effect, then the payload
    val seqOrder = if (hasSeq) Seq(MergeOrder.seqKey.desc) else Nil
    val w = Window.partitionBy("pk")
      .orderBy(col("commit_ts").desc +: seqOrder :+ MergeOrder.opRank.desc :+
        col("value").desc_nulls_last: _*)
    val next = existing
      .unionByName(incoming)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D") // delete suppression
      .select("pk", "commit_ts", "value", "bucket")
    // rewrite ONLY the touched buckets: dynamic-partition-overwrite semantics
    // via a staging write + per-bucket directory swap (the parquet analog of
    // MERGE INTO; untouched buckets are never read, listed, or moved)
    val tmp = s"$root/state_tmp"
    MetaFs.delete(tmp)
    next.write.partitionBy("bucket").mode("overwrite").parquet(tmp)
    MetaFs.mkdirs(statePath)
    touched.foreach { b =>
      val src = s"$tmp/bucket=$b"
      val dst = s"$statePath/bucket=$b"
      val old = s"$root/bucket_old=$b"
      // self-healing vacate-then-promote: Hadoop rename moves a source INTO
      // an existing destination directory instead of replacing it, so the
      // old bucket must step aside first; the aside name is deterministic
      // per bucket and the old copy is deleted only AFTER the promote, so a
      // crash at ANY point leaves a state healBucket can roll back or
      // finish on replay. A bucket whose keys all deleted writes no staging
      // dir and simply ends vacated.
      healBucket(b.toString) // never vacate INTO a leftover old
      if (MetaFs.exists(dst)) MetaFs.rename(dst, old)
      if (MetaFs.exists(src)) MetaFs.rename(src, dst)
      MetaFs.delete(old)
    }
    MetaFs.delete(tmp)
  }
}
