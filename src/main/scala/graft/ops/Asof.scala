package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row whose timestamp is
  * ≤ the left row's timestamp.
  *
  * The reference needs exactly this shape to pick the schema version a DML
  * must be decoded against (drainer/schema.go:221-234 — newest TableInfo
  * with version ≤ the binlog's SchemaVersion, replayed up to the DML at
  * drainer/syncer.go:393-397). It is also the general tool for
  * point-in-time lookups in training-data pipelines (feature values as-of
  * an example's timestamp).
  *
  * Two physical strategies, chosen by the caller to match data shape:
  *
  *  - [[broadcastAsof]]: right side tiny (DDL/version streams are — DDL is
  *    rare and totally ordered). Broadcast non-equi join + re-aggregate.
  *    No shuffle of the big side at all; survives any left-side scale.
  *  - [[keyedAsof]]: both sides large but keyed. Union the sides and run
  *    one `last(_, ignoreNulls)` window per key — a single hash shuffle on
  *    the key, the same cost as any keyed join, no skew beyond the key
  *    distribution itself.
  */
object Asof {

  /** Right side must be small (broadcast). `leftTs`/`rightTs` name the
    * ordering columns; every right column except `rightTs` is carried.
    * The right side is projected under internal names first, so the two
    * sides may share the TS column name (a DML and a DDL stream both
    * carrying `commit_ts` — the documented pairing) without ambiguous
    * references; a carried right column that collides with a LEFT column
    * name lands under a `_right` suffix so the output stays unambiguous.
    *
    * The per-left-row reduction is a hash aggregate with `max_by`, NOT a
    * row_number window: a window partitioned on the row tag would
    * hash-shuffle and sort the ENTIRE join fan-out (each left row × its
    * matching right rows) — a multiple-of-input shuffle that contradicts
    * the no-big-side-shuffle strategy. The aggregate collapses the fan-out
    * map-side, so only ~|left| rows move (the same shape as [[maxLeq]]). */
  def broadcastAsof(left: DataFrame, right: DataFrame,
                    leftTs: String, rightTs: String): DataFrame = {
    val rCols = right.columns.filterNot(_ == rightTs).toSeq
    require(rCols.nonEmpty,
      s"right side carries no columns besides $rightTs — use maxLeq")
    // a carried right column shadowed by a left column would duplicate the
    // output name (ambiguous to select from) — carry it suffixed instead
    val outName = rCols.map(c =>
      c -> (if (left.columns.contains(c)) s"${c}_right" else c)).toMap
    require(outName.values.toSeq.distinct.size == rCols.size &&
      !outName.values.exists(left.columns.contains),
      s"cannot disambiguate right columns ${rCols.mkString(",")} against " +
        s"left columns ${left.columns.mkString(",")}")
    // a unique per-row tag, not the left columns themselves, keys the
    // post-join reduction: two identical left rows must each survive.
    val tagged = left.withColumn("__rid", monotonically_increasing_id())
    val r = right.select(col(rightTs).as("__rts") +:
      rCols.map(c => col(c).as(s"__r_$c")): _*)
    val joined = tagged.join(broadcast(r), col(leftTs) >= col("__rts"), "left")
    val best = struct(rCols.map(c => col(s"__r_$c").as(c)): _*)
    // the aggregate groups on EVERY left column (plus the tag), which
    // requires them groupable; a left frame carrying a map column falls
    // back to the per-tag window — correct on any schema, at the cost of
    // shuffling the join fan-out (the documented fast path assumes
    // orderable left columns, the overwhelmingly common shape)
    val groupable = tagged.schema.fields.forall(f =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
    if (groupable) {
      val groupCols: Seq[Column] = tagged.columns.map(col).toSeq
      joined.groupBy(groupCols: _*)
        // max_by ignores NULL ordering values (the unmatched left-join
        // rows), and an all-NULL group yields a NULL struct — left rows
        // with no match carry NULL right columns, like the window form
        .agg(max_by(best, col("__rts")).as("__best"))
        .select(groupCols ++ rCols.map(c => col(s"__best.$c").as(outName(c))): _*)
        .drop("__rid")
    } else {
      val w = Window.partitionBy(col("__rid")).orderBy(col("__rts").desc_nulls_last)
      joined
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(tagged.columns.map(col) ++
          rCols.map(c => col(s"__r_$c").as(outName(c))): _*)
        .drop("__rid")
    }
  }

  /** Both sides keyed by `key`: one shuffle, per-key ordered window. Right
    * rows become null-padded carriers; `last(ignoreNulls)` pulls the most
    * recent right payload forward onto each left row. */
  def keyedAsof(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, rightTs: String, payload: String): DataFrame = {
    // collision guards, broadcastAsof's discipline: the internal columns
    // and the payload OUTPUT would silently clobber same-named left
    // columns otherwise
    val reserved = Seq("__ts", "__side", "__p") :+ payload
    require(!reserved.exists(left.columns.contains),
      s"left frame carries a reserved/output column name " +
        s"(${reserved.filter(left.columns.contains).mkString(",")})")
    // the payload rides inside a one-field struct: the STRUCT is non-null
    // for every right row even when the payload value itself is NULL, so
    // last(ignoreNulls) anchors on "latest right ROW", not "latest
    // non-null value" — a right row legitimately carrying NULL must win
    // over an older non-null one, exactly as the DuckDB ASOF oracle does
    // (a bare nullable payload column cannot distinguish a NULL-valued
    // right row from a left carrier row)
    val pType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", right.schema(payload).dataType)))
    val l = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0))
      .withColumn("__p", lit(null).cast(pType))
    // a NULL right timestamp matches NOTHING in the ASOF contract (the
    // DuckDB oracle's `l.ts >= r.ts` never matches NULL) — unfiltered it
    // would sort first (asc nulls-first) and its payload would win for
    // every left row with no real preceding right row
    val r = right.filter(col(rightTs).isNotNull).select(
      col(key), col(rightTs).as("__ts"), lit(1).as("__side"),
      struct(col(payload).as("v")).as("__p"))
    val rPadded = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.toIndexedSeq.map(col): _*)
    // right rows sort before left rows at equal ts (__side desc) so a
    // version taking effect AT ts applies to events at the same ts.
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rPadded.unionByName(l)
      .withColumn(payload, last("__p", ignoreNulls = true).over(w).getField("v"))
      .filter(col("__side") === 0)
      .drop("__ts", "__side", "__p")
  }

  /** Driver query: point-in-time feature join — each purchase picks up the
    * value of the same user's most recent preceding click. Oracle: DuckDB's
    * native ASOF LEFT JOIN (same ≥ semantics as [[keyedAsof]]). */
  def featureAsofQuery(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ev = graft.model.Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("commit_id"),
        col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_ts"),
        col("value").as("click_value"))
    keyedAsof(purchases, clicks, "user_id", "commit_id", "click_ts", "click_value")
  }

  def featureAsofSql: String =
    """SELECT l.user_id, l.commit_id, l.purchase_value, r.click_value
      |FROM (SELECT user_id, event_id AS commit_id, value AS purchase_value
      |      FROM events WHERE event_type = 'purchase') l
      |ASOF LEFT JOIN
      |     (SELECT user_id, event_id AS click_ts, value AS click_value
      |      FROM events WHERE event_type = 'click') r
      |ON l.user_id = r.user_id AND l.commit_id >= r.click_ts""".stripMargin

  def maxLeq(left: DataFrame, right: DataFrame, leftTs: String,
             rightTs: String, as: String): DataFrame = {
    // degenerate broadcast as-of carrying only the matched timestamp:
    // aggregate form avoids the window over wide rows entirely. Grouping
    // includes a unique row tag so duplicate left rows keep cardinality.
    // The right ts projects under an internal name FIRST, so the two
    // sides may share the column name (the DML/DDL commit_ts pairing
    // broadcastAsof's require redirects here) without an ambiguous
    // reference.
    // keyedAsof's reserved-name discipline: an `as` matching an existing
    // left column would duplicate the name in the groupable branch and
    // silently clobber the left column in the window branch
    val reserved = Seq("__rid", "__rts", "__rn") :+ as
    require(!reserved.exists(left.columns.contains),
      s"left frame carries a reserved/output column name " +
        s"(${reserved.filter(left.columns.contains).mkString(",")})")
    val tagged = left.withColumn("__rid", monotonically_increasing_id())
    val joined = tagged.join(broadcast(right.select(col(rightTs).as("__rts"))),
      col(leftTs) >= col("__rts"), "left")
    // non-orderable left columns (map) cannot group — fall back to the
    // per-tag window, broadcastAsof's rule
    val groupable = tagged.schema.fields.forall(f =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
    if (groupable) {
      val groupCols: Seq[Column] = tagged.columns.map(col).toSeq
      joined.groupBy(groupCols: _*)
        .agg(max(col("__rts")).as(as))
        .drop("__rid")
    } else {
      val w = Window.partitionBy("__rid").orderBy(col("__rts").desc_nulls_last)
      joined.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .withColumn(as, col("__rts"))
        .drop("__rid", "__rn", "__rts")
    }
  }
}
