package graft

import org.apache.spark.sql.functions._

import graft.ops._

class CdcSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle and runs non-empty at sf0.001") {
    val missingOracle =
      SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missingOracle.isEmpty, s"queries without oracle: $missingOracle")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("compaction fold algebra: I+U→I, I+D→D, U+U→U, D+I→I, last image wins") {
    import spark.implicits._
    val changes = Seq(
      // pk 1: I, U, U          -> I with last value
      (1L, 1L, "I", 10.0), (2L, 1L, "U", 11.0), (3L, 1L, "U", 12.0),
      // pk 2: I, D             -> D
      (4L, 2L, "I", 1.0), (5L, 2L, "D", 0.0),
      // pk 3: U, U             -> U, last value
      (6L, 3L, "U", 5.0), (7L, 3L, "U", 6.0),
      // pk 4: D, I             -> I
      (8L, 4L, "D", 0.0), (9L, 4L, "I", 7.0),
      // pk 5: single U         -> U
      (10L, 5L, "U", 3.0)
    ).toDF("commit_ts", "pk", "op", "value")
    val out = Cdc.compactByPk(changes)
      .select("pk", "op", "value").as[(Long, String, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("I", 12.0)))
    assert(out(2L) == (("D", 0.0)))
    assert(out(3L) == (("U", 6.0)))
    assert(out(4L) == (("I", 7.0)))
    assert(out(5L) == (("U", 3.0)))
    assert(out.size == 5, "exactly one row per key")
  }

  test("k-way merge preserves all events exactly once and watermark is min of source maxes") {
    val merged = Cdc.kwayMergeQuery(spark, sf)
    val total = graft.model.Tables.events(spark, sf).count()
    assert(merged.count() == total)
    assert(merged.select("commit_ts").distinct().count() == total)
    val wm = Cdc.watermarks(spark, sf)
    val rows = wm.collect()
    val globalWm = rows.head.getAs[Long]("global_watermark")
    assert(rows.forall(_.getAs[Long]("global_watermark") == globalWm))
    assert(globalWm == rows.map(_.getAs[Long]("source_watermark")).min)
  }

  test("pc-match: every prewrite id precedes its commit id") {
    val bad = Cdc.pcMatch(spark, sf)
      .filter(col("prewrite_id") >= col("commit_id")).count()
    assert(bad == 0)
  }

  test("repeated-skip dedups the replayed stream") {
    val df = Filters.repeatedSkip(spark, sf)
    assert(df.count() == df.select("commit_ts").distinct().count())
  }

  test("scd2 point-in-time slice equals the replayed compacted state") {
    val t = Cdc.changes(spark, sf)
      .agg(expr("percentile(commit_ts, 0.5)")).head().getDouble(0).toLong
    val asOf = Transforms.scd2(spark, sf)
      .filter(col("valid_from") <= t &&
        (col("valid_to").isNull || col("valid_to") > t))
      .select("pk", "value")
    val replayed = Cdc.compactByPk(Cdc.changes(spark, sf).filter(col("commit_ts") <= t))
      .filter(col("op") =!= "D")
      .select("pk", "value")
    assert(asOf.exceptAll(replayed).isEmpty && replayed.exceptAll(asOf).isEmpty)
  }

  test("morton key interleaves losslessly and clusters both dimensions") {
    import org.apache.spark.sql.functions._
    val z = graft.ops.Layout.zorderKey(spark, sf).collect()
    // de-interleave recovers both buckets exactly
    z.foreach { r =>
      val (xb, yb, zk) = (r.getAs[Long]("xb"), r.getAs[Long]("yb"), r.getAs[Long]("zkey"))
      var (x, y) = (0L, 0L)
      (0 until graft.ops.Layout.MortonBits).foreach { i =>
        x |= ((zk >> (2 * i)) & 1) << i
        y |= ((zk >> (2 * i + 1)) & 1) << i
      }
      assert(x == xb && y == yb, s"zkey $zk must de-interleave to ($xb,$yb)")
    }
    // locality: consecutive zkey-sorted blocks have far smaller (x,y)
    // bounding boxes than arrival-ordered blocks — the data-skipping win
    def meanBoxArea(rows: Array[(Long, Long)], blockSize: Int): Double = {
      val blocks = rows.grouped(blockSize).filter(_.length == blockSize).toSeq
      blocks.map { b =>
        val xs = b.map(_._1); val ys = b.map(_._2)
        (xs.max - xs.min + 1).toDouble * (ys.max - ys.min + 1)
      }.sum / blocks.size
    }
    val byZ = z.sortBy(_.getAs[Long]("zkey")).map(r => (r.getAs[Long]("xb"), r.getAs[Long]("yb")))
    val byArrival = z.sortBy(_.getAs[Long]("event_id")).map(r => (r.getAs[Long]("xb"), r.getAs[Long]("yb")))
    val (zArea, tArea) = (meanBoxArea(byZ, 256), meanBoxArea(byArrival, 256))
    assert(zArea * 4 < tArea,
      s"z-order blocks must be ≥4× tighter: z=$zArea arrival=$tArea")
  }

  test("compaction rewrites a fragmented directory into target-size files") {
    val in = graft.util.Scratch.dir("graft_frag")
    val out = graft.util.Scratch.dir("graft_compact")
    val df = graft.model.Tables.events(spark, sf)
    df.repartition(40).write.mode("overwrite").parquet(in)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(in) == 40, "fixture must be fragmented")
    val inBytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = inBytes / 4
    val n = graft.ops.Layout.compact(spark, in, out, target)
    assert(parquetFiles(out) == n && n <= 6,
      s"40 fragments must compact to ~4-5 files, got $n")
    assert(spark.read.parquet(out).count() == df.count())
  }

  test("bucketed tables join with zero exchanges (co-located fact join)") {
    import org.apache.spark.sql.functions._
    val warehouse = graft.util.Scratch.dir("graft_buckets")
    val li = graft.model.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .withColumnRenamed("l_orderkey", "orderkey")
    val ord = graft.model.Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "orderkey")
    graft.ops.Bucketing.writeBucketed(li, "bk_lineitem", "orderkey", 8, s"$warehouse/li")
    graft.ops.Bucketing.writeBucketed(ord, "bk_orders", "orderkey", 8, s"$warehouse/ord")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = graft.ops.Bucketing.cocolocatedJoin(spark, "bk_lineitem", "bk_orders", "orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      val expected = li.join(ord, "orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_lineitem")
      spark.sql("DROP TABLE IF EXISTS bk_orders")
    }
  }

  test("bucketized range join equals the naive between-join, any width") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val points = (0 until 200).map(i => (i.toLong, rnd.nextInt(10000).toLong))
      .toDF("pid", "ts")
    val intervals = (0 until 80).map { i =>
      val s = rnd.nextInt(9000).toLong
      (i.toLong, s, s + rnd.nextInt(2000).toLong)
    }.toDF("iid", "start", "end")
    val naive = points.crossJoin(intervals)
      .filter(col("ts") >= col("start") && col("ts") <= col("end"))
      .select("pid", "iid")
    Seq(64L, 1000L, 100000L).foreach { w =>
      val got = graft.ops.RangeJoin.bucketed(points, "ts", intervals, "start", "end", w)
        .select("pid", "iid")
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty, s"width=$w")
    }
  }

  test("scd2 property: per-key intervals are disjoint, contiguous, and brute-force-correct") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { trial =>
      val n = 1 + rnd.nextInt(40)
      val ops = (0 until n).map { i =>
        (i.toLong, 1L + rnd.nextInt(5), Seq("I", "U", "D")(rnd.nextInt(3)),
          rnd.nextDouble() * 100)
      }
      val df = ops.toDF("commit_ts", "pk", "op", "value")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("pk").orderBy("commit_ts")
      // same formulation as Transforms.scd2, applied to the synthetic frame
      val scd = df.withColumn("valid_to", lead("commit_ts", 1).over(w))
        .filter(col("op") =!= "D")
        .select("pk", "commit_ts", "valid_to", "value")
        .collect()
      // brute force: at every event time T, the visible row per key is the
      // latest non-delete event at or before T with no delete after it
      ops.map(_._1).foreach { t =>
        val visible = ops.filter(_._1 <= t).groupBy(_._2).flatMap {
          case (pk, evs) =>
            val last = evs.maxBy(_._1)
            if (last._3 == "D") None else Some(pk -> last._4)
        }
        val sliced = scd.filter(r => r.getLong(1) <= t &&
            (r.isNullAt(2) || r.getLong(2) > t))
          .map(r => r.getLong(0) -> r.getDouble(3)).toMap
        assert(sliced == visible, s"trial=$trial t=$t")
      }
    }
  }

  test("intra-txn re-interleave reconstructs original statement order") {
    // the payload recovered at statement position seq_idx must be the
    // seq_idx-th event of that txn in commit order — i.e. the join over
    // (txn, op, within-op rank) inverts the type segregation exactly
    val restored = Transforms.seqInterleave(spark, sf)
    val expected = Cdc.changes(spark, sf)
      .withColumn("txn_id", floor(col("commit_ts") / 10).cast("long"))
      .withColumn("seq_idx", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("txn_id").orderBy("commit_ts")))
      .select("txn_id", "seq_idx", "op", "commit_ts", "value")
    assert(restored.count() == expected.count())
    assert(restored.exceptAll(expected).isEmpty && expected.exceptAll(restored).isEmpty)
  }
}
