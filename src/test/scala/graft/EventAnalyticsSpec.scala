package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.ops.EventAnalytics
import graft.sketch.Sketches

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("funnel stages shrink monotonically and respect stage order") {
    val rows = EventAnalytics.funnel(spark, sf)
      .orderBy("stage").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_view", "2_click", "3_purchase"))
    val ns = rows.map(_.getLong(1))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), s"funnel must narrow: ${ns.toSeq}")
    assert(rows.head.getDouble(2) == 1.0, "stage 1 converts from itself")
  }

  test("funnel conversion windows bind: shrinking the window cannot grow a stage") {
    // direct consequence of the min-aggregate + window predicate shape;
    // guarded here via the public query on the test SF
    val n2 = EventAnalytics.funnel(spark, sf)
      .filter(col("stage") === "2_click").head().getLong(1)
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("us").as("t_view"))
    val unbounded = ev.filter(col("event_type") === "click")
      .join(v, "user_id").where(col("us") >= col("t_view"))
      .select("user_id").distinct().count()
    assert(n2 <= unbounded)
  }

  test("cohort retention: offset-0 cell equals cohort size, actives never exceed it") {
    val df = EventAnalytics.cohortRetention(spark, sf).collect()
    val base = df.filter(_.getLong(1) == 0L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    df.foreach { r =>
      val cohort = r.getLong(0)
      assert(r.getLong(2) <= base(cohort),
        s"week ${r.getLong(1)} of cohort $cohort exceeds its base")
    }
  }

  test("anomaly stats are exact: integer moments reproduce a direct computation") {
    val got = EventAnalytics.anomaly(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(4))).toMap
    val ev = graft.model.Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value") * 10000).cast("long").as("q"))
      .as[(String, Long)].collect()
    ev.groupBy(_._1).foreach { case (et, rows) =>
      val qs = rows.map(_._2)
      val n = qs.length.toLong
      val s1 = qs.sum
      val s2 = qs.map(q => q * q).sum
      val mean = s1.toDouble / n
      val variance = s2.toDouble / n - mean * mean
      val (gn, gmean, ganom) = got(et)
      assert(gn == n)
      assert(math.abs(gmean - mean / 1e4) < 1e-3)
      val anomalies = qs.count(q => (q - mean) * (q - mean) > 9.0 * variance)
      assert(ganom == anomalies, s"$et anomaly count")
    }
  }

  test("hopping windows: every event lands in exactly size/hop windows") {
    val total = EventAnalytics.hoppingWindow(spark, sf)
      .agg(sum("n_events")).head().getLong(0)
    val nEvents = graft.model.Tables.events(spark, sf).count()
    assert(total == 2 * nEvents, "1h windows hopping 30min → 2 windows per event")
  }

  test("kmv: exact strata report exactly, estimated strata within 3/sqrt(k)") {
    val rows = Sketches.kmvDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, est, err) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      if (n < Sketches.KmvK) assert(est == n.toDouble, s"${r.getString(0)} small stratum must be exact")
      else assert(math.abs(err) <= 3.0 / math.sqrt(Sketches.KmvK.toDouble),
        s"${r.getString(0)} rel_err $err out of bound")
    }
  }

  test("substring spans: planted 8-gram duplication is found, ratio bounded") {
    val df = Dedup.substringSpans(spark, sf).collect()
    df.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_dup <= n_pos")
      val ratio = r.getDouble(3)
      assert(ratio > 0.0 && ratio <= 1.0)
    }
    // the synthetic corpus repeats whole template sentences across docs, so
    // at least one doc is fully covered by shared 8-grams (checked against
    // the DuckDB oracle on this corpus)
    val hasFull = df.exists(_.getDouble(3) == 1.0)
    assert(hasFull, "a fully-duplicated doc must appear with dup_ratio = 1.0")
  }

  test("transition matrix: rows are a distribution, _start mass = user count") {
    import org.apache.spark.sql.functions._
    val t = graft.ops.EventAnalytics.transitions(spark, sf).collect()
    // per prev state the probabilities sum to 1 (within rounding slack)
    t.groupBy(_.getString(0)).foreach { case (prev, rows) =>
      val s = rows.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 0.01, s"P(next|$prev) must sum to 1, got $s")
    }
    // every user's first event leaves the _start pseudo-state exactly once
    val startMass = t.filter(_.getString(0) == "_start").map(_.getLong(2)).sum
    val users = graft.model.Tables.events(spark, sf)
      .select(countDistinct("user_id")).head.getLong(0)
    assert(startMass == users)
    // total transition count equals total events (each event is a 'next' once)
    assert(t.map(_.getLong(2)).sum ==
      graft.model.Tables.events(spark, sf).count())
  }

  test("anomaly DECIMAL(38,0) scale variant is bit-identical to the int64 query") {
    // the documented 100 TB overflow path, mechanically checked: wide sums
    // must change nothing at a scale where both representations are exact
    val narrow = graft.ops.EventAnalytics.anomaly(spark, sf).collect().toSeq
    val wide = graft.ops.EventAnalytics.anomalyWide(spark, sf).collect().toSeq
    assert(narrow.nonEmpty && narrow == wide)
  }
}
