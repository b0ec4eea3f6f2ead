package graft

import org.apache.spark.sql.functions._

import graft.ops.Causality

class CausalitySpec extends SparkSpec {

  test("conflict groups: transitively shared keys merge, disjoint keys don't") {
    val df = Causality.conflictGroups(spark, sf)
    // group labels never exceed the member id (min-label propagation)
    assert(df.filter(col("group_id") > col("pk")).count() == 0)
    // every pk maps to exactly one group
    val multi = df.groupBy("pk")
      .agg(countDistinct("group_id").as("n"))
      .filter(col("n") > 1).count()
    assert(multi == 0)
    assert(df.count() == graft.model.Tables.events(spark, sf).count())
  }

  test("unique-key node namespaces cannot alias production-sized ids") {
    // the old +1e6/+2e6 offsets aliased a pk >= 1e6 with a UK1 node,
    // silently fusing unrelated histories into one conflict group; the
    // namespaces now sit at 2^61/2^62 — any id below 2^61 (far beyond any
    // real rowid allocator) cannot cross families
    assert(graft.ops.Causality.Uk1Offset == (1L << 61))
    assert(graft.ops.Causality.Uk2Offset == (1L << 62))
    assert(graft.ops.Causality.Uk2Offset - graft.ops.Causality.Uk1Offset ==
      (1L << 61), "UK families own disjoint 2^61-wide ranges")
  }

  test("conflict groups fixpoint on a hand-built chain") {
    import spark.implicits._
    // users 1-2 share key A, users 2-3 share key B -> {1,2,3}; user 4 alone
    // encode via the operator's key model: value>300 rows carry props.k
    val events = Seq(
      (1L, 1L, "purchase", 301.0, """{"k": 7}"""),
      (2L, 2L, "purchase", 302.0, """{"k": 7}"""),
      (3L, 2L, "purchase", 303.0, """{"k": 8}"""),
      (4L, 3L, "purchase", 304.0, """{"k": 8}"""),
      (5L, 4L, "purchase", 305.0, """{"k": 9}"""),
      (6L, 5L, "view", 10.0, """{"k": 7}""")   // low value: pk-only node
    ).toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
    val dir = graft.util.Scratch.dir("causality")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Causality.conflictGroups(spark, dir)
      .select("pk", "group_id").distinct()
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(4L) == 4L)
    assert(out(5L) == 5L)
  }

  test("an update's old-image key bridges two otherwise-disjoint groups") {
    import spark.implicits._
    // pk 20 owns key 100, pk 30 owns key 200; pk 40's update moved its
    // unique key from 100 (old image) to 200 (new image) — with old+new
    // keys contributed (pkg/loader/model.go:473-512 getKeys) all three pks
    // land in one group; with new-image keys only, pk 20 stays separate.
    def keys(withOld: Boolean) = Seq(
      (1L, 20L, Some(100L), None: Option[Long], None: Option[Long], None: Option[Long]),
      (2L, 30L, Some(200L), None: Option[Long], None: Option[Long], None: Option[Long]),
      (3L, 40L, Some(200L), None: Option[Long],
        if (withOld) Some(100L) else None: Option[Long], None: Option[Long])
    ).toDF("commit_ts", "pk", "uk1_new", "uk2_new", "uk1_old", "uk2_old")

    val bridged = Causality.conflictGroupsFromKeys(keys(withOld = true))
      .select("pk", "group_id").as[(Long, Long)].collect().toMap
    assert(bridged(20L) == bridged(30L) && bridged(30L) == bridged(40L))

    val split = Causality.conflictGroupsFromKeys(keys(withOld = false))
      .select("pk", "group_id").as[(Long, Long)].collect().toMap
    assert(split(30L) == split(40L))
    assert(split(20L) != split(30L))
  }

  test("star contraction equals label propagation on an arbitrary graph") {
    import spark.implicits._
    // pseudo-random sparse graph: several components of mixed shape
    val half = (0 until 400).map { i =>
      val a = (i * 2654435761L) % 97
      val b = (i * 40503L + 7) % 97
      (a + 1, b + 1) // node ids 1..97, self-loops possible (both must drop them)
    }.toDF("src", "dst")
    val edges = half.unionByName(
      half.select(col("dst").as("src"), col("src").as("dst")))
    val prop = Causality.connectedComponents(edges.filter(col("src") =!= col("dst")))
      .as[(Long, Long)].collect().toMap
    val star = Causality.connectedComponentsStar(edges)
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
  }

  test("star contraction collapses a long chain in logarithmic rounds") {
    import spark.implicits._
    // a 600-node path: label propagation would need ~600 rounds (one per
    // hop); star contraction folds it in O(log² n)
    val chain = (0L until 599L).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = Causality.connectedComponentsStar(chain)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 600)
    assert(labels.values.forall(_ == 0L))
  }
}
