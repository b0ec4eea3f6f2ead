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
    val dir = java.nio.file.Files.createTempDirectory("causality").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Causality.conflictGroups(spark, dir)
      .select("pk", "group_id").distinct()
      .as[(Long, Long)].collect().toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(4L) == 4L)
    assert(out(5L) == 5L)
  }
}
