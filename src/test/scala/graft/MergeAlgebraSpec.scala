package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.MergeAlgebra
import graft.ops.MergeAlgebra.Change

class MergeAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private val genOps = for {
    n <- Gen.choose(1, 40)
    ops <- Gen.listOfN(n, for {
      pk <- Gen.choose(1L, 5L)
      op <- Gen.oneOf("I", "U", "D")
      pkChange <- Gen.frequency(9 -> false, 1 -> true)
      newPk <- if (pkChange && op == "U") Gen.choose(1L, 5L) else Gen.const(pk)
      v <- Gen.choose(0.0, 100.0)
    } yield (pk, op, newPk, v))
  } yield ops.zipWithIndex.map { case ((pk, op, newPk, v), i) =>
    Change(commitTs = i.toLong, pk = pk, newPk = newPk, op = op, value = v)
  }

  test("duplicate-ts events fold identically under every permutation and merge split") {
    // reduce and merge used to disagree on ties (strict vs inclusive
    // comparison), so at-least-once redeliveries at one commitTs folded to
    // a partitioning-dependent result; the (ts, op, value) tie-break makes
    // every fold order produce the same Compacted row
    val agg = MergeAlgebra.compact
    val cs = Seq(
      Change(3L, 1L, 1L, "I", 9.0),
      Change(5L, 1L, 1L, "I", 1.0), // tie at ts=5 with the U below
      Change(5L, 1L, 1L, "U", 2.0),
      Change(5L, 1L, 1L, "U", 2.0)) // exact duplicate (redelivery)
    val results = cs.permutations.flatMap { p =>
      (0 to p.length).map { cut =>
        val (l, r) = p.splitAt(cut)
        val a = l.foldLeft(agg.zero)(agg.reduce)
        val b = r.foldLeft(agg.zero)(agg.reduce)
        agg.finish(agg.merge(a, b))
      }
    }.toSet
    assert(results.size == 1, s"fold must be order-invariant, got $results")
  }

  test("aggregator fold == reference brute force, independent of input order") {
    val rnd = new scala.util.Random(42)
    (0 until 30).foreach { i =>
      val changes = genOps.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val expected = MergeAlgebra.bruteForce(changes)
      // shuffle to prove order-robustness (Spark gives no intra-group order)
      val shuffled = rnd.shuffle(changes.flatMap(MergeAlgebra.splitPkChange))
      val got = spark.createDataset(shuffled)
        .groupByKey(_.pk)
        .agg(MergeAlgebra.compact.toColumn)
        .collect()
        .map { case (pk, c) => pk -> ((c.op, c.value)) }
        .toMap
      assert(got == expected, s"seed=$i")
    }
  }

  test("pk-change update splits into delete(old) + insert(new)") {
    val c = Change(5L, 1L, 2L, "U", 9.0)
    val split = MergeAlgebra.splitPkChange(c)
    assert(split.map(_.op) == Seq("D", "I"))
    assert(split.head.pk == 1L && split(1).pk == 2L)
    assert(split(1).value == 9.0)
  }

  test("window-based compactByPk agrees with the aggregator on the events stream") {
    import org.apache.spark.sql.functions._
    val changes = graft.ops.Cdc.changes(spark, sf)
    val windowed = graft.ops.Cdc.compactByPk(changes)
      .select("pk", "op", "value").as[(Long, String, Double)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val typed = changes
      .select(col("commit_ts").as("commitTs"), col("pk"),
        col("pk").as("newPk"), col("op"), col("value"))
      .as[Change]
      .groupByKey(_.pk)
      .agg(MergeAlgebra.compact.toColumn)
      .collect().map { case (pk, c) => pk -> ((c.op, c.value)) }.toMap
    assert(windowed == typed)
  }
}
