package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.model.Tables
import graft.text.Lex

// scratch profiling harness — not part of the driver contract
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    time("warmup-scan") { Tables.documents(spark, dir).count() }
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(Lex.toks(col("text")))).as("tok"))
      .select(col("doc_id"), Lex.hex8(col("tok")).as("h1"), Lex.hex8b(col("tok")).as("h2"))
    time("tok-hashes") { tok.count() }
    time("packed-agg-only") {
      def packed(h: org.apache.spark.sql.Column, prefix: String) =
        (0 until 8).map { k =>
          val term = (0 until 4).map { l =>
            shiftright(h, 4 * k + l).bitwiseAND(lit(1L)) * lit(1L << (16 * l))
          }.reduce(_ + _)
          sum(term).as(s"$prefix$k")
        }
      tok.groupBy("doc_id")
        .agg(count(lit(1)).as("n"), (packed(col("h1"), "a") ++ packed(col("h2"), "b")): _*)
        .count()
    }
    time("simhash32") { Dedup.simhash(spark, dir).count() }
    time("simhash64") { Dedup.simhash64(spark, dir).count() }
    time("simhash64-again") { Dedup.simhash64(spark, dir).count() }
    time("simhashNear-full") { Dedup.simhashNear(spark, dir).count() }
    time("simhashNear-again") { Dedup.simhashNear(spark, dir).count() }
    spark.stop()
  }
}
