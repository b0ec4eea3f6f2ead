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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    time("warmup-scan") { Tables.documents(spark, dir).count() }
    time("toks-only") {
      Tables.documents(spark, dir)
        .select(col("doc_id"), Lex.toks(col("text")).as("toks")).count()
    }
    time("docShingles") { Dedup.docShingles(spark, dir).count() }
    time("sigs") { Dedup.minhashSignatures(spark, dir).count() }
    time("sigs-again") { Dedup.minhashSignatures(spark, dir).count() }
    time("lsh-full") { Dedup.minhashLsh(spark, dir).count() }
    time("ngram-full") { Dedup.ngramJaccard(spark, dir).count() }
    spark.stop()
  }
}
