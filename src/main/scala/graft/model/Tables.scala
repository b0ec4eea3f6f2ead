package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All operators take the scale-factor directory as a parameter so the same
  * plan runs unchanged from sf0.001 smoke tests to a 100 TB lake: the reads
  * are plain columnar scans and every downstream projection/filter is
  * declarative, so Catalyst pushes predicates and prunes columns into the
  * parquet reader regardless of data size.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Driver-written timestamps (`events.ts` is timestamp[us]) carry no UTC
    // flag; Spark 4 would infer TIMESTAMP_NTZ, a type unix_micros/window
    // reject. Read them as plain TIMESTAMP — the stored micros pass through
    // unchanged (no tz conversion happens on read), matching DuckDB's view.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
