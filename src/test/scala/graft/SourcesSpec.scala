package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

import graft.sources.InfoSchema
import graft.streaming.CdcStream

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("info-schema catalog read: writable columns, PRIMARY-first unique keys (S8)") {
    val columns = Seq(
      ("app", "events", "pk", 1, ""),
      ("app", "events", "value", 2, ""),
      ("app", "events", "gen_col", 3, "VIRTUAL GENERATED"),
      ("app", "events", "k", 4, ""),
      ("app", "users", "id", 1, "")
    ).toDF("table_schema", "table_name", "column_name", "ordinal_position", "extra")
    val stats = Seq(
      ("app", "events", "uk_k", 0, 1, "k"),
      ("app", "events", "PRIMARY", 0, 1, "pk"),
      ("app", "events", "idx_value", 1, 1, "value"), // non-unique: not a key
      ("app", "users", "PRIMARY", 0, 1, "id")
    ).toDF("table_schema", "table_name", "index_name", "non_unique",
      "seq_in_index", "column_name")

    val info = InfoSchema.tableInfo(columns, stats, "app", "events")
    assert(info.columns == Seq("pk", "value", "k"), "generated column excluded")
    assert(info.uniqueKeys.map(_.name) == Seq("PRIMARY", "uk_k"), "PRIMARY hoisted first")
    assert(info.primaryKey.get.columns == Seq("pk"))

    val tracker = new graft.streaming.SchemaTracker()
    val loaded = InfoSchema.loadInto(tracker, columns, stats, version = 1)
    assert(loaded.size == 2)
    assert(tracker.current("app", "users").get.columns == Vector("id"))
    assert(tracker.current("app", "events").get.columns == Vector("pk", "value", "k"))
  }

  test("kafka transport wiring: stream → (key,value,topic) frame → decode round-trip (S7/K3)") {
    val in = Files.createTempDirectory("graft_kafka_in")
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      in.resolve("events.parquet"))
    val ckpt = Files.createTempDirectory("graft_kafka_ckpt").toString

    val changes = CdcStream.changeStream(spark, in.toString)
    val q = CdcStream.kafkaTransport(changes, "cdc-events", ckpt,
      brokers = None, queryName = "kafka_wire")
    try q.processAllAvailable() finally q.stop()

    // the frame honors the Kafka sink's exact column contract
    val frame = spark.table("kafka_wire")
    val bySchema = frame.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(bySchema("key") == BinaryType)
    assert(bySchema("value") == BinaryType)
    assert(bySchema("topic") == StringType)
    assert(frame.select("topic").distinct().as[String].collect().toSeq == Seq("cdc-events"))

    // decoding the frame restores the change envelope exactly (S7 inverse)
    val decoded = CdcStream.fromKafkaFrame(frame)
      .select("commit_ts", "pk", "op", "value")
      .as[(Long, Long, String, Double)].collect().toSet
    val batch = graft.ops.Cdc.changes(spark, sf)
      .select("commit_ts", "pk", "op", "value")
      .as[(Long, Long, String, Double)].collect().toSet
    assert(decoded == batch)
  }
}
