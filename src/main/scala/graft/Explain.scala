package graft

import org.apache.spark.sql.SparkSession

// scratch: dump physical plans for the plan audit (not part of driver contract)
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_pricing_summary", "q3_shipping_priority", "a1_compact_pk",
      "s6_ts_range_scan", "f1_allow_block", "dedup_exact", "ann_topk_cosine")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
