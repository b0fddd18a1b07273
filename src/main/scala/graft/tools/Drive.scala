package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"

    // plan audit: q_token_budget — expect pruned ReadSchema (source,
    // doc_id, text only), one counts aggregate broadcast back, window
    // over the sliver, whole-stage codegen spans
    println("=== q_rolling_stats plan ===")
    graft.SparkEntry.queries("q_rolling_stats")(spark, dir)
      .explain("formatted")

    // plan audit: q_funnel — expect per-step partial aggregates and
    // broadcast joins once the funnel narrows, no window over history
    println("=== q_bigram_lm plan ===")
    graft.SparkEntry.queries("q_bigram_lm")(spark, dir)
      .explain("formatted")
  }
}
