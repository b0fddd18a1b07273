package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Curation, TextAnalysis}

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = "/root/testdata/sf0.01"
    val d = spark.read.parquet(s"$dir/documents.parquet")

    // 1. repetition features: results + plan shape
    val rep = TextAnalysis.repetitionFeatures(col("text")).toMap
    val repQ = d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           round(avg(rep("top_bigram_frac")), 6).as("top_bi"),
           round(avg(rep("dup_trigram_frac")), 6).as("dup_tri"))
      .orderBy("source")
    repQ.show(5, truncate = false)
    println("=== repetition plan ===")
    println(repQ.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .take(3000))

    // 2. stratified sample: results + plan shape
    val samp = Curation.stratifiedSample(d, col("lang"), col("doc_id"), 0.25)
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("doc_id").as("sid"))
      .orderBy("lang")
    samp.show(10, truncate = false)
    println("=== stratified plan ===")
    println(samp.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .take(3000))
  }
}
