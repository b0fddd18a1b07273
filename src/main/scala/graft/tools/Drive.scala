package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Curation, Dedup, TextAnalysis}

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = "/root/testdata/sf0.01"
    val d = spark.read.parquet(s"$dir/documents.parquet")

    // 1. end-to-end curation pass over the real documents table
    val curated = Curation.curate(d, "text", "doc_id", qualityFrac = 0.25)
    val bySplit = curated.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"DRIVE curate input=${d.count()} output=${bySplit.values.sum} " +
            s"splits=$bySplit")

    // 2. contamination: corpus vs first-20-doc benchmark
    val hits = Dedup.contamination(d.where(col("doc_id") >= 20),
                                   d.where(col("doc_id") < 20),
                                   "text", "doc_id", n = 5)
    println("DRIVE contamination " +
      hits.agg(count(lit(1)), sum("n_matched_grams")).collect()(0))

    // 3. plan shape: curation scoring/scrub/split is projection-only over
    //    the scan (no shuffle besides the dedup aggregate), and the
    //    contamination join broadcasts the benchmark gram side
    val scrubPlan = d.select(TextAnalysis.redactPii(col("text")).as("t"),
                             Curation.hashSplit(col("doc_id")).as("s"))
      .queryExecution.executedPlan.toString
    println("DRIVE scrubPlan exchanges=" +
      "Exchange".r.findAllIn(scrubPlan).length +
      " codegen=" + scrubPlan.contains("WholeStageCodegen"))
    val contPlan = hits.queryExecution.executedPlan.toString
    println("DRIVE contPlan broadcast=" +
      contPlan.contains("BroadcastHashJoin"))

    spark.stop()
  }
}
