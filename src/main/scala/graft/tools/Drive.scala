package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val cands = Dedup.minhashCandidates(docs, "text", "doc_id",
                                        keepBand = false)
    println(s"DRIVE cands=${cands.collect().length}")
    val pw = new java.io.PrintWriter("/tmp/mh_plan.txt")
    pw.println(cands.queryExecution.executedPlan.toString)
    pw.close()
    spark.stop()
  }
}
