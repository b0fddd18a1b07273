package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val nv = graft.pipeline.Dedup
      .ngramNovelty(d, "doc_id", "text", "source", n = 3)
    nv.explain("formatted")
    val t0 = System.nanoTime()
    println("rows=" + nv.count())
    println(f"sf0.1 time: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
  }
}
