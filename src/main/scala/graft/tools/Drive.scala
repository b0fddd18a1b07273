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
    def timed(label: String)(f: => Unit): Unit = {
      (1 to 3).foreach { p =>
        val t0 = System.nanoTime(); f
        val dt = (System.nanoTime() - t0) / 1e9
        if (p > 1) println(f"$label pass$p: $dt%6.2f s")
      }
    }
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val words = filter(split(lower(trim(col("text"))), "\\s+"),
                       t => t =!= "")
    timed("explode-count") {
      d.select(explode(graft.pipeline.TextAnalysis.wordNgrams(words, 2))
                 .as("bigram"))
        .agg(count(lit(1))).collect()
    }
    timed("groupBy-count") {
      d.select(explode(graft.pipeline.TextAnalysis.wordNgrams(words, 2))
                 .as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1))).collect()
    }
    timed("full-bigramTopK") {
      graft.pipeline.TextAnalysis.bigramTopK(d, "text", 20).collect()
    }
    spark.stop()
  }
}
