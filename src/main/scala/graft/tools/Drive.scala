package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tm[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DRIVE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // bench-exact shape: groupBy(source), round(avg, 6), orderBy, count()
    def benchQ(m: Map[String, org.apache.spark.sql.Column]) =
      d.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
             round(avg(m("top_bigram_frac")), 6).as("avg_top_bigram_frac"),
             round(avg(m("dup_trigram_frac")), 6).as("avg_dup_trigram_frac"))
        .orderBy("source")
    val hof = TextAnalysis.repetitionFeaturesHof(col("text")).toMap
    val nat = TextAnalysis.repetitionFeatures(col("text")).toMap
    (1 to 2).foreach { pass =>
      tm(s"bench-shape nat pass$pass") { benchQ(nat).count() }
      tm(s"bench-shape hof pass$pass") { benchQ(hof).count() }
    }
  }
}
