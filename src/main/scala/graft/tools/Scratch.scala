package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Throwaway local profiling entry point (not part of the library API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def phase(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    d.count()
    val q = () => {
      val hits = Dedup.contamination(d.where(col("doc_id") >= 20),
                                     d.where(col("doc_id") < 20),
                                     "text", "doc_id", n = 5)
      hits.agg(count(lit(1)).as("n_contaminated"),
               sum(col("n_matched_grams")).cast("long").as("total_matched"),
               min(col("id")).as("first_doc"))
    }
    import graft.functions.TextHashExprs
    val corpus = d.where(col("doc_id") >= 20)
    val bench = d.where(col("doc_id") < 20)
    for (i <- 1 to 3) {
      phase(s"trivial.count[$i]") { d.count(); () }
      phase(s"corpus.grams[$i]") {
        corpus.select(explode(TextHashExprs.wordGramHashes(
          Dedup.normalizeText(col("text")), 5)).as("g")).count(); ()
      }
      phase(s"bench.distinct[$i]") {
        bench.select(explode(TextHashExprs.wordGramHashes(
          Dedup.normalizeText(col("text")), 5)).as("g"))
          .distinct().count(); ()
      }
      phase(s"contamination[$i]") { q().count(); () }
    }
    spark.stop()
  }
}
