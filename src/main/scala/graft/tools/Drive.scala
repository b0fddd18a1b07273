package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.pipeline._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    println("N_DOCS=" + d.count())
    time("norm+shingles") {
      d.select(F.col("doc_id"), Dedup.normalizeText(F.col("text")).as("__norm"))
        .select(F.col("doc_id"), Dedup.shinglesOf(F.col("__norm"), 5).as("sh"))
        .select(F.sum(F.size(F.col("sh")))).head
    }
    time("sig") {
      Dedup.withMinhashBands(d, "text", "doc_id", 32, 8, 5)
        .agg(F.count(F.lit(1))).head
    }
    time("join") {
      val banded = Dedup.withMinhashBands(d, "text", "doc_id", 32, 8, 5)
      val a = banded.as("a"); val b = banded.as("b")
      println("pairs=" + a.join(b, F.col("a.band") === F.col("b.band") &&
        F.col("a.bh") === F.col("b.bh") && F.col("a.id") < F.col("b.id"))
        .count())
    }
    spark.stop()
    println("DRIVE_DONE")
  }
}
