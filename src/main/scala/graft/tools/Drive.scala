package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.pipeline._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    d.count()
    val banded = Dedup.withMinhashBands(d, "text", "doc_id", 32, 8, 5)
    val t0 = System.nanoTime()
    banded.count()
    println(f"DRIVE banded ${(System.nanoTime()-t0)/1e9}%.2f s")
    val sizes = banded.groupBy("band","bh").agg(count(lit(1)).as("m"))
      .groupBy("m").agg(count(lit(1)).as("buckets"))
      .orderBy(desc("m")).limit(12).collect()
    sizes.foreach(r => println(s"DRIVE bucket m=${r.getLong(0)} x${r.getLong(1)}"))
    val t1 = System.nanoTime()
    val n = Dedup.minhashCandidates(d, "text", "doc_id", 32, 8).count()
    println(f"DRIVE candidates ${(System.nanoTime()-t1)/1e9}%.2f s n=$n")
    val t2 = System.nanoTime()
    val n2 = Dedup.minhashCandidates(d, "text", "doc_id", 32, 8).count()
    println(f"DRIVE candidates2 ${(System.nanoTime()-t2)/1e9}%.2f s n=$n2")
  }
}
