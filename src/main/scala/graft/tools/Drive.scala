package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def phase(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"DRIVE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // exact-integer k-means: fit + assignment over real embeddings
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    phase("kmeansQ fit+assign sf0.1") {
      val cl = graft.pipeline.Similarity
        .kmeansPortable(e, "embedding", dim = 64, k = 8, iters = 2)
      val agg = cl.groupBy("cluster").count().orderBy("cluster")
      agg.show()
    }
    val cl = graft.pipeline.Similarity
      .kmeansPortable(e, "embedding", dim = 64, k = 8, iters = 0)
    cl.explain("formatted")
    spark.stop()
  }
}
