package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

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
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb.count()

    // kmeans assignment plan: must be ONE narrow projection over the
    // scan — no join, no shuffle (centroids ride as a literal into the
    // native kernel)
    val cents = Similarity.portableCentroids(8, 64)
    val assigned = Similarity.kmeansPortable(emb, "embedding", dim = 64,
                                             k = 8, iters = 0)
    val aplan = assigned.queryExecution.executedPlan.toString
    // "*(1)" stage markers are the WholeStageCodegen spans in the
    // executedPlan string form
    println("DRIVE assign noExchange=" + !aplan.contains("Exchange") +
      " noJoin=" + !aplan.contains("Join") +
      " codegen=" + aplan.contains("*(1)"))

    phase("kmeans iters=2 sf0.1") {
      val out = Similarity.kmeansPortable(emb, "embedding", dim = 64,
                                          k = 8, iters = 2)
        .groupBy("cluster").count().orderBy("cluster").collect()
      println("DRIVE clusters " +
        out.map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" "))
    }
    phase("kmeans iters=5 sf0.1") {
      Similarity.kmeansCentroids(emb, "embedding", dim = 64, k = 8,
                                 iters = 5)
    }
    spark.stop()
  }
}
