package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    e.count()
    def build(): DataFrame = {
      val queries = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding"))
      Similarity.ivfPqTopKPortable(e, queries, "embedding", "vec_id",
                                   "qid", k = 5, dim = 64, nLists = 16,
                                   nProbe = 4, m = 4, ksub = 16)
        .agg(count(lit(1)).as("n_results"),
             countDistinct(col("qid")).as("n_queries"),
             round(avg(round(col("cosine_pq"), 6)), 6).as("avg_cosine_pq"))
    }
    // warm everything once
    build().collect()
    for (i <- 1 to 3) {
      var t0 = System.nanoTime()
      val df = build()
      val tBuild = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis + optimization
      val tPlan = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.collect()
      val tExec = (System.nanoTime() - t0) / 1e9
      println(f"DRIVE ivfpq[$i] build=$tBuild%.3f plan=$tPlan%.3f exec=$tExec%.3f")
    }
    spark.stop()
  }
}
