package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // sf1-equivalent probe: 10x sf0.1 in-memory (6M lineitem rows,
    // 50k docs) through the widest batch surfaces
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0)
        .otherwise(0.0))
    val li10 = li.crossJoin(
      spark.range(10).select(col("id").as("__rep"))).drop("__rep")
    val nVars = 10
    val wide = li10.select(
      col("y") +: (0 until nVars).map(i =>
        (col("l_extendedprice") * (1.0 + i * 0.01) +
         col("l_quantity") * (i % 7)).as(s"v$i")): _*)
    val n = wide.count()
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docs10 = docs.crossJoin(
        spark.range(10).select(col("id").as("__rep")))
      .withColumn("doc_id", col("doc_id") * 10 + col("__rep"))
      .drop("__rep")
    val nd = docs10.count()
    val bench = docs10.where(col("doc_id") < 200)
    val corpus = docs10.where(col("doc_id") >= 200)
    (1 to 2).foreach { pass =>
      val tFit = timed {
        graft.operators.BinningProcess.fit(
          wide, (0 until nVars).map(i => s"v$i"), "y")
      }
      val tCur = timed {
        graft.pipeline.Curation.curateForTraining(
            corpus, bench, "text", "doc_id", qualityMin = 0.9, gramN = 5)
          .agg(count(lit(1))).collect()
      }
      if (pass == 2)
        println(f"PROBE sf1-equiv rows=$n%9d vars=$nVars " +
          f"batch_fit=$tFit%6.2f s | docs=$nd%7d curate=$tCur%6.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
