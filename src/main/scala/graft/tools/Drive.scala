package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.OptimalBinning2D

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // reference test_binning_2d.py golden: mean radius x worst concavity,
    // defaults -> IV 7.63248244, gini 0.96381005, js 0.53356918
    val df = spark.read.parquet(
      "/root/reference/tests/data/breast_cancer.parquet")
    val f = OptimalBinning2D.fit(df, "mean radius", "worst concavity",
                                 "target")
    println(s"DRIVE status=${f.status} nBins=${f.rects.length}")
    println(s"DRIVE iv=${f.iv}")
  }
}
