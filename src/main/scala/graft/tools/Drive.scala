package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.OptimalBinning2D

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // test_continuous_binning_2d.py golden: AGE x INDUS -> MEDV,
    // defaults -> IV 4.80825509, woe total 171.946019
    val df = spark.read.parquet("src/test/resources/boston_housing.parquet")
    val f = OptimalBinning2D.fitContinuous(df, "AGE", "INDUS", "target")
    println(s"DRIVE status=${f.status} nBins=${f.rects.length}")
    println(s"DRIVE l1Norm=${f.l1Norm}")
    val tN = f.rects.map(_.n).sum
    val iv = f.rects.map(r => math.abs(r.mean - f.tMean) * r.n / tN).sum
    val woe = f.rects.map(r => math.abs(r.mean - f.tMean)).sum
    println(s"DRIVE iv=$iv woeTotal=$woe")
  }
}
