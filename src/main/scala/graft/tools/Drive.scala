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

    // test_binning_2d.py:302-317 goldens:
    // num x cat -> woe[:5] = [5.28332344 x3, -2.44333022, 5.28332344]
    // cat x cat -> woe[:5] = [2.86295531] * 5
    val df = spark.read.parquet(
      "/root/reference/tests/data/breast_cancer.parquet")
    val fnc = OptimalBinning2D.fit(df, "mean radius", "worst concavity",
      "target", OptimalBinning2D.Config2D(dtypeY = "categorical"))
    val w1 = df.limit(5).select(fnc.transform(col("mean radius"),
      col("worst concavity")).as("w")).collect().map(_.getDouble(0))
    println(s"DRIVE numcat ${w1.mkString(", ")}")

    val fcc = OptimalBinning2D.fit(df, "mean radius", "worst concavity",
      "target", OptimalBinning2D.Config2D(dtypeX = "categorical",
                                          dtypeY = "categorical"))
    val w2 = df.limit(5).select(fcc.transform(col("mean radius"),
      col("worst concavity")).as("w")).collect().map(_.getDouble(0))
    println(s"DRIVE catcat ${w2.mkString(", ")}")
  }
}
