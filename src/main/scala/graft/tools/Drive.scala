package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{BinningConfig, PWBinning}

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // continuous PW golden (defaults now = auto trend):
    // [31.46014643, 23.87619986, 37.31237732]
    val bos = spark.read.parquet("src/test/resources/boston_housing.parquet")
    val fc = PWBinning.fitContinuous(bos, "LSTAT", "target",
                                     BinningConfig(name = "LSTAT"))
    bos.limit(3).select(col("LSTAT"), fc.predictColumn(col("LSTAT")).as("p"))
      .collect().foreach(r =>
        println(s"DRIVE cont x=${r.getDouble(0)} pred=${r.getDouble(1)}"))

    // binary PW golden (defaults): IV 5.87474602
    val bc = spark.read.parquet(
      "/root/reference/tests/data/breast_cancer.parquet")
    val fb = PWBinning.fit(bc, "mean radius", "target",
                           BinningConfig(name = "mean radius"))
    println(s"DRIVE bin asymptoticIv=${fb.asymptoticIv}")
  }
}
