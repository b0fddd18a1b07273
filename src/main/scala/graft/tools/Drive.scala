package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Scratch driver for ad-hoc verification runs. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    val f = OptimalBinning.fit(li, "l_extendedprice", "y",
                               BinningConfig(name = "l_extendedprice"))
    println(f.information().linesIterator.map("DRIVE " + _).mkString("\n"))
    spark.stop()
  }
}
