package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val co = graft.operators.MarketBasket
      .coOccurrence(li, "l_orderkey", "l_partkey")
      .orderBy(col("n").desc, col("item_a"), col("item_b")).limit(20)
    co.explain("formatted")
    val t0 = System.nanoTime()
    println("rows=" + co.count())
    println(f"sf0.1 time: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
  }
}
