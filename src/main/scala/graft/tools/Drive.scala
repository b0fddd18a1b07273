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
    val edges = graft.operators.MarketBasket
      .coOccurrence(li, "l_orderkey", "l_partkey")
      .where(col("n") >= 2)
    val t = graft.operators.Graph.triangleStats(edges, "item_a", "item_b")
    val t0 = System.nanoTime()
    println(t.collect().mkString)
    println(f"sf0.1 time: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    t.explain("formatted")
  }
}
