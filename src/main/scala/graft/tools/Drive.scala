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
      .coOccurrence(li, "l_orderkey", "l_partkey").where(col("n") >= 2)
    val sym = edges.select(col("item_a").as("src"), col("item_b").as("dst"))
      .unionByName(edges.select(col("item_b").as("src"), col("item_a").as("dst")))
    val pr = graft.operators.Graph.pageRank(sym, "src", "dst", 2)
      .orderBy(col("rank").desc, col("v")).limit(20)
    val t0 = System.nanoTime()
    println("rows=" + pr.count())
    println(f"sf0.1 time: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    pr.explain("formatted")
  }
}
