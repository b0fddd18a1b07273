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
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val old = orders.where(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
    val nw = orders.where(col("o_orderkey") % 5 =!= 0)
      .select(col("o_orderkey"),
              when(col("o_orderkey") % 3 === 0, col("o_custkey") + 1)
                .otherwise(col("o_custkey")).as("o_custkey"),
              col("o_orderstatus"))
    val d = graft.operators.Temporal
      .snapshotDiff(old, nw, Seq("o_orderkey"), Seq("o_custkey", "o_orderstatus"))
      .groupBy("change").agg(count(lit(1)).as("n"))
    d.explain("formatted")
    val t0 = System.nanoTime()
    println("rows=" + d.count())
    println(f"sf0.1 time: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
  }
}
