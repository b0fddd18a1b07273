package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def phase(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"DRIVE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0)
        .otherwise(0.0))
    Seq(5, 10, 20, 40, 80, 120).foreach { n =>
      val df = base.select(
        col("y") +: (0 until n).map(i =>
          (col("l_extendedprice") * (1.0 + i * 0.01) +
           col("l_quantity") * (i % 7)).as(s"v$i")): _*)
      df.count()
      val vars = (0 until n).map(i => s"v$i")
      phase(s"batch fit nVars=$n") {
        graft.operators.BinningProcess.fit(df, vars, "y")
      }
    }
    spark.stop()
  }
}
