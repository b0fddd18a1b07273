package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (1 to 500).map { i =>
      val c = "cat" + rnd.nextInt(8)
      (c, c.length * 2.0 + rnd.nextGaussian())
    }.toDF("x", "y")
    val f = ContinuousOptimalBinning.fit(df, "x", "y",
      BinningConfig(name = "x", dtype = "categorical"))
    println(s"DRIVE contcat status=${f.status} bins=${f.table.binLabels.length}")
    f.table.rows.take(3).foreach(r => println(s"DRIVE row ${r.bin} n=${r.count}"))
    spark.stop()
  }
}
