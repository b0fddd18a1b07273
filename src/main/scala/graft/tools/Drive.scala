package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.OptimalBinning2D

/** Scratch verification driver (round 5 changed surfaces). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("src/test/resources/boston_housing.parquet")
    val fcd = OptimalBinning2D.fitContinuous(df, "AGE", "INDUS", "target",
      OptimalBinning2D.Config2D(strategy = "cart",
                                monotonicTrendX = Some("descending"),
                                monotonicTrendY = Some("descending")))
    println(s"DRIVE cart status=${fcd.status} iv=${fcd.iv}")
    fcd.rects.foreach { r =>
      println(f"DRIVE rect x=${r.x1}-${r.x2} y=${r.y1}-${r.y2} " +
        f"n=${r.n}%.0f mean=${r.mean}%.4f")
    }
    val fd = OptimalBinning2D.fitContinuous(df, "AGE", "INDUS", "target",
      OptimalBinning2D.Config2D(monotonicTrendX = Some("descending"),
                                monotonicTrendY = Some("descending")))
    println(s"DRIVE grid status=${fd.status} iv=${fd.iv}")
    fd.rects.foreach { r =>
      println(f"DRIVE grect x=${r.x1}-${r.x2} y=${r.y1}-${r.y2} " +
        f"n=${r.n}%.0f mean=${r.mean}%.4f")
    }
    spark.stop()
  }
}
