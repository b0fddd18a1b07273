package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.OptimalBinning2D

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // test_binning_2d.py:220-246 goldens: desc/desc -> IV 7.59474677;
    // asc/asc -> IV ~0 (single rectangle)
    val df = spark.read.parquet(
      "/root/reference/tests/data/breast_cancer.parquet")
    Seq("descending", "ascending").foreach { t =>
      val t0 = System.nanoTime()
      val f = OptimalBinning2D.fit(df, "mean radius", "worst concavity",
        "target", OptimalBinning2D.Config2D(
          monotonicTrendX = Some(t), monotonicTrendY = Some(t)))
      println(f"DRIVE trend=$t status=${f.status} nBins=${f.rects.length} " +
        f"iv=${f.iv} solve=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
}
