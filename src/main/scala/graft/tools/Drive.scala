package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.{BinningConfig, PWBinning}

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // test_binning_piecewise.py:172-177 golden: mean radius defaults ->
    // binning_table IV 5.87474602 (curve fit to sklearn LR proba)
    val df = spark.read.parquet(
      "/root/reference/tests/data/breast_cancer.parquet")
    Seq("logistic", "empirical").foreach { est =>
      val f = PWBinning.fit(df, "mean radius", "target",
                            BinningConfig(name = "mean radius"),
                            monotonicTrend = Some("descending"),
                            estimator = est)
      println(s"DRIVE est=$est asymptoticIv=${f.asymptoticIv} " +
        s"splits=${f.splits.length}")
    }
  }
}
