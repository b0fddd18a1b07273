package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.operators._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("y", F.when(F.col("l_returnflag")==="R",1.0).otherwise(0.0))
    li.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"DRIVE $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // piecewise: medians alone
    (1 to 2).foreach { p =>
      t(s"median_pass$p") {
        li.select(F.median(F.col("l_extendedprice"))).head.getDouble(0)
      }
      t(s"zscore_pred_pass$p") {
        Outliers.fitZScore(li, "l_extendedprice")
      }
      t(s"fit_gamma_only_pass$p") {
        OptimalBinning.fit(li, "l_extendedprice", "y",
          BinningConfig(name="x", gamma = 2.0))
      }
      t(s"fit_full_pass$p") {
        OptimalBinning.fit(li, "l_extendedprice", "y",
          BinningConfig(name="x", gamma = 2.0,
                        outlierDetector = Some("zscore")))
      }
    }
  }
}
