package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.operators._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("y", F.when(F.col("o_orderstatus")==="F", 0.0)
        .when(F.col("o_orderstatus")==="P", 1.0).otherwise(2.0))
    // warm
    MulticlassOptimalBinning.fit(
      o.limit(2000), "o_totalprice", "y", BinningConfig(name="tp"))
    (1 to 3).foreach { p =>
      val t0 = System.nanoTime()
      val f = MulticlassOptimalBinning.fit(o, "o_totalprice", "y",
                                           BinningConfig(name="tp"))
      println(f"DRIVE multiclass pass$p ${(System.nanoTime()-t0)/1e9}%.2f s bins=${f.binLabels.length}")
    }
  }
}
