package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.sources.ModelIO

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (1 to 2000).map { i =>
      val c = "cat" + rnd.nextInt(120)
      (c, c.length * 2.0 + rnd.nextGaussian())
    }.toDF("x", "y")
    // bounded-collect tail pool + catch-all Others
    val f = ContinuousOptimalBinning.fit(df, "x", "y",
      BinningConfig(name = "x", dtype = "categorical",
                    histogramMaxBuckets = 15))
    println(s"DRIVE contcat status=${f.status} bins=${f.table.binLabels.length} catchAll=${f.othersCatchAll}")
    // JSON round-trip must preserve the catch-all routing
    val f2 = ModelIO.continuousFromJson(ModelIO.continuousToJson(f))
    val probe = Seq(("tail_cat_unseen", 0.0)).toDF("x", "y")
    val m1 = probe.select(f.transform(col("x")).as("m")).as[Double].head()
    val m2 = probe.select(f2.transform(col("x")).as("m")).as[Double].head()
    println(s"DRIVE roundtrip othersMean=${f.table.means(f.nDataBins)} got=$m1 reloaded=$m2")
    // SpecialDict round-trip on binary
    val bi = df.withColumn("y2", (col("y") > 10).cast("double"))
      .withColumn("xs", when(length(col("x")) === 4, lit("-9")).otherwise(col("x")))
    val fb = OptimalBinning.fit(bi, "xs", "y2",
      BinningConfig(name = "xs", dtype = "categorical",
        specialCodes = Some(SpecialDict(Seq("neg" -> Seq("-9"))))))
    val fb2 = ModelIO.fromJson(ModelIO.toJson(fb))
    println(s"DRIVE specialdict restored=${fb2.config.specialCodes} iv=${fb.table.iv - fb2.table.iv}")
    spark.stop()
  }
}
