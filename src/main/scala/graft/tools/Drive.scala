package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import graft.operators._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    def phase(tag: String)(f: => Unit): Unit = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      f
      println(f"DRIVE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s jobs=${jobs.get() - j0}")
    }
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    li.count()
    val x = col("l_extendedprice")
    def med1(c: org.apache.spark.sql.Column): Double =
      li.select(percentile_approx(c, lit(0.5), lit(10000))
        .cast("double")).head.getDouble(0)
    // warm every code path once
    locally {
      val medW = med1(x); val madW = med1(abs(x - lit(medW)))
      OptimalBinning.fit(li, "l_extendedprice", "y",
        BinningConfig(name = "x", gamma = 2.0,
                      outlierDetector = Some("zscore"),
                      outlierParams = Map("approx" -> true,
                                          "med" -> medW, "mad" -> madW)))
    }
    var med = 0.0; var mad = 0.0
    phase("med") { med = med1(x) }
    phase("mad") { mad = med1(abs(x - lit(med))) }
    var fitted: FittedOptimalBinning = null
    phase("fit.gamma") {
      fitted = OptimalBinning.fit(li, "l_extendedprice", "y",
        BinningConfig(name = "x", gamma = 2.0,
                      outlierDetector = Some("zscore"),
                      outlierParams = Map("approx" -> true,
                                          "med" -> med, "mad" -> mad)))
    }
    // same fit without gamma / outliers for comparison
    phase("fit.plain") {
      OptimalBinning.fit(li, "l_extendedprice", "y", BinningConfig(name = "x"))
    }
    phase("reagg") {
      val sp = fitted.splits
      val binIdx = sp.indices.foldRight(lit(sp.length): org.apache.spark.sql.Column) {
        (i, acc) => when(x < sp(i), lit(i)).otherwise(acc) }
      li.where(!(abs(lit(0.6745) * (x - lit(med)) / lit(mad)) > 3.5))
        .groupBy(binIdx.cast("long").as("bin"))
        .agg(count(lit(1)).as("count"), sum(col("y")).cast("long").as("event"))
        .orderBy("bin").collect()
    }
    spark.stop()
  }
}
