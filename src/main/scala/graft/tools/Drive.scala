package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

/** Scratch driver for ad-hoc verification runs. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    // bound filter drive: restrict clean rows to a price band, fit, inspect
    val f = OptimalBinning.fit(li, "l_extendedprice", "y",
      BinningConfig(name = "x", fixLb = Some(20000.0), fixUb = Some(80000.0)))
    println("DRIVE status=" + f.status + " splits=" + f.splits.length)
    f.table.rows.foreach(r =>
      println(f"DRIVE bin=${r.bin}%-22s n=${r.count}%.0f er=${r.eventRate}%.4f"))
    val total = f.table.rows.map(_.count).sum
    val inBand = li.where(col("l_extendedprice").between(20000.0, 80000.0)).count()
    println(s"DRIVE tableTotal=$total inBandRows=$inBand (should match: no missing/special here)")
    // splits must respect the band
    assert(f.splits.forall(s => s >= 20000.0 && s <= 80000.0))
    println("DRIVE OK")
    spark.stop()
  }
}
