package graft.tools
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.operators._

/** Scratch verification driver (not part of the public API). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumn("target", F.when(F.col("l_returnflag")==="R", 1.0).otherwise(0.0))
    val fitted = OptimalBinning.fit(li, "l_extendedprice", "target", BinningConfig(name="l_extendedprice"))
    println("STATUS=" + fitted.status)
    println("SPLITS=" + fitted.splits.mkString(","))
    fitted.table.rows.foreach(r => println(f"${r.bin}%-24s n=${r.count}%8.0f er=${r.eventRate}%.4f woe=${r.woe}%+.4f"))
    println(f"IV=${fitted.table.iv}%.6f GINI=${fitted.table.gini}%.6f KS=${fitted.table.ks}%.6f")
    val out = li.select(F.col("l_extendedprice"), fitted.transform(F.col("l_extendedprice")).as("woe"))
    out.show(5)
    out.explain("formatted")

    // probe: special codes + missing values + categorical dtype
    val withNulls = li.withColumn("x2",
      F.when(F.col("l_linenumber") === 1, F.lit(Double.NaN))
       .when(F.col("l_linenumber") === 2, F.lit(-999.0))
       .otherwise(F.col("l_extendedprice")))
    val f2 = OptimalBinning.fit(withNulls, "x2", "target",
      BinningConfig(name="x2", specialCodes=Some(SpecialList(Seq(-999.0)))))
    println("-- special/missing --")
    f2.table.rows.foreach(r => println(f"${r.bin}%-24s n=${r.count}%8.0f woe=${r.woe}%+.4f"))
    val cat = OptimalBinning.fit(li, "l_shipdate", "target",
      BinningConfig(name="shipmode", dtype="categorical"))
    println("-- categorical (on casted dates) -- status=" + cat.status +
      " bins=" + cat.table.rows.length)
    cat.table.rows.take(4).foreach(r => println(f"${r.bin.take(60)}%-60s n=${r.count}%6.0f"))
    spark.stop()
    println("DRIVE_DONE")
  }
}
