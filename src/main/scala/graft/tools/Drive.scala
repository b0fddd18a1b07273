package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    def evalAt(f: PWBinning.FittedContPW, v: Double): Double =
      spark.range(1).select(f.predictColumn(lit(v))).head.getDouble(0)
    val cfg = BinningConfig(name = "x")
    for ((label, obj, trend) <- Seq(
           ("l2-free", "l2", None),
           ("l2-asc", "l2", Some("ascending")),
           ("huber-free", "huber", None),
           ("huber-asc", "huber", Some("ascending")))) {
      val pw = PWBinning.fitContinuous(li, "l_quantity", "l_extendedprice",
        cfg, objective = obj, monotonicTrend = trend.map(identity))
      println(f"DRIVE $label%-12s splits=${pw.splits.length} " +
        f"p5=${evalAt(pw, 5)}%.1f p25=${evalAt(pw, 25)}%.1f p45=${evalAt(pw, 45)}%.1f")
    }
    // actual means for comparison
    val m = li.groupBy((col("l_quantity") / 10).cast("int").as("b"))
      .agg(avg("l_extendedprice")).orderBy("b").collect()
    m.foreach(r => println(s"DRIVE actual bin ${r.getInt(0)} mean ${r.getDouble(1)}"))
    spark.stop()
  }
}
