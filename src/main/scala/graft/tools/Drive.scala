package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver for ad-hoc verification runs. */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"DRIVE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm the scan
    time("count-warm") { li.count() }
    time("count") { li.count() }
    time("pct-exact") {
      li.select(percentile(col("l_extendedprice"),
        array(lit(0.25), lit(0.75)))).head
    }
    time("pct-exact-2") {
      li.select(percentile(col("l_extendedprice"),
        array(lit(0.25), lit(0.75)))).head
    }
    time("groupby-val") {
      li.groupBy(col("l_extendedprice")).agg(count(lit(1))).count()
    }
    time("agg-pass") {
      li.agg(sum((col("l_extendedprice") > 50000).cast("long")),
             count(lit(1))).head
    }
    time("collect-doubles") {
      import spark.implicits._
      val a = li.select(col("l_extendedprice")).na.drop
        .as[Double].collect()
      java.util.Arrays.sort(a)
      println("n=" + a.length + " q25=" + a((0.25 * (a.length - 1)).toInt))
    }
    time("collect-doubles-2") {
      import spark.implicits._
      val a = li.select(col("l_extendedprice")).na.drop
        .as[Double].collect()
      java.util.Arrays.sort(a)
      println("n=" + a.length)
    }
    spark.stop()
  }
}
