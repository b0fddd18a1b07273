package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val ev0 = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    val channels = Seq("click", "error", "signup", "view")
    Seq(1, 16).foreach { mult =>
      val ev = if (mult == 1) ev0
        else ev0.crossJoin(spark.range(mult.toLong)
          .select(col("id").as("__rep")))
          .withColumn("user_id", col("user_id") * mult + col("__rep"))
          .drop("__rep")
      val n = ev.count()
      (1 to 2).foreach { pass =>
        val t = timed {
          val key = concat(col("user_id").cast("string"), lit("_"),
                           to_date(col("ts")).cast("string"))
          graft.operators.MarkovAttribution.removalAttribution(
            ev, key, "event_type", "ts", "event_id", channels,
            "purchase").collect()
          graft.operators.MarkovAttribution.shapleyAttribution(
            ev, key, "event_type", "ts", "event_id", channels,
            "purchase").collect()
        }
        if (pass == 2)
          println(f"PROBE mult=$mult%2d events=$n%9d attribution=$t%6.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
