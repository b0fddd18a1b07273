package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val e = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"),
              col("ts").cast("timestamp").as("ts"))
    val a = graft.operators.Funnel
      .lastTouchAttribution(e, "user_id", "ts", "event_id",
                            "event_type", Seq("view", "click"),
                            "purchase", 86400L)
      .groupBy("channel").agg(count(lit(1)).as("n"))
    a.explain("formatted")
    val t0 = System.nanoTime()
    println("rows=" + a.count())
    println(f"sf0.1 time: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
  }
}
