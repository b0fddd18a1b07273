package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp

    // boundary probe: window [0, 600s), watermark delay 600s.
    // second batch event at t = 1200s -> watermark = 1200 - 600 = 600
    // = window end EXACTLY. Does append emit the window at equality?
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Timestamp, Double)]
    val df = stream.toDF().toDF("ts", "value")
    val agg = df.withWatermark("ts", "600 seconds")
      .groupBy(window(col("ts"), "600 seconds"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wprobe").start()
    def t(sec: Long) = new Timestamp(sec * 1000L)
    stream.addData(Seq((t(10), 1.0)))
    q.processAllAvailable()
    stream.addData(Seq((t(1200), 1.0)))
    q.processAllAvailable()
    val atEq = spark.table("wprobe").count()
    println(s"PROBE emit-at-equality (wm == end): $atEq rows")
    stream.addData(Seq((t(1801), 1.0))) // wm = 1201 > 1200 end of w2
    q.processAllAvailable()
    val after = spark.table("wprobe").collect()
      .map(r => (r.getStruct(0).getTimestamp(0).getTime / 1000,
                 r.getLong(1))).sortBy(_._1)
    println(s"PROBE after wm=1201: ${after.mkString(";")}")
    q.stop()
    spark.stop()
  }
}
