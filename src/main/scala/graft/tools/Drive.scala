package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val n = 110_000_000L
    val skewed = spark.range(n).select(
      col("id"),
      when(col("id") < 100_000_000L, lit("mega"))
        .otherwise(concat(lit("s"), col("id") % 10)).as("source"))
    val cap = 1000
    def naiveCap(df: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("id").cast("string").cast("binary")), col("id"))
      df.withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= cap).drop("__rn")
    }
    (1 to 2).foreach { pass =>
      val safe = graft.pipeline.Curation
        .sourceCap(skewed, col("source"), col("id"), cap)
      val tSafe = timed { safe.agg(count(lit(1))).collect() }
      val tNaive = timed { naiveCap(skewed).agg(count(lit(1))).collect() }
      if (pass == 2) {
        val diff = safe.select("id")
          .except(naiveCap(skewed).select("id")).count()
        val nSafe = safe.count()
        println(f"PROBE skew-cap rows=$n%9d cap=$cap " +
          f"safe=$tSafe%6.2f s naive_one_task_sort=$tNaive%6.2f s " +
          f"picks=$nSafe pick_diff=$diff")
      }
    }
    spark.stop()
  }
}
