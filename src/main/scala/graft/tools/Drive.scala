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
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    // (1) the shared helper as the query uses it
    (1 to 2).foreach { p =>
      val t = timed {
        graft.SparkEntry.bootstrapStats(spark, dir, 32).collect()
      }
      println(f"[info] helper collect pass $p: $t%6.2f s")
    }
    // (2) inline flat when-chain version
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .where(col("l_extendedprice").isNotNull)
      .select(col("l_orderkey"), col("l_linenumber"),
              round(col("l_extendedprice") * 100).cast("long").as("v"))
    val base = li.crossJoin(broadcast(
      spark.range(32L).select(col("id").as("b"))))
    val key = concat(col("l_orderkey").cast("string"), lit(":"),
                     col("l_linenumber").cast("string"), lit(":"),
                     col("b").cast("string"))
    val h8 = substring(md5(key.cast("binary")), 1, 8)
    val wFlat = when(h8 < "5e2d58d8", 0L).when(h8 < "bc5ab1b1", 1L)
      .when(h8 < "eb715e1d", 2L).when(h8 < "fb239797", 3L)
      .when(h8 < "ff1025f5", 4L).when(h8 < "ffd90f3b", 5L)
      .when(h8 < "fffa8b71", 6L).otherwise(7L)
    (1 to 2).foreach { p =>
      val t = timed {
        base.select(col("b"), col("v"), wFlat.as("w"))
          .groupBy("b")
          .agg(sum(col("w")).as("n_eff"),
               sum((col("w") * col("v")).cast("decimal(38,0)"))
                 .cast("long").as("sum_cents"))
          .withColumn("mean_cents",
            when(col("n_eff") > 0,
              col("sum_cents").cast("double") /
                col("n_eff").cast("double")))
          .collect()
      }
      println(f"[info] flat-chain collect pass $p: $t%6.2f s")
    }
    println("[info] DRIVE OK")
    spark.stop()
  }
}
