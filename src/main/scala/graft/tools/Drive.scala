package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Scratch verification driver (round 5 changed surfaces). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = Dedup.nearDupPairs(d, "text", "doc_id",
      jaccardThreshold = 0.5, numHashes = 32, bands = 8,
      jaccardNgram = 3, portable = true)
    val agg = pairs.agg(count(lit(1)).as("n_pairs"))
    val plan = agg.queryExecution.executedPlan.toString
    println("DRIVE reused_exchanges=" +
      "ReusedExchange".r.findAllIn(plan).length)
    println("DRIVE exchanges=" + "Exchange".r.findAllIn(plan).length)
    println("DRIVE scans=" + "Scan parquet".r.findAllIn(plan).length)
    val t0 = System.nanoTime()
    agg.collect()
    println(f"DRIVE warmup ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    Dedup.nearDupPairs(d, "text", "doc_id", jaccardThreshold = 0.5,
      numHashes = 32, bands = 8, jaccardNgram = 3, portable = true)
      .agg(count(lit(1))).collect()
    println(f"DRIVE warm ${(System.nanoTime() - t1) / 1e9}%.2f s")

    // 2D fit on a >64-cell prebin grid: routed through the budgeted
    // 128-bit exact tiling (guillotine fallback on budget exhaustion)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0)
        .otherwise(0.0))
    val t2 = System.nanoTime()
    val fit2d = graft.operators.OptimalBinning2D.fit(
      li, "l_extendedprice", "l_quantity", "y",
      graft.operators.OptimalBinning2D.Config2D(
        maxNPrebinsX = 9, maxNPrebinsY = 9))
    println(f"DRIVE 2d81 status=${fit2d.status} bins=${fit2d.rects.length} " +
      f"iv_sum=${fit2d.rects.map(_.iv).sum}%.6f " +
      f"n=${fit2d.rects.map(r => r.nonevent + r.event).sum}%.0f " +
      f"in ${(System.nanoTime() - t2) / 1e9}%.2f s")
    spark.stop()
  }
}
