package graft.tools

import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the md5 weight chain must be computed ONCE per (row, replica):
    // a single Project below the aggregate, no md5 inside the
    // aggregate functions themselves
    val df = graft.SparkEntry.queries("q_bootstrap_ci")(
      spark, "/root/testdata/sf0.1")
    val plan = df.queryExecution.executedPlan.toString
    val aggLines = plan.linesIterator
      .filter(l => l.contains("HashAggregate")).toSeq
    assert(aggLines.nonEmpty && aggLines.forall(!_.contains("md5")),
           "md5 leaked into the aggregate functions")
    val t0 = System.nanoTime()
    val rows = df.collect()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(rows.length == 32)
    println(f"[info] sf0.1 wall: $sec%.2f s (was 27 s inlined)")
    println(s"[info] replica 0: ${rows.head.mkString(", ")}")
    println("[info] DRIVE OK")
    spark.stop()
  }
}
