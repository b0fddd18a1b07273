package graft.tools

import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // bootstrap-CI plan shape at the library surface: the 32-replica
    // fan-out must be a BROADCAST nested loop (no shuffle before the
    // aggregate) and the aggregate must have a partial (map-side
    // combine) before its single 32-group exchange.
    val df = graft.SparkEntry.queries("q_bootstrap_ci")(
      spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    println("[info] plan head:\n" +
      plan.linesIterator.take(25).map("[info]   " + _).mkString("\n"))
    assert(plan.contains("BroadcastNestedLoopJoin"),
           "replica spine must broadcast")
    assert(!plan.contains("SortMergeJoin"), "no shuffle join expected")
    assert(plan.contains("HashAggregate"), "hash aggregate expected")
    val rows = df.collect()
    assert(rows.length == 32)
    println(s"[info] replica 0: ${rows.head.mkString(", ")}")
    println("[info] DRIVE OK")
    spark.stop()
  }
}
