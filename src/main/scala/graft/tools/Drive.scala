package graft.tools
import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_snowflake_rollup")(
      spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString
    println("BroadcastHashJoin count: " +
      plan.linesIterator.count(_.contains("BroadcastHashJoin")))
    println("SortMergeJoin count: " +
      plan.linesIterator.count(_.contains("SortMergeJoin")))
    println("partial agg: " + plan.contains("HashAggregate"))
    println(plan.linesIterator
      .filter(l => l.contains("Join") || l.contains("Scan parquet") ||
                   l.contains("HashAggregate"))
      .map(_.take(150)).mkString("\n"))
    spark.stop()
  }
}
