package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
              "org.apache.spark.sql.catalyst.optimizer." +
                "EliminateWindowPartitions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1) gainsTable on a real band over sf0.01 lineitem: values + plan
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .select((col("l_extendedprice") / 12500).cast("long").as("band"),
              when(col("l_returnflag") === "R", 1).otherwise(0).as("y"))
    val gains = graft.operators.ScorecardAnalytics
      .gainsTable(li, col("band"), "y")
    gains.show(5, truncate = false)
    val plan = gains.queryExecution.executedPlan.toString
    println("window partition kept: " +
      plan.contains("hashpartitioning(1"))

    // 2) zero-event degradation (ANSI-safe)
    graft.operators.ScorecardAnalytics
      .gainsTable(Seq((0L, 0), (1L, 0)).toDF("b", "y"), col("b"), "y")
      .show(truncate = false)

    // 3) negative-id LPA + pre-1970 forecastEval
    graft.operators.Graph.lpaCommunities(
      Seq((-1L, -2L), (-2L, -3L)).toDF("a", "b"), "a", "b", 2)
      .show(truncate = false)
    graft.operators.Monitoring.forecastEval(
      Seq(("g", java.sql.Timestamp.valueOf("1969-12-20 01:00:00")),
          ("g", java.sql.Timestamp.valueOf("1969-12-21 01:00:00")),
          ("g", java.sql.Timestamp.valueOf("1969-12-22 03:00:00")))
        .toDF("g", "ts"), "g", "ts", 1)
      .show(truncate = false)
    spark.stop()
  }
}
