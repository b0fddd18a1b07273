package graft.tools

import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // plan audit for the two deployment twins: expect a pruned
    // 3-column lineitem scan, partial+final cell aggregate (ONE
    // exchange on <=16 grid keys), and the 6-row layout joined via
    // BroadcastNestedLoopJoin (range predicate, tiny build side)
    val q = graft.SparkEntry.queries("q_2d_deploy")
    q(spark, "/root/testdata/sf0.01").explain("formatted")
    println("[info] DRIVE OK")
    spark.stop()
  }
}
