package graft.tools
import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("q_ab_srm", "q_did").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
      val plan = df.queryExecution.executedPlan.toString
      println(s"=== $q ===")
      println("  scans: " + plan.linesIterator
        .filter(_.contains("Scan parquet"))
        .map(l => l.slice(l.indexOf("ReadSchema"), l.indexOf("ReadSchema") + 120))
        .mkString(" | "))
      println("  exchanges: " +
        plan.linesIterator.count(_.contains("Exchange")))
      println("  codegen spans: " +
        plan.linesIterator.count(_.contains("WholeStageCodegen")))
      println("  inmem scans: " +
        plan.linesIterator.count(_.contains("InMemoryTableScan")))
      df.show(8, truncate = false)
    }
    spark.stop()
  }
}
