package graft.tools
import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries("q_rollup_hierarchy")(spark, "/root/testdata/sf0.01")
    df.explain("formatted")
    df.show(40, truncate = false)
    spark.stop()
  }
}
