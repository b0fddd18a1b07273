package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
      .select(lower(col("c_name")).as("name"))
    val pairs = graft.pipeline.Dedup.editDistance1Pairs(c, "name")
    println(pairs.queryExecution.executedPlan.toString.take(6000))
    println(s"=== n_pairs=${pairs.count()}")
    spark.stop()
  }
}
