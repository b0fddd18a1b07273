package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch verification driver (not part of the public API). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + e.count())
    e.show(10, truncate = false)
    spark.stop()
    println("DRIVE_DONE")
  }
}
