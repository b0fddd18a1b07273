package graft.tools
import org.apache.spark.sql.SparkSession

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("q_kmv_distinct", "q_benford", "q_ks_2samp")) {
      for (pass <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
        val n = df.count()
        println(f"=== $q pass=$pass rows=$n " +
                f"time=${(System.nanoTime() - t0) / 1e9}%6.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
