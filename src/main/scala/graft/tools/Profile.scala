package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling: run named SparkEntry queries twice each (cold, warm)
  * so one-time JIT/codegen/BLAS costs are visible separately from
  * steady-state cost. Usage: runMain graft.tools.Profile q_a q_b ... */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"PROFILE $name pass$pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
