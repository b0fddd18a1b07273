package graft.tools
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named SparkEntry queries to
  * `plans/<tag>/<query>_<suffix>.txt` — the optimization rounds'
  * before/after plan evidence. Queries that run internal actions
  * (streaming replays, bounded driver gates) execute those actions
  * while the frame is built; the dumped plan is the returned frame's,
  * and the per-stage structure is documented in the round notes.
  * Usage: runMain graft.tools.PlanDump <tag> <suffix> q_a q_b ... */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val (tag, suffix, names) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
              "org.apache.spark.sql.catalyst.optimizer." +
                "EliminateWindowPartitions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(s"plans/$tag").mkdirs()
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"plans/$tag/${name}_$suffix.txt"),
          plan)
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      } finally spark.catalog.clearCache()
    }
    spark.stop()
  }
}
