package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // local-iteration filter (unset for driver runs = all queries)
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up outside timing: parquet footers, then every query once on the
    // smallest scale factor so codegen/JIT/BLAS one-time costs don't land in
    // the measured pass (we report steady-state throughput).
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    val warmDir = "/root/testdata/sf0.001"
    val queries = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    if (new java.io.File(warmDir).isDirectory)
      queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    // three timed passes per query; the FIRST is discarded (it absorbs
    // the query's one-time codegen/Janino/C2 compilation at the target
    // SF — the warmup above runs at sf0.001 so plan shapes can differ)
    // and the min of the remaining two is reported. The host also shows
    // ~2x single-thread timing jitter, so a min over post-JIT passes is
    // the only stable statistic here.
    val results = queries.map { case (name, fn) =>
      var failed = false
      // 4 passes, first discarded, min of 3: the host VM shows
      // multi-second noise spikes (hypervisor neighbors), and a min
      // over three post-JIT passes rejects a single bad window that a
      // min of two cannot. clearCache runs per PASS: each invocation
      // re-persists fresh frames, so without it pass N measures with
      // N-1 dead cached copies squeezing execution memory.
      val times = (1 to 4).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // a failed query must not masquerade as a fast one
      name -> (if (failed) -1.0 else times.drop(1).min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
