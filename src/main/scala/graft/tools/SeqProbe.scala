package graft.tools
import org.apache.spark.sql.SparkSession

/** Reproduce a query's in-bench-context slowdown (r13, the
  * q_setsim_join adjudication): print the bench's query iteration
  * order, then replay the `--before=N` queries that precede the target
  * in that order (one pass each, clearCache between, exactly like the
  * bench) and time the target for 4 passes. Narrowing N bisects which
  * predecessor leaves the state that slows the target.
  * Usage: runMain graft.tools.SeqProbe q_setsim_join [--before=N]
  *        runMain graft.tools.SeqProbe --order   (just print the order)
  */
object SeqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.excludedRules",
              "org.apache.spark.sql.catalyst.optimizer." +
                "EliminateWindowPartitions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = graft.SparkEntry.queries.keys.toSeq // bench iteration order
    if (args.contains("--order")) {
      names.zipWithIndex.foreach { case (n, i) => println(f"$i%3d $n") }
      spark.stop(); return
    }
    val target = args(0)
    val nBefore = args.find(_.startsWith("--before="))
      .map(_.stripPrefix("--before=").toInt).getOrElse(Int.MaxValue)
    val idx = names.indexOf(target)
    require(idx >= 0, s"unknown query $target")
    val pre = names.take(idx).takeRight(math.min(nBefore, idx))
    println(s"[seqprobe] replaying ${pre.size} predecessors then $target")
    // warm like the bench (sf0.001 pass for the involved queries)
    val warmDir = "/root/testdata/sf0.001"
    (pre :+ target).foreach { n =>
      try graft.SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    pre.foreach { n =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[seqprobe] $n FAILED: ${e.getMessage}") }
      val t = (System.nanoTime() - t0) / 1e9
      if (t > 2.0) println(f"[seqprobe] pre $n $t%.2f s")
    }
    (1 to 4).foreach { p =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(target)(spark, sfDir).count()
      println(f"[seqprobe] $target pass$p ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
