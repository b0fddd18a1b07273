package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Instrument the staged-replay streaming floor (r13, VERDICT item 7):
  * run named q_stream_* queries with a StreamingQueryListener attached
  * and split the wall time into staging (pre-stream driver+batch work),
  * per-trigger execution, and the state-store commit share inside it —
  * the breakdown that says whether the ~1.5-2 s/query replay floor is
  * trigger planning, state commits, or staging.
  * Usage: runMain graft.tools.StreamFloor q_stream_rollup ... */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val progress =
      new java.util.concurrent.ConcurrentLinkedQueue[
        (String, Long, Map[String, Long], Long, Long)]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        val p = e.progress
        val dur = (Option(p.durationMs).map(_.asScala).getOrElse(Nil))
          .map { case (k, v) => (k: String) -> v.longValue }.toMap
        val commit = Option(p.stateOperators).toSeq.flatten
          .map(_.commitTimeMs).sum
        val rows = Option(p.stateOperators).toSeq.flatten
          .map(_.numRowsTotal).sum
        progress.add((Option(p.name).getOrElse("?"), p.batchId, dur,
                      commit, rows))
      }
    })
    val names = if (args.nonEmpty) args.toSeq
                else Seq("q_stream_rollup")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { pass =>
        progress.clear()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a moment
        Thread.sleep(500)
        import scala.jdk.CollectionConverters._
        val ps = progress.asScala.toSeq
        val trigTotal = ps.map(_._3.getOrElse("triggerExecution", 0L)).sum
        val addBatch = ps.map(_._3.getOrElse("addBatch", 0L)).sum
        val planning = ps.map(_._3.getOrElse("queryPlanning", 0L)).sum
        val getBatch = ps.map(_._3.getOrElse("getBatch", 0L)).sum +
          ps.map(_._3.getOrElse("latestOffset", 0L)).sum
        val commit = ps.map(_._4).sum
        val walCommit = ps.map(_._3.getOrElse("walCommit", 0L)).sum +
          ps.map(_._3.getOrElse("commitOffsets", 0L)).sum
        println(f"FLOOR $name pass$pass wall=$wall%.2f s " +
          f"triggers=${ps.size} triggerExec=${trigTotal / 1e3}%.2f " +
          f"(addBatch=${addBatch / 1e3}%.2f plan=${planning / 1e3}%.2f " +
          f"source=${getBatch / 1e3}%.2f wal=${walCommit / 1e3}%.2f) " +
          f"stateCommit=${commit / 1e3}%.2f " +
          f"outside-triggers=${wall - trigTotal / 1e3}%.2f")
        ps.sortBy(p => (p._1, p._2)).foreach { case (n, b, d, c, r) =>
          println(s"  trigger $n#$b durationMs=${d.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(",")} " +
            s"stateCommitMs=$c stateRows=$r")
        }
      }
    }
    spark.stop()
  }
}
