package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerJobEnd, SparkListenerStageCompleted}

/** Per-job breakdown of a SparkEntry query (r13): run each named query
  * twice (cold, warm) with a SparkListener recording every job's wall
  * time and every stage's task-time/shuffle totals — the view that says
  * WHERE a multi-second query spends its time (many tiny jobs vs one
  * heavy stage vs shuffle). Usage:
  *   SPARK_GRAFT_CPUS=32 runMain graft.tools.JobProfile q_a q_b ... */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class Job(id: Int, t0: Long, var t1: Long = -1L,
                   var stages: Int = 0)
    val jobs =
      new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    @volatile var taskTimeMs = 0L
    @volatile var shuffleWriteB = 0L
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, Job(e.jobId, e.time))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.t1 = e.time
      }
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        taskTimeMs += si.taskMetrics.executorRunTime
        shuffleWriteB += si.taskMetrics.shuffleWriteMetrics.bytesWritten
        tasks += si.numTasks
      }
    })
    args.toSeq.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { pass =>
        jobs.clear(); taskTimeMs = 0; shuffleWriteB = 0; tasks = 0
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        val js = jobs.values.asScala.toSeq.sortBy(_.id)
        val jobWall = js.filter(_.t1 > 0).map(j => j.t1 - j.t0)
        println(f"JOBPROFILE $name pass$pass wall=$wall%.2f s " +
          f"jobs=${js.size} jobWallSum=${jobWall.sum / 1e3}%.2f " +
          f"taskTime=${taskTimeMs / 1e3}%.2f tasks=$tasks " +
          f"shufWrite=${shuffleWriteB / 1e6}%.1f MB " +
          f"outsideJobs=${wall - jobWall.sum / 1e3}%.2f")
        if (pass == 2) {
          val top = js.filter(_.t1 > 0).sortBy(j => -(j.t1 - j.t0)).take(12)
          top.foreach(j => println(
            f"  job ${j.id}%4d ${(j.t1 - j.t0) / 1e3}%6.2f s"))
        }
      }
    }
    spark.stop()
  }
}
