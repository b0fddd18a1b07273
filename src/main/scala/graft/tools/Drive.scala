package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Scratch verification driver (round 5 changed surfaces). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.put(je.jobId, System.nanoTime() - starts.getOrDefault(je.jobId, 0L))
    })
    val fn = graft.SparkEntry.queries("q_process_summary")
    fn(spark, sfDir).count() // warm
    Thread.sleep(300); jobs.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    Thread.sleep(300)
    println(f"DRIVE total ${(System.nanoTime()-t0)/1e9}%.2f s")
    jobs.forEach((id, ns) => println(f"DRIVE job $id ${ns/1e9}%.3f s"))
    spark.stop()
  }
}
