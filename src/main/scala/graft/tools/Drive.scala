package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import graft.operators._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, j.time); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val dur = (j.time - starts.getOrDefault(j.jobId, j.time)) / 1e3
        println(f"DRIVE   job ${j.jobId} ${dur}%.3f s")
      }
    })
    def phase(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"DRIVE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    li.count()
    val vars = Seq("l_extendedprice", "l_quantity", "l_discount", "l_tax")
    // HLL cost probe: same conditional-agg shape with and without ndv
    val aggsNoNdv = vars.flatMap { v =>
      val x = col(v).cast("double")
      // mirror Preprocess.missingPredicate (null OR NaN) so the probe's
      // aggregate shape matches the production Pass A conditions
      val clean = x.isNotNull && !isnan(x)
      Seq(sum(when(clean && col("y") === 0.0, 1.0).otherwise(0.0)),
          sum(when(clean && col("y") =!= 0.0, 1.0).otherwise(0.0)),
          count(when(clean, lit(1))), min(x), max(x))
    }
    val aggsNdv = aggsNoNdv ++ vars.map(v => approx_count_distinct(col(v)))
    val aggsNdvCoarse = aggsNoNdv ++
      vars.map(v => approx_count_distinct(col(v), 0.15))
    li.agg(aggsNdv.head, aggsNdv.tail: _*).collect()
    for (i <- 1 to 2) {
      phase(s"agg.nondv[$i]") { li.agg(aggsNoNdv.head, aggsNoNdv.tail: _*).collect(); () }
      phase(s"agg.ndv[$i]") { li.agg(aggsNdv.head, aggsNdv.tail: _*).collect(); () }
      phase(s"agg.ndv15[$i]") { li.agg(aggsNdvCoarse.head, aggsNdvCoarse.tail: _*).collect(); () }
    }
    for (i <- 1 to 2) {
      phase(s"process.fit[$i]") {
        BinningProcess.fit(li, vars, "y", config = BinningConfig())
      }
    }
    spark.stop()
  }
}
