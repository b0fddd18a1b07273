package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Curation, Dedup, TextAnalysis}

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = "/root/testdata/sf0.01"
    val d = spark.read.parquet(s"$dir/documents.parquet")

    // 0. stability-report phase timing at sf0.1
    {
      val li0 = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .withColumn("y", when(col("l_returnflag") === "R", 1.0)
          .otherwise(0.0))
      def tm[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"DRIVE phase $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      (1 to 2).foreach { pass =>
        println(s"DRIVE pass $pass")
        val sc = tm("scorecard.fit") {
          graft.operators.Scorecard.fit(li0,
            Seq("l_extendedprice", "l_quantity"), "y")
        }
        val expected = li0.where(col("l_orderkey") % 2 === 0)
        val actual = li0.where(col("l_orderkey") % 2 === 1)
        val mon = new graft.operators.ScorecardMonitoring(sc,
          psiNBins = 10, psiMethod = "cart", psiYCol = Some("y"))
        val psi = tm("psiTotal") { mon.psiTotal(expected, actual) }
        val tests = tm("sigTests") {
          mon.significanceTests(expected, actual, "y") }
        val perf = tm("performance") { mon.performance(expected, actual, "y") }
        println(s"DRIVE psi=$psi nTests=${tests.length} " +
                s"gini=${perf("gini_expected")}")
      }
    }

    // 1. end-to-end curation pass over the real documents table
    val curated = Curation.curate(d, "text", "doc_id", qualityFrac = 0.25)
    val bySplit = curated.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(s"DRIVE curate input=${d.count()} output=${bySplit.values.sum} " +
            s"splits=$bySplit")

    // 2. contamination: corpus vs first-20-doc benchmark
    val hits = Dedup.contamination(d.where(col("doc_id") >= 20),
                                   d.where(col("doc_id") < 20),
                                   "text", "doc_id", n = 5)
    println("DRIVE contamination " +
      hits.agg(count(lit(1)), sum("n_matched_grams")).collect()(0))

    // 3. plan shape: curation scoring/scrub/split is projection-only over
    //    the scan (no shuffle besides the dedup aggregate), and the
    //    contamination join broadcasts the benchmark gram side
    val scrubPlan = d.select(TextAnalysis.redactPii(col("text")).as("t"),
                             Curation.hashSplit(col("doc_id")).as("s"))
      .queryExecution.executedPlan.toString
    println("DRIVE scrubPlan exchanges=" +
      "Exchange".r.findAllIn(scrubPlan).length +
      " codegen=" + scrubPlan.contains("WholeStageCodegen"))
    val contPlan = hits.queryExecution.executedPlan.toString
    println("DRIVE contPlan broadcast=" +
      contPlan.contains("BroadcastHashJoin"))

    // 4. streaming drift monitor over real lineitem scores: trajectory
    //    equals batch PSI on the union of the micro-batches
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val splits = Array(25000.0, 50000.0, 75000.0)
    val expectedCohort = li.where(col("l_orderkey") % 2 === 0)
      .select(col("l_extendedprice").as("score"))
    val mon = graft.streaming.StreamingDriftMonitor
      .fromExpected(expectedCohort, "score", splits)
    val actualCohort = li.where(col("l_orderkey") % 2 === 1)
      .select(col("l_extendedprice").as("score"))
    mon.add(actualCohort.where(col("score") < 40000))
    mon.add(actualCohort.where(col("score") >= 40000))
    val batchPsi = graft.operators.Monitoring
      .psi(expectedCohort, actualCohort, "score", splits)
      .agg(sum("psi")).collect()(0).getDouble(0)
    println(s"DRIVE drift streaming=${mon.psiTotal} batch=$batchPsi " +
      s"equal=${math.abs(mon.psiTotal - batchPsi) < 1e-12} " +
      s"verdict=${mon.verdict}")

    // 5. balanced class weights on the real binary target make the
    //    weighted event mass equal the nonevent mass
    val liY = li.withColumn("y",
      when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
    val cw = graft.operators.OptimalBinning.balancedClassWeight(liY, "y")
    val fitted = graft.operators.OptimalBinning.fit(liY,
      "l_extendedprice", "y",
      graft.operators.BinningConfig(name = "x", classWeight = Some(cw)))
    val tbl = fitted.table
    println(s"DRIVE balanced cw=$cw binsEventMass=" +
      f"${tbl.rows.map(_.event).sum}%.2f nonEventMass=" +
      f"${tbl.rows.map(_.nonevent).sum}%.2f status=${fitted.status}")

    spark.stop()
  }
}
