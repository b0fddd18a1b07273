package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators._
import graft.pipeline.TextAnalysis

/** Scratch verification driver (round 5 changed surfaces). */
object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf = "/root/testdata/sf0.01"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0)
        .otherwise(0.0))

    // 1. single-variable scorecard: IRLS must land on the closed-form
    // saturated MLE (coef = -1, intercept = ln(te/tne))
    val sc = Scorecard.fit(li, Seq("l_extendedprice"), "y",
      binningConfig = BinningConfig(name = "l_extendedprice",
        userSplits = Some(Array(25000.0, 50000.0, 75000.0)),
        monotonicTrend = None, minNBins = Some(4), maxNBins = Some(4)),
      scaling = Scorecard.ScalingConfig(method = Some("pdo_odds")))
    val t = li.agg(sum("y"), count(lit(1))).collect()(0)
    val b0 = math.log(t.getDouble(0) / (t.getLong(1) - t.getDouble(0)))
    println(f"DRIVE scorecard coef=${sc.coefficients(0)}%.12f " +
      f"(want -1) icpt=${sc.estimatorIntercept}%.12f (want $b0%.12f)")

    // 2. score column stays a single codegen'd projection (no UDF)
    val plan = li.select(sc.scoreColumn().as("score"))
      .queryExecution.executedPlan.toString
    println("DRIVE score plan codegen=" +
      (plan.contains("WholeStageCodegen") || plan.contains("*(")) +
      " udf=" + plan.toLowerCase.contains("batchevalpython"))

    // 3. pinned-splits process path: counts must equal the exact binIdx
    // aggregation (no grid drift)
    val proc = BinningProcess.fit(li, Seq("l_extendedprice"), "y",
      config = BinningConfig(userSplits =
        Some(Array(25000.0, 50000.0, 75000.0)), monotonicTrend = None,
        minNBins = Some(4), maxNBins = Some(4)))
    val tableCounts = proc.fits("l_extendedprice").table.rows
      .take(4).map(_.count.toLong).toSeq
    val exact = li.groupBy(
        when(col("l_extendedprice") < 25000, 0)
          .when(col("l_extendedprice") < 50000, 1)
          .when(col("l_extendedprice") < 75000, 2).otherwise(3).as("b"))
      .agg(count(lit(1))).orderBy("b").collect().map(_.getLong(1)).toSeq
    println(s"DRIVE pinned counts table=$tableCounts exact=$exact " +
      s"match=${tableCounts == exact}")

    // 4. langId kernel: plan shape + quick timing vs the HOF chain
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val lidPlan = docs.select(TextAnalysis.langId(col("text")).as("l"))
      .queryExecution.executedPlan.toString
    println("DRIVE langId codegen=" +
      (lidPlan.contains("WholeStageCodegen") || lidPlan.contains("*(")))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val k = time(docs.groupBy(TextAnalysis.langId(col("text")))
      .count().collect())
    val h = time(docs.groupBy(TextAnalysis.langIdHof(col("text")))
      .count().collect())
    println(f"DRIVE langId kernel=$k%.2fs hof=$h%.2fs speedup=${h / k}%.1fx")

    spark.stop()
  }
}
