package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

class AdvancedBinningSpec extends AnyFunSuite {

  private def li = {
    val spark = TestSpark.spark
    spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
  }

  test("SBOptimalBinning: shared bins across scenarios, weighted IV") {
    val df = li
    val s1 = df.where(col("l_linenumber") <= 3)
    val s2 = df.where(col("l_linenumber") > 3)
    val fitted = SBOptimalBinning.fit(
      Seq((s1, 0.6), (s2, 0.4)), "l_extendedprice", "y",
      BinningConfig(name = "x", monotonicTrend = Some("ascending")))
    assert(fitted.status == "OPTIMAL")
    assert(fitted.table.tRecords.toLong == df.count())
    // ascending trend on pooled rates
    val rates = fitted.table.eventRate.take(fitted.nDataBins)
    rates.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) <= w(1) + 1e-12,
                                s"rates ${rates.mkString(",")}")
    }
  }

  test("OptimalBinning2D: rectangles cover grid, transform total") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = li
    val fitted = OptimalBinning2D.fit(df, "l_extendedprice", "l_quantity",
                                      "y")
    assert(fitted.status == "OPTIMAL")
    assert(fitted.rects.nonEmpty)
    // rectangles tile the full grid: per-rect counts sum to totals
    val totalN = fitted.rects.map(r => r.event + r.nonevent).sum
    assert(totalN.toLong == df.count(), s"cover $totalN")
    assert(fitted.iv > 0)
    val out = df.select(
      fitted.transform(col("l_extendedprice"), col("l_quantity")).as("w"))
      .as[Double].collect()
    assert(out.forall(v => !v.isNaN))
    assert(out.distinct.length == fitted.rects.length)
  }
}
