package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

class PWAndCounterfactualSpec extends AnyFunSuite {

  private def bc = TestSpark.spark.read.parquet(TestSpark.breastCancer)

  test("PWBinning: continuous piecewise event-rate curve, sane predictions") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = bc
    val pw = PWBinning.fit(df, "mean radius", "target",
                           BinningConfig(name = "mean radius"))
    assert(pw.splits.nonEmpty)
    val preds = df.select(pw.predictColumn(col("mean radius")).as("p"))
      .as[Double].collect()
    assert(preds.forall(p => p >= 0 && p <= 1))
    // piecewise curve must broadly track the descending event rate:
    // low radius -> high benign rate, high radius -> low
    val lo = df.where(col("mean radius") < 12)
      .select(avg(pw.predictColumn(col("mean radius")))).head.getDouble(0)
    val hi = df.where(col("mean radius") > 20)
      .select(avg(pw.predictColumn(col("mean radius")))).head.getDouble(0)
    assert(lo > hi, s"lo $lo hi $hi")
    // continuity: predictions on either side of a split are close
    val s = pw.splits(0)
    val eps = 1e-6
    val just = df.sparkSession.range(1).select(
      pw.predictColumn(lit(s - eps)).as("a"),
      pw.predictColumn(lit(s + eps)).as("b")).head
    assert(math.abs(just.getDouble(0) - just.getDouble(1)) < 1e-4)
  }

  test("Counterfactual: minimal bin changes flip the outcome") {
    val df = bc
    val sc = Scorecard.fit(df, Seq("mean radius", "mean texture",
                                   "mean perimeter"), "target")
    // pick an instance predicted low-probability and ask to exceed 0.8
    val row = df.select(col("mean radius"), col("mean texture"),
                        col("mean perimeter"),
                        sc.predictProbaColumn().as("p"))
      .where(col("p") < 0.3).head
    val bins = sc.selected.map { v =>
      val f = sc.process.fits(v)
      val x = row.getDouble(row.fieldIndex(v))
      v -> f.splits.count(_ <= x)
    }.toMap
    val cfs = Counterfactual.generate(sc, bins, 0.8, outcomeGe = true,
                                      maxChanges = 2, nCounterfactuals = 2)
    assert(cfs.nonEmpty)
    cfs.foreach { cf =>
      assert(cf.probability >= 0.8)
      assert(cf.nChanges <= 2 && cf.nChanges >= 1)
    }
    // diversity: the two counterfactuals differ
    if (cfs.length == 2) assert(cfs(0).changes != cfs(1).changes)

    // actionable_features: changes confined to the allowed set
    val cfa = Counterfactual.generate(sc, bins, 0.8, outcomeGe = true,
      maxChanges = 2, nCounterfactuals = 1,
      actionableFeatures = Some(Set("mean radius")))
    cfa.foreach(cf =>
      assert(cf.changes.keySet.subsetOf(Set("mean radius")), cf.changes))
  }

  test("min_max scaling contracts: plain, intercept_based, reverse " +
       "(test_scorecard.py:262-306)") {
    val spark = TestSpark.spark
    val df = spark.read.parquet(TestSpark.breastCancer)
    val vars = df.columns.filter(_ != "target").toSeq

    def minMaxSums(sc: FittedScorecard): (Double, Double) = {
      val byVar = sc.pointsTable.groupBy(_.variable)
      (byVar.values.map(_.map(_.points).min).sum,
       byVar.values.map(_.map(_.points).max).sum)
    }

    val plain = Scorecard.fit(df, vars, "target",
      scaling = Scorecard.ScalingConfig(method = Some("min_max"),
                                        min = 300, max = 850))
    val (pMin, pMax) = minMaxSums(plain)
    assert(math.abs(pMin - 300) < 1e-6, pMin)
    assert(math.abs(pMax - 850) < 1e-6, pMax)

    val ib = Scorecard.fit(df, vars, "target",
      scaling = Scorecard.ScalingConfig(method = Some("min_max"),
                                        min = 300, max = 850,
                                        interceptBased = true))
    val (iMin, iMax) = minMaxSums(ib)
    assert(math.abs(iMin - (300 - ib.baseIntercept)) < 1e-6,
           s"$iMin vs ${300 - ib.baseIntercept}")
    assert(math.abs(iMax - (850 - ib.baseIntercept)) < 1e-6,
           s"$iMax vs ${850 - ib.baseIntercept}")

    val rev = Scorecard.fit(df, vars, "target",
      scaling = Scorecard.ScalingConfig(method = Some("min_max"),
                                        min = 300, max = 850,
                                        reverseScorecard = true))
    val (rMin, rMax) = minMaxSums(rev)
    assert(math.abs(rMin - 300) < 1e-6, rMin)
    assert(math.abs(rMax - 850) < 1e-6, rMax)
  }

  test("rounding preserves exact min/max total score " +
       "(test_scorecard.py:310-332)") {
    val spark = TestSpark.spark
    val df = spark.read.parquet(TestSpark.breastCancer)
    val vars = df.columns.filter(_ != "target").toSeq
    val sc = Scorecard.fit(df, vars, "target",
      scaling = Scorecard.ScalingConfig(method = Some("min_max"),
                                        min = 200, max = 851,
                                        rounding = true))
    val byVar = sc.pointsTable.groupBy(_.variable)
    // every point is an integer
    sc.pointsTable.foreach(r =>
      assert(r.points == math.rint(r.points), s"${r.variable} ${r.points}"))
    // the reference MIP contract: sums of per-variable minima/maxima hit
    // the scaling bounds exactly after rounding
    val scMin = byVar.values.map(_.map(_.points).min).sum
    val scMax = byVar.values.map(_.map(_.points).max).sum
    assert(scMin == 200.0, s"scMin $scMin")
    assert(scMax == 851.0, s"scMax $scMax")
  }
}
