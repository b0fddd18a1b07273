package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Stats
import graft.operators._

class AnalysisSpec extends AnyFunSuite {

  test("binning table analysis: tests, quality score, trend type") {
    val spark = TestSpark.spark
    val df = spark.read.parquet(TestSpark.breastCancer)
    val fitted = OptimalBinning.fit(df, "mean radius", "target",
                                    BinningConfig(name = "mean radius"))
    val a = fitted.table.analysis()
    assert(a.adjacentTests.length == fitted.nDataBins - 1)
    a.adjacentTests.foreach { case (stat, p, pab, pba) =>
      assert(p >= 0 && p <= 1)
      assert(math.abs(pab + pba - 1.0) < 1e-9)
    }
    assert(a.qualityScore >= 0 && a.qualityScore <= 1)
    assert(a.cramerV > 0)
    // breast cancer mean radius: benign rate decreases with radius
    assert(a.monotonicTrendType == "descending")
    val fisher = fitted.table.analysis(pvalueTest = "fisher")
    fisher.adjacentTests.foreach { case (_, p, _, _) =>
      assert(p >= 0 && p <= 1)
    }
  }

  test("Stats: hand-derivable values on known inputs") {
    // chi2 for [[10,20],[30,40]]: E=[[12,18],[28,42]],
    // stat = 4/12 + 4/18 + 4/28 + 4/42
    val expected = 4.0 / 12 + 4.0 / 18 + 4.0 / 28 + 4.0 / 42
    val (stat, p, dof) = Stats.chi2Contingency(
      Array(Array(10.0, 20.0), Array(30.0, 40.0)))
    assert(dof == 1)
    assert(math.abs(stat - expected) < 1e-12)
    assert(p > 0 && p < 1)
    // Fisher exact, balanced 2x2 => p = 1
    val (odds1, fp1) = Stats.fisherExact(10, 10, 10, 10)
    assert(odds1 == 1.0 && math.abs(fp1 - 1.0) < 1e-9)
    // degenerate separation is highly significant
    val (_, fp2) = Stats.fisherExact(10, 0, 0, 10)
    assert(fp2 < 1e-4)
    // Welch t: equal stats => t = 0, p = 1
    val (t0, tp0) = Stats.ttestIndFromStats(5, 2, 30, 5, 2, 30)
    assert(t0 == 0.0 && math.abs(tp0 - 1.0) < 1e-12)
    // z-test symmetry
    val (z1, zp1) = Stats.testProportions(10, 20, 20, 10)
    val (z2, zp2) = Stats.testProportions(20, 10, 10, 20)
    assert(math.abs(z1 - z2) < 1e-12 && math.abs(zp1 - zp2) < 1e-12)
    // Bayesian A/B: symmetric posteriors => ~0.5
    val (pab, _) = Stats.bayesianProbability(10, 10, 10, 10, 1000)
    assert(math.abs(pab - 0.5) < 0.02)
  }

  test("YQuantile outlier detector flags per-bin outliers") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val base = (1 to 2000).map { _ =>
      val x = rnd.nextDouble() * 10
      (x, 3 * x + rnd.nextGaussian())
    }
    val outliers = Seq((1.0, 500.0), (9.0, -500.0))
    val df = (base ++ outliers).toDF("x", "y")
    val pred = Outliers.fitYQuantile(df, "x", "y", "zscore", nBins = 4)
    val flagged = df.where(pred).collect()
    assert(flagged.length >= 2 && flagged.length < 50)
    assert(flagged.exists(_.getDouble(1) == 500.0))
    assert(flagged.exists(_.getDouble(1) == -500.0))
  }

  test("outlier detectors match the reference goldens on boston LSTAT") {
    // test_outlier.py:73-91: ModifiedZScoreDetector flags exactly
    // x = [37.97, 36.98]; YQuantileDetector (defaults: 5 bins, zscore)
    // flags 8 rows with x = [7.56, 9.59, 7.26, 11.25, 14.79, 7.44,
    // 9.53, 8.88] and y = [39.8, 33.8, 43.1, 31, 30.7, 50, 50, 50]
    val spark = TestSpark.spark
    val df = spark.read.parquet("src/test/resources/boston_housing.parquet")

    val zx = df.where(Outliers.fitZScore(df, "LSTAT"))
      .select("LSTAT").collect().map(_.getDouble(0)).sorted
    assert(zx.toSeq == Seq(36.98, 37.97), zx.mkString(","))

    val yq = Outliers.fitYQuantile(df, "LSTAT", "target",
                                   detector = "zscore", nBins = 5)
    val rows = df.where(yq).select("LSTAT", "target").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    val expected = Seq((7.26, 43.1), (7.44, 50.0), (7.56, 39.8),
                       (8.88, 50.0), (9.53, 50.0), (9.59, 33.8),
                       (11.25, 31.0), (14.79, 30.7))
    assert(rows.toSeq == expected, rows.mkString(","))
  }

  test("multiclass analysis: adjacent chi2 tests and quality score") {
    val spark = TestSpark.spark
    val o = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
      .withColumn("cls",
        when(col("o_orderstatus") === "F", 0.0)
          .when(col("o_orderstatus") === "P", 1.0).otherwise(2.0))
    val f = MulticlassOptimalBinning.fit(o, "o_totalprice", "cls",
      BinningConfig(name = "o_totalprice"))
    val (tests, quality) = f.analysis()
    assert(tests.length == f.nDataBins - 1)
    tests.foreach { case (_, _, stat, p) =>
      assert(stat >= 0)
      assert(p >= 0 && p <= 1)
    }
    assert(quality >= 0 && quality <= 1, s"quality $quality")
  }

  test("ewmaAnomalies: dyadic weights flag a planted burst, quiet " +
       "days pass, partial-history days excluded, missing days are " +
       "zero-count days") {
    val spark = TestSpark.spark
    import spark.implicits._
    // 20 calendar days of 10 events/day for group "a", except: day 17
    // bursts to 100, and day 12 is MISSING entirely (a gap). W = 3.
    val days = (0 until 20).filter(_ != 12)
    val rows = days.flatMap { d =>
      val n = if (d == 17) 100 else 10
      (0 until n).map(i =>
        ("a", java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(d.toLong * 86400 + i))))
    }
    val df = rows.toDF("g", "ts")
    val got = graft.operators.Monitoring
      .ewmaAnomalies(df, "g", "ts", windowDays = 3, kNum = 3L,
                     kDen = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                           r.getLong(3), r.getLong(4), r.getLong(5)))
    spark.catalog.clearCache()
    assert(got.length == 1)
    val (_, nEval, nAnom, topDay, topN, topEw) = got(0)
    // evaluated days: day >= 0 + 3 and present -> 17 days minus the
    // missing day 12 -> days 3..19 except 12 = 16
    assert(nEval == 16, s"nEval $nEval")
    // burst day 17: baseline (2^3-1=7 scaled) from days 14,15,16 all
    // 10/day -> ew = 10*(4+2+1) = 70; 100*7 > 3*70 -> flagged.
    // day 13 (window contains missing day 12 as zero): ew = 10*4
    // (day 10? no: gaps 1,2,3 -> days 12,11,10 -> 0,10,10 -> weights
    // 4,2,1 -> ew = 0*4 + 10*2 + 10*1 = 30; 10*7 = 70 <= 90 -> pass.
    // day 18 after the burst: ew = 100*4 + 10*2 + 10*1 = 430;
    // 10*7 = 70 <= 1290 -> pass.
    assert(nAnom == 1 && topDay == 17 && topN == 100 && topEw == 70,
           got(0).toString)
  }
}
