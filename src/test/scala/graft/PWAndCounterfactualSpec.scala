package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

class PWAndCounterfactualSpec extends AnyFunSuite {

  private def bc = TestSpark.spark.read.parquet(TestSpark.breastCancer)

  test("PWBinning default (logistic estimator) matches the reference " +
       "golden IV") {
    // test_binning_piecewise.py:172-177: mean radius, defaults ->
    // binning_table IV 5.87474602. The curve target is a 1-feature
    // L2-regularized logistic regression's probabilities; we solve the
    // LR by exact Newton while sklearn's lbfgs stops at tol=1e-4, so
    // parity is asserted at 1e-3 relative (measured gap ~5e-4).
    val spark = TestSpark.spark
    val df = spark.read.parquet(TestSpark.breastCancer)
    val f = PWBinning.fit(df, "mean radius", "target",
                          BinningConfig(name = "mean radius"))
    assert(math.abs(f.asymptoticIv - 5.87474602) / 5.87474602 < 1e-3,
           s"asymptotic iv ${f.asymptoticIv}")
    // the empirical-rate target is a materially different curve
    val fe = PWBinning.fit(df, "mean radius", "target",
                           BinningConfig(name = "mean radius"),
                           estimator = "empirical")
    assert(math.abs(fe.asymptoticIv - f.asymptoticIv) > 0.1)
  }

  test("ContinuousOptimalPWBinning default transform matches the " +
       "reference golden") {
    // test_continuous_binning_piecewise.py:33-39: LSTAT defaults; the
    // auto trend resolves to descending and the constrained exact QP
    // reproduces ropwr to ~1e-9
    val spark = TestSpark.spark
    val df = spark.read.parquet("src/test/resources/boston_housing.parquet")
    val f = PWBinning.fitContinuous(df, "LSTAT", "target",
                                    BinningConfig(name = "LSTAT"))
    val got = df.limit(3)
      .select(f.predictColumn(col("LSTAT")).as("p"))
      .collect().map(_.getDouble(0))
    val expected = Array(31.46014643, 23.87619986, 37.31237732)
    got.zip(expected).foreach { case (a, b) =>
      assert(math.abs(a - b) / b < 1e-6, s"$a vs $b")
    }
  }

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

  test("PWBinning: degree-2 curve is C1-continuous at knots") {
    val df = bc
    val pw = PWBinning.fit(df, "mean radius", "target",
                           BinningConfig(name = "mean radius"), degree = 2)
    val s = pw.splits(0)
    val h = 1e-5
    val r = df.sparkSession.range(1).select(
      pw.predictColumn(lit(s - h)).as("a"),
      pw.predictColumn(lit(s + h)).as("b"),
      // one-sided slopes
      ((pw.predictColumn(lit(s - h)) - pw.predictColumn(lit(s - 2 * h)))
        / h).as("dl"),
      ((pw.predictColumn(lit(s + 2 * h)) - pw.predictColumn(lit(s + h)))
        / h).as("dr")).head
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-4)
    assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-2,
           s"slopes ${r.getDouble(2)} vs ${r.getDouble(3)}")
  }

  test("PWBinning: monotonic descending constraint holds everywhere") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = bc
    val pw = PWBinning.fit(df, "mean radius", "target",
                           BinningConfig(name = "mean radius"),
                           monotonicTrend = Some("descending"))
    // evaluate on a dense grid: predictions must never increase
    val grid = (0 to 400).map(i => 5.0 + i * 0.06)
    val preds = grid.toDF("x")
      .select(pw.curve.predict(col("x")).as("p"))
      .as[Double].collect()
    preds.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"increase $a -> $b")
    }
  }

  test("PWBinning: l1 objective resists a corrupted histogram cell") {
    val spark = TestSpark.spark
    import spark.implicits._
    // clean linear relation + one massive outlier cell
    val base = (1 to 300).map(i => (i.toDouble, i.toDouble))
    val rows = base ++ Seq.fill(5)((150.0, 10000.0))
    val df = rows.toDF("x", "y")
    val cfg = BinningConfig(name = "x", monotonicTrend = None)
    val l2 = PWBinning.fitContinuous(df, "x", "y", cfg)
    val l1 = PWBinning.fitContinuous(df, "x", "y", cfg, objective = "l1")
    def predAt(f: PWBinning.FittedContPW, v: Double): Double =
      df.sparkSession.range(1).select(f.predictColumn(lit(v))).head
        .getDouble(0)
    // the l1 fit should stay near the y=x line at x=150; l2 gets pulled
    val e1 = math.abs(predAt(l1, 150.0) - 150.0)
    val e2 = math.abs(predAt(l2, 150.0) - 150.0)
    assert(e1 < e2, s"l1 err $e1 l2 err $e2")
    assert(e1 < 30.0, s"l1 err $e1")
  }

  test("PWBinning: discontinuous per-bin fit predicts bin means (deg 0)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = bc
    val pw = PWBinning.fit(df, "mean radius", "target",
                           BinningConfig(name = "mean radius"), degree = 0)
    // degree-0 prediction inside a bin equals that bin's event rate
    val er = df
      .where(col("mean radius") < pw.splits(0))
      .agg(avg(col("target"))).head.getDouble(0)
    val p = df.sparkSession.range(1)
      .select(pw.predictColumn(lit(pw.splits(0) - 0.5))).head.getDouble(0)
    assert(math.abs(p - er) < 0.05, s"pred $p er $er")
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

  test("Counterfactual objectives: weighted and hierarchical methods") {
    val df = bc
    val sc = Scorecard.fit(df, Seq("mean radius", "mean texture",
                                   "mean perimeter"), "target")
    assert(sc.woeStats.isDefined, "closeness basis should be available")
    val row = df.select(col("mean radius"), col("mean texture"),
                        col("mean perimeter"),
                        sc.predictProbaColumn().as("p"))
      .where(col("p") < 0.3).head
    val bins = sc.selected.map { v =>
      val f = sc.process.fits(v)
      val x = row.getDouble(row.fieldIndex(v))
      v -> f.splits.count(_ <= x)
    }.toMap

    val weighted = Counterfactual.generate(sc, bins, 0.8, outcomeGe = true,
      maxChanges = 2, method = "weighted")
    assert(weighted.nonEmpty)
    assert(weighted.head.objectives.contains("proximity"))
    assert(weighted.head.objectives.contains("closeness"))
    assert(weighted.head.objectives.values.forall(_ >= 0))

    val hier = Counterfactual.generate(sc, bins, 0.8, outcomeGe = true,
      maxChanges = 2, method = "hierarchical")
    assert(hier.nonEmpty)
    assert(hier.head.probability >= 0.8)

    // proximity-only weighted search returns the minimum-proximity CF:
    // no other satisfying candidate may have smaller proximity
    val proxOnly = Counterfactual.generate(sc, bins, 0.8, outcomeGe = true,
      maxChanges = 1, method = "weighted",
      objectives = Some(Map("proximity" -> 1.0)))
    val brute = for {
      (v, i) <- sc.selected.zipWithIndex
      f = sc.process.fits(v)
      woe = f.table.woe.take(f.nDataBins)
      cur = bins(v)
      b <- woe.indices if b != cur
      linear = sc.selected.zipWithIndex.map { case (v2, j) =>
        val f2 = sc.process.fits(v2)
        val w2 = f2.table.woe.take(f2.nDataBins)
        (if (v2 == v) w2(b) else w2(bins(v2))) * sc.coefficients(j)
      }.sum + sc.estimatorIntercept
      p = 1.0 / (1.0 + math.exp(-linear)) if p >= 0.8
      range = woe.max - woe.min if range > 0
    } yield math.abs(woe(b) - woe(cur)) / range
    if (proxOnly.nonEmpty && brute.nonEmpty)
      assert(proxOnly.head.objectives("proximity") <= brute.min + 1e-9,
             s"${proxOnly.head.objectives} vs brute ${brute.min}")
  }

  test("Scorecard default (sklearn-C=1 logistic) matches the reference " +
       "golden points range") {
    // test_scorecard.py:170-190: all 30 breast-cancer variables,
    // LogisticRegression() estimator, no scaling -> per-variable
    // min/max Points sums -43.5354465 / 42.5576096. sklearn C=1 maps
    // to regParam = 1/(C*W). The golden embeds an UNCONVERGED sklearn
    // fit (lbfgs caps at max_iter=100 on this dataset and warns); the
    // driver Newton reaches the true optimum, so parity is asserted at
    // 1% (measured gap ~0.3%).
    val spark = TestSpark.spark
    val df = spark.read.parquet(TestSpark.breastCancer)
    val vars = df.columns.filter(_ != "target").toSeq
    val n = df.count().toDouble
    val sc = Scorecard.fit(df, vars, "target", regParam = 1.0 / n)
    val byVar = sc.pointsTable.groupBy(_.variable)
    assert(byVar.size == 30)
    val scMin = byVar.values.map(_.map(_.points).min).sum
    val scMax = byVar.values.map(_.map(_.points).max).sum
    assert(math.abs(scMin - (-43.5354465)) / 43.5354465 < 1e-2,
           s"min $scMin")
    assert(math.abs(scMax - 42.5576096) / 42.5576096 < 1e-2,
           s"max $scMax")
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

  test("Counterfactual outcome-range and diff_outcome soft constraint") {
    val df = bc
    val sc = Scorecard.fit(df, Seq("mean radius", "mean texture",
                                   "mean perimeter"), "target")
    val row = df.select(col("mean radius"), col("mean texture"),
                        col("mean perimeter"),
                        sc.predictProbaColumn().as("p"))
      .where(col("p") < 0.3).head
    val bins = sc.selected.map { v =>
      val f = sc.process.fits(v)
      val x = row.getDouble(row.fieldIndex(v))
      v -> f.splits.count(_ <= x)
    }.toMap
    // hard window: probability must land inside [0.5, 0.7]
    val windowed = Counterfactual.generate(sc, bins, 0.6, outcomeGe = true,
      maxChanges = 2, outcomeRange = Some((0.5, 0.7)))
    windowed.foreach { cf =>
      assert(cf.probability >= 0.5 && cf.probability <= 0.7, cf)
    }
    // diff_outcome pulls the chosen CF's probability toward the target
    val free = Counterfactual.generate(sc, bins, 0.8, outcomeGe = true,
      maxChanges = 2)
    val pulled = Counterfactual.generate(sc, bins, 0.8, outcomeGe = true,
      maxChanges = 2, softDiffOutcome = 100.0)
    if (free.nonEmpty && pulled.nonEmpty)
      assert(math.abs(pulled.head.probability - 0.8) <=
             math.abs(free.head.probability - 0.8) + 1e-9)
  }
}
