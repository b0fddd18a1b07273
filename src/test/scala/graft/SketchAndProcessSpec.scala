package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._
import graft.streaming._

class SketchAndProcessSpec extends AnyFunSuite {

  private def li = {
    val spark = TestSpark.spark
    spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .withColumn("y", when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
  }

  test("GK sketch: quantiles within eps of exact") {
    val gk = new GKSketch(0.01)
    val rnd = new scala.util.Random(7)
    val values = Array.fill(20000)(rnd.nextDouble() * 100)
    values.foreach(gk.add)
    val sorted = values.sorted
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val approx = gk.quantile(q)
      val rank = sorted.indexWhere(_ >= approx)
      assert(math.abs(rank.toDouble / values.length - q) < 0.02,
             s"q=$q approx=$approx rank=$rank")
    }
  }

  test("GK merge associativity: split-merge matches single-feed counts") {
    val rnd = new scala.util.Random(11)
    val values = Array.fill(9000)(rnd.nextDouble() * 50)
    val whole = new GKSketch(0.01)
    values.foreach(whole.add)
    val parts = values.grouped(3000).map { chunk =>
      val g = new GKSketch(0.01); chunk.foreach(g.add); g
    }.toSeq
    val merged = new GKSketch(0.01)
    parts.foreach(merged.merge)
    assert(merged.n == whole.n)
    for (q <- Seq(0.25, 0.5, 0.75)) {
      val a = merged.quantile(q)
      val b = whole.quantile(q)
      val sorted = values.sorted
      val ra = sorted.indexWhere(_ >= a).toDouble / values.length
      val rb = sorted.indexWhere(_ >= b).toDouble / values.length
      assert(math.abs(ra - rb) < 0.05, s"q=$q ranks $ra vs $rb")
    }
  }

  test("OptimalBinningSketch: batch add+solve approximates exact fit") {
    val df = li
    val sk = new OptimalBinningSketch(
      BinningConfig(name = "l_extendedprice", monotonicTrend = None),
      eps = 1e-3)
    sk.add(df, "l_extendedprice", "y")
    val fitted = sk.solve()
    assert(fitted.status == "OPTIMAL")
    assert(fitted.table.tRecords.toLong == df.count())
    // sketch-counted IV close to an exact quantile-prebinned fit
    val exact = OptimalBinning.fit(df, "l_extendedprice", "y",
      BinningConfig(name = "x", prebinningMethod = "quantile",
                    monotonicTrend = None))
    assert(math.abs(fitted.table.iv - exact.table.iv) < 0.05,
           s"sketch iv ${fitted.table.iv} exact iv ${exact.table.iv}")
  }

  test("OptimalBinningSketch: incremental adds equal single add") {
    val df = li
    val whole = new OptimalBinningSketch(
      BinningConfig(monotonicTrend = None), eps = 1e-3)
    whole.add(df, "l_extendedprice", "y")
    val parts = new OptimalBinningSketch(
      BinningConfig(monotonicTrend = None), eps = 1e-3)
    parts.add(df.where(col("l_orderkey") % 2 === 0), "l_extendedprice", "y")
    parts.add(df.where(col("l_orderkey") % 2 === 1), "l_extendedprice", "y")
    assert(whole.sketch.n == parts.sketch.n)
    val a = whole.solve(); val b = parts.solve()
    // counts agree within sketch eps tolerance
    assert(math.abs(a.table.iv - b.table.iv) < 0.05)

    // solve trajectory (`binning_sketch.py:944-961`): one stat per solve,
    // carrying add-count, record-count and the solved divergence
    parts.solve()
    val stats = parts.solveStats
    assert(stats.length == 2)
    assert(stats.forall(_.nAdd == 2))
    assert(stats.forall(_.nRecords == parts.sketch.n))
    assert(stats.forall(s => s.divergence > 0))
    assert(math.abs(stats(0).divergence - b.table.iv) < 1e-12)
  }

  test("BinningProcess: multi-variable single-shuffle fit + transform") {
    val df = li
    val proc = BinningProcess.fit(
      df, Seq("l_extendedprice", "l_quantity", "l_discount",
              "l_returnflag"),
      "y", config = BinningConfig())
    assert(proc.fits.size == 4)
    assert(proc.fits("l_returnflag").config.dtype == "categorical")
    // per-variable fits equal the single-variable path
    val single = OptimalBinning.fit(df, "l_extendedprice", "y",
                                    BinningConfig(name = "l_extendedprice"))
    assert(proc.fits("l_extendedprice").splits.toSeq == single.splits.toSeq)
    val out = proc.transform(df, "woe")
    assert(out.columns.length == 4)
    assert(out.count() == df.count())
  }

  test("BinningProcess: getBinnedVariable / updated / information") {
    val proc = BinningProcess.fit(
      li, Seq("l_extendedprice", "l_quantity"), "y",
      config = BinningConfig())
    assert(proc.getBinnedVariable("l_quantity").eq(proc.fits("l_quantity")))
    intercept[IllegalArgumentException] {
      proc.getBinnedVariable("nope")
    }
    // update one variable with a hand-refit (coarser) model
    val refit = OptimalBinning.fit(li, "l_quantity", "y",
      BinningConfig(name = "l_quantity", maxNBins = Some(2)))
    val upd = proc.updated("l_quantity", refit)
    assert(upd.fits("l_quantity").eq(refit))
    assert(upd.fits("l_extendedprice").eq(proc.fits("l_extendedprice")))
    assert(proc.fits("l_quantity").ne(refit)) // original untouched
    intercept[IllegalArgumentException] {
      proc.updated("nope", refit)
    }
    val info = proc.information()
    assert(info.contains("2 variables") && info.contains("selected"))
  }

  test("BinningProcess: wide batch (chunked Pass A/B) matches the " +
       "narrow path across chunk boundaries") {
    val dfBase = li.select(col("y"), col("l_extendedprice"),
                           col("l_quantity"))
    // 120 derived variables: Pass A runs as several concurrent
    // <= 256-expression aggregate chunks and Pass B as a union of
    // 16-var stack melts — variables from the first, a middle, and the
    // last chunk must all agree with a narrow fit (pins the
    // global-index bookkeeping across chunk seams)
    val wideVars = (0 until 120).map(i => s"v$i")
    val wide = wideVars.zipWithIndex.foldLeft(dfBase) { case (d, (v, i)) =>
      d.withColumn(v, col("l_extendedprice") * (1.0 + i / 200.0) +
                      col("l_quantity") * i)
    }
    val proc = BinningProcess.fit(wide, wideVars, "y",
                                  config = BinningConfig())
    assert(proc.fits.size == 120)
    val probeVars = Seq("v0", "v7", "v16", "v77", "v119")
    val narrow = BinningProcess.fit(wide, probeVars, "y",
                                    config = BinningConfig())
    for (v <- probeVars) {
      assert(proc.fits(v).splits.toSeq == narrow.fits(v).splits.toSeq, v)
      assert(math.abs(proc.fits(v).iv - narrow.fits(v).iv) < 1e-12, v)
    }
  }

  test("BinningProcess: per-variable specialCodes override is honored " +
       "in the batch path") {
    val df = li
    // l_linenumber in 1..7: treat {1.0} as special for ONE variable only
    val ov = Map("l_linenumber" ->
      BinningConfig(specialCodes = Some(SpecialList(Seq(1.0)))))
    val proc = BinningProcess.fit(
      df, Seq("l_linenumber", "l_quantity"), "y",
      config = BinningConfig(), varOverrides = ov)
    val single = OptimalBinning.fit(df, "l_linenumber", "y",
      BinningConfig(name = "l_linenumber",
                    specialCodes = Some(SpecialList(Seq(1.0)))))
    val batchFit = proc.fits("l_linenumber")
    assert(batchFit.splits.toSeq == single.splits.toSeq)
    // Special row carries the count of l_linenumber == 1 rows
    val nSpecial = df.where(col("l_linenumber") === 1).count()
    val specialRow = batchFit.table.rows
      .find(_.bin == "Special").get
    assert(specialRow.count.toLong == nSpecial,
           s"special ${specialRow.count} vs $nSpecial")
    // the un-overridden variable is untouched by the override
    val plain = OptimalBinning.fit(df, "l_quantity", "y",
                                   BinningConfig(name = "l_quantity"))
    assert(proc.fits("l_quantity").splits.toSeq == plain.splits.toSeq)
  }

  test("BinningProcess: categoricalVariables forces numeric into " +
       "categorical batch") {
    val df = li
    val proc = BinningProcess.fit(
      df, Seq("l_extendedprice", "l_linenumber"), "y",
      config = BinningConfig(),
      categoricalVariables = Seq("l_linenumber"))
    assert(proc.fits("l_linenumber").config.dtype == "categorical")
    assert(proc.fits("l_extendedprice").config.dtype == "numerical")
    // transform stays total over the forced-categorical column
    val out = proc.transform(df, "woe")
    assert(out.where(col("l_linenumber").isNull).count() == 0)
  }

  test("BinningProcess: categorical batch pools the tail beyond the " +
       "histogram budget") {
    val df = li
    // cap of 1 on a 3-category column forces the top-K + pooled-tail
    // path; every row still lands in a bin and totals are preserved
    val proc = BinningProcess.fit(
      df, Seq("l_returnflag"), "y",
      config = BinningConfig(histogramMaxBuckets = 1))
    val f = proc.fits("l_returnflag")
    assert(f.table.nRecords.sum.toLong == df.count(),
           s"totals ${f.table.nRecords.sum}")
    val out = proc.transform(df, "woe")
    assert(out.where(col("l_returnflag").isNull).count() == 0)
  }

  test("Scorecard: fit + score monotone in event probability") {
    val spark = TestSpark.spark
    val df = li
    val sc = Scorecard.fit(df, Seq("l_extendedprice", "l_quantity"), "y",
      scaling = Scorecard.ScalingConfig(method = Some("pdo_odds"),
                                        rounding = true))
    assert(sc.pointsTable.nonEmpty)
    val scored = df.select(col("y"), sc.scoreColumn().as("score"),
                           sc.predictProbaColumn().as("p"))
    val row = scored.agg(corr(col("score"), col("p"))).head
    // pdo_odds: higher score => lower event probability (negative corr)
    assert(row.getDouble(0) < 0, s"corr ${row.getDouble(0)}")
  }

  test("Scorecard.table styles: summary vs detailed columns") {
    val spark = TestSpark.spark
    val sc = Scorecard.fit(li, Seq("l_extendedprice", "l_quantity"), "y")
    val summary = sc.table(spark)
    assert(summary.columns.toSeq == Seq("variable", "bin", "points"))
    val detailed = sc.table(spark, "detailed")
    assert(detailed.columns.toSeq == Seq("variable", "bin_id", "bin",
      "count", "event_rate", "woe", "coefficient", "points"))
    assert(summary.count() == detailed.count() && summary.count() > 0)
    intercept[IllegalArgumentException] { sc.table(spark, "nope") }
  }

  test("Scorecard metric_special/metric_missing: reference-default zero " +
       "points on special bins, empirical restores fitted WoE") {
    val df = li
    // treat quantity 1 as a special code so special rows exist
    val cfg = BinningConfig(
      specialCodes = Some(SpecialList(Seq(1.0))))
    val sc0 = Scorecard.fit(df, Seq("l_quantity", "l_extendedprice"), "y",
                            binningConfig = cfg)
    val f = sc0.process.fits("l_quantity")
    val nOthers = 0
    val specialRows = sc0.pointsTable.filter(r =>
      r.variable == "l_quantity" && r.binId >= f.nDataBins + nOthers &&
      r.binId < f.table.rows.length - 1)
    assert(specialRows.nonEmpty)
    // default metric_special = 0 -> special points = 0 * coef = 0
    assert(specialRows.forall(_.points == 0.0),
           specialRows.map(_.points).mkString(","))
    // missing row too (no missing values in lineitem, but the row exists)
    val missingRow = sc0.pointsTable.filter(r =>
      r.variable == "l_quantity" &&
      r.binId == f.table.rows.length - 1).head
    assert(missingRow.points == 0.0)

    val scE = Scorecard.fit(df, Seq("l_quantity", "l_extendedprice"), "y",
                            binningConfig = cfg,
                            metricSpecial = "empirical",
                            metricMissing = "empirical")
    val specialE = scE.pointsTable.filter(r =>
      r.variable == "l_quantity" && r.binId >= f.nDataBins &&
      r.binId < f.table.rows.length - 1)
    // empirical: points = fitted WoE * coef (nonzero for a populated bin)
    assert(specialE.exists(r => r.points != 0.0 && r.count > 0))
  }

  test("Scorecard: driver IRLS matches the spark.ml estimator") {
    val df = li
    // regParam = 0 -> driver-side IRLS on the compact aggregate;
    // regParam = 1e-9 -> spark.ml L-BFGS path with a negligible penalty.
    // Both converge to the same MLE within the L-BFGS tolerance.
    val irls = Scorecard.fit(df, Seq("l_extendedprice", "l_quantity"), "y")
    val lbfgs = Scorecard.fit(df, Seq("l_extendedprice", "l_quantity"),
                              "y", regParam = 1e-9)
    irls.coefficients.zip(lbfgs.coefficients).foreach { case (a, b) =>
      assert(math.abs(a - b) < 5e-3 * math.max(1.0, math.abs(b)),
             s"coef $a vs $b")
    }
    assert(math.abs(irls.estimatorIntercept - lbfgs.estimatorIntercept)
             < 5e-3 * math.max(1.0, math.abs(lbfgs.estimatorIntercept)))

    // continuous target: driver WLS on the grouped sufficient statistics
    // equals spark.ml LinearRegression on the row-level transform
    val csc = Scorecard.fitContinuousTarget(
      df, Seq("l_quantity", "l_discount"), "l_extendedprice")
    val xt = df.select(
      csc.fits("l_quantity").transform(col("l_quantity"), "mean")
        .as("l_quantity"),
      csc.fits("l_discount").transform(col("l_discount"), "mean")
        .as("l_discount"),
      col("l_extendedprice").cast("double").as("label"))
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("l_quantity", "l_discount"))
      .setOutputCol("features").transform(xt)
    val m = new org.apache.spark.ml.regression.LinearRegression()
      .setStandardization(false).fit(assembled)
    csc.coefficients.zip(m.coefficients.toArray).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6 * math.max(1.0, math.abs(b)),
             s"coef $a vs $b")
    }
    assert(math.abs(csc.estimatorIntercept - m.intercept)
             < 1e-6 * math.max(1.0, math.abs(m.intercept)))
    // scoring projection is total
    assert(df.select(csc.scoreColumn().as("s")).where(col("s").isNull)
             .count() == 0)
  }

  test("Multiclass binning: fit + mean_woe transform totality") {
    val spark = TestSpark.spark
    val df = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
      .withColumn("y", when(col("o_orderstatus") === "F", 0.0)
        .when(col("o_orderstatus") === "P", 1.0).otherwise(2.0))
    val fitted = MulticlassOptimalBinning.fit(df, "o_totalprice", "y",
                                              BinningConfig(name = "tp"))
    assert(fitted.status == "OPTIMAL")
    assert(fitted.classes.toSeq == Seq(0.0, 1.0, 2.0))
    val out = df.select(fitted.transform(col("o_totalprice")).as("mw"))
    assert(out.where(col("mw").isNull).count() == 0)
    assert(fitted.js >= 0)

    // per-class explicit trend list (reference's list-form monotonic_trend)
    val fitted2 = MulticlassOptimalBinning.fit(df, "o_totalprice", "y",
      BinningConfig(name = "tp"),
      trendPerClass = Some(Seq(Some("ascending"), None,
                               Some("descending"))))
    assert(fitted2.status == "OPTIMAL")
    // per-class event-rate curves over merged DATA bins respect the trends
    val n = fitted2.nDataBins
    def rates(c: Int): Seq[Double] = (0 until n).map(i =>
      fitted2.nEvent(i)(c) / fitted2.nRecords(i))
    rates(0).sliding(2).foreach(w =>
      if (w.length == 2) assert(w(0) <= w(1) + 1e-12, w.mkString(",")))
    rates(2).sliding(2).foreach(w =>
      if (w.length == 2) assert(w(0) >= w(1) - 1e-12, w.mkString(",")))
  }

  test("BinningProcessSketch: per-variable sketches via one melted agg") {
    val df = li
    val ps = new graft.streaming.BinningProcessSketch(
      Seq("l_extendedprice", "l_quantity"),
      BinningConfig(monotonicTrend = None), eps = 1e-3)
    ps.add(df, "y")
    val solved = ps.solveAll()
    assert(solved.size == 2)
    solved.values.foreach(f => assert(f.status == "OPTIMAL"))
    assert(ps.sketch("l_extendedprice").sketch.n == df.count())
  }

  test("sketch binning reproduces breast-cancer goldens within 1% " +
       "(test_binning_sketch.py:123-136)") {
    val spark = TestSpark.spark
    val df = spark.read.parquet(TestSpark.breastCancer)
    // 1% is the reference's tolerance for GK (its tested path); the
    // t-digest ladder interpolates centroids, so allow 3% there
    for ((sk, tol) <- Seq(("gk", 1e-2), ("t-digest", 3e-2))) {
      val optb = new OptimalBinningSketch(
        BinningConfig(name = "mean radius"), eps = 1e-4, sketchType = sk)
      optb.add(df, "mean radius", "target")
      val f = optb.solve()
      assert(f.status == "OPTIMAL", sk)
      assert(math.abs(f.table.iv - 5.04392547) / 5.04392547 < tol,
             s"$sk iv ${f.table.iv}")
      assert(math.abs(f.table.gini - 0.87541620) / 0.87541620 < tol,
             s"$sk gini ${f.table.gini}")
      assert(math.abs(f.table.js - 0.39378376) / 0.39378376 < tol,
             s"$sk js ${f.table.js}")
    }
  }

  test("t-digest: quantiles accurate, tails tighter than interior") {
    val td = new TDigest(100)
    val rnd = new scala.util.Random(17)
    val values = Array.fill(50000)(rnd.nextGaussian() * 10 + 50)
    values.foreach(td.add)
    assert(td.n == 50000)
    val sorted = values.sorted
    for (q <- Seq(0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999)) {
      val approx = td.quantile(q)
      val rank = sorted.indexWhere(_ >= approx).toDouble / values.length
      val tol = if (q < 0.05 || q > 0.95) 0.005 else 0.02
      assert(math.abs(rank - q) < tol, s"q=$q approx=$approx rank=$rank")
    }
    assert(td.quantile(0.0) == sorted.head)
    assert(td.quantile(1.0) == sorted.last)
  }

  test("t-digest merge: split-merge quantiles match single-feed") {
    val rnd = new scala.util.Random(23)
    val values = Array.fill(30000)(math.exp(rnd.nextGaussian()))
    val whole = new TDigest(100)
    values.foreach(whole.add)
    val merged = new TDigest(100)
    values.grouped(10000).foreach { chunk =>
      val t = new TDigest(100); chunk.foreach(t.add)
      merged.mergeSketch(t)
    }
    assert(merged.n == whole.n)
    assert(math.abs(merged.sum - whole.sum) < 1e-6 * math.abs(whole.sum))
    val sorted = values.sorted
    for (q <- Seq(0.05, 0.5, 0.95)) {
      val ra = sorted.indexWhere(_ >= merged.quantile(q)).toDouble /
        values.length
      assert(math.abs(ra - q) < 0.02, s"q=$q rank=$ra")
    }
  }

  test("OptimalBinningSketch with t-digest solves like GK") {
    val spark = TestSpark.spark
    val df = spark.read
      .parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .withColumn("y", org.apache.spark.sql.functions
        .when(org.apache.spark.sql.functions.col("l_returnflag") === "R",
              1.0).otherwise(0.0))
    val cfg = BinningConfig(name = "x", monotonicTrend = None)
    val gk = new OptimalBinningSketch(cfg, eps = 1e-3, sketchType = "gk")
    val td = new OptimalBinningSketch(cfg, eps = 1e-3,
                                      sketchType = "t-digest")
    gk.add(df, "l_extendedprice", "y")
    td.add(df, "l_extendedprice", "y")
    val fg = gk.solve()
    val ft = td.solve()
    assert(fg.status == "OPTIMAL" && ft.status == "OPTIMAL")
    assert(ft.table.rows.map(_.count).sum ==
             fg.table.rows.map(_.count).sum)
    // both quantile ladders land splits in the same region
    assert(math.abs(ft.splits.head - fg.splits.head) <
             0.2 * math.abs(fg.splits.head),
           s"${ft.splits.mkString(",")} vs ${fg.splits.mkString(",")}")
  }

  test("categorical sketch: stream solve equals batch fit exactly") {
    val df = li
    val cfg = BinningConfig(name = "l_linestatus", dtype = "categorical")
    val batch = OptimalBinning.fit(df, "l_linestatus", "y", cfg)

    // single add
    val sk = new OptimalBinningCatSketch(cfg)
    sk.add(df, "l_linestatus", "y")
    val once = sk.solve()
    assert(once.catBins.map(_.toSeq).toSeq == batch.catBins.map(_.toSeq).toSeq)
    assert(math.abs(once.table.iv - batch.table.iv) < 1e-12)

    // incremental adds + merge: same exact result (order-insensitive)
    val skA = new OptimalBinningCatSketch(cfg)
    val skB = new OptimalBinningCatSketch(cfg)
    skA.add(df.where(col("l_orderkey") % 2 === 0), "l_linestatus", "y")
    skB.add(df.where(col("l_orderkey") % 2 === 1), "l_linestatus", "y")
    skA.merge(skB)
    val merged = skA.solve()
    assert(merged.catBins.map(_.toSeq).toSeq == batch.catBins.map(_.toSeq).toSeq)
    assert(math.abs(merged.table.iv - batch.table.iv) < 1e-12)

    // one-scan grouped add: identical counter state to the sequential
    // split-adds above (counter addition is commutative)
    val skG = new OptimalBinningCatSketch(cfg)
    skG.addGrouped(df, col("l_orderkey") % 2, "l_linestatus", "y")
    assert(skG.sketch.counts == skA.sketch.counts)
    assert(skG.sketch.missingNe == skA.sketch.missingNe &&
           skG.sketch.missingE == skA.sketch.missingE)
    val grouped = skG.solve()
    assert(grouped.catBins.map(_.toSeq).toSeq ==
           batch.catBins.map(_.toSeq).toSeq)
  }

  test("numeric sketch addGrouped: exact counters match sequential adds") {
    val df = li
    val skSeq = new OptimalBinningSketch(BinningConfig(), eps = 1e-3)
    skSeq.add(df.where(col("l_orderkey") % 2 === 0), "l_extendedprice", "y")
    skSeq.add(df.where(col("l_orderkey") % 2 === 1), "l_extendedprice", "y")
    val skG = new OptimalBinningSketch(BinningConfig(), eps = 1e-3)
    skG.addGrouped(df, col("l_orderkey") % 2, "l_extendedprice", "y")
    // totals are exact either way; GK entry sets may legitimately differ
    assert(skG.sketch.n == skSeq.sketch.n)
    assert(skG.sketch.nEvent == skSeq.sketch.nEvent)
    assert(skG.sketch.countMissingE == skSeq.sketch.countMissingE)
    // and both solves stay near the exact batch fit's quantile grid
    val a = skG.solve().splits
    val b = skSeq.solve().splits
    assert(a.nonEmpty && b.nonEmpty)
  }

  test("BinningProcessSketch routes categorical variables to CatSketch") {
    val df = li
    val bps = new BinningProcessSketch(
      Seq("l_extendedprice"), BinningConfig(),
      catVariables = Seq("l_linestatus"))
    bps.add(df, "y")
    val fits = bps.solveAll()
    assert(fits.contains("l_extendedprice"))
    assert(fits.contains("l_linestatus"))
    val cat = fits("l_linestatus")
    // categorical result equals the exact batch categorical fit
    val batch = OptimalBinning.fit(df, "l_linestatus", "y",
      BinningConfig(name = "l_linestatus", dtype = "categorical"))
    assert(cat.catBins.map(_.toSeq).toSeq == batch.catBins.map(_.toSeq).toSeq)
    assert(math.abs(cat.table.iv - batch.table.iv) < 1e-12)
  }

  test("selection criteria: per-metric min/top rules and fixed variables") {
    val df = li
    val vars = Seq("l_extendedprice", "l_quantity", "l_discount", "l_tax")
    // top-2 by IV among those passing a (permissive) min bound
    val proc = BinningProcess.fit(df, vars, "y",
      selection = BinningProcess.Selection(criteria = Map(
        "iv" -> BinningProcess.MetricCriteria(
          min = Some(0.0), strategy = Some("highest"), top = Some(2)))))
    val sel = proc.selectedVariables.toSet
    assert(sel.size == 2, sel)
    val ivs = vars.map(v => v -> proc.fits(v).table.iv).toMap
    val top2 = vars.sortBy(v => -ivs(v)).take(2).toSet
    assert(sel == top2, s"$sel vs $top2 ivs=$ivs")

    // fractional top: 0.5 of eligible = ceil(4 * 0.5) = 2
    val procF = BinningProcess.fit(df, vars, "y",
      selection = BinningProcess.Selection(criteria = Map(
        "iv" -> BinningProcess.MetricCriteria(
          strategy = Some("highest"), top = Some(0.5)))))
    assert(procF.selectedVariables.length == 2)

    // fixed variable survives an impossible bound
    val procFix = BinningProcess.fit(df, vars, "y",
      selection = BinningProcess.Selection(
        criteria = Map("iv" -> BinningProcess.MetricCriteria(
          min = Some(1e9))),
        fixedVariables = Seq("l_tax")))
    assert(procFix.selectedVariables.toSeq == Seq("l_tax"))
  }

  test("sessionize: gap rule produces the expected islands") {
    val spark = TestSpark.spark
    import spark.implicits._
    // user 1: events at 1,2,3, 100,101, 500 with gap 10 -> 3 sessions
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 1.0), (1L, 3L, 1.0),
                 (1L, 100L, 2.0), (1L, 101L, 2.0),
                 (1L, 500L, 5.0),
                 (2L, 7L, 1.0))
      .toDF("user_id", "event_id", "value")
    val s = graft.streaming.Sessionize
      .sessionStats(df, "user_id", "event_id", "value", gap = 10.0)
      .orderBy("user_id", "session_id").collect()
    val u1 = s.filter(_.getLong(0) == 1L)
    assert(u1.length == 3, s.mkString(";"))
    assert(u1.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L)) // n_events
    assert(u1.map(_.getDouble(4)).toSeq == Seq(3.0, 4.0, 5.0)) // sums
    assert(s.count(_.getLong(0) == 2L) == 1)
  }
}
