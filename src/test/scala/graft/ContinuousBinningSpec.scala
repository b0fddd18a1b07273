package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Golden tests from `tests/test_continuous_binning.py` (boston LSTAT). */
class ContinuousBinningSpec extends AnyFunSuite {

  private val boston = "src/test/resources/boston_housing.parquet"

  test("boston LSTAT: default fit matches reference splits") {
    val spark = TestSpark.spark
    val df = spark.read.parquet(boston)
    val fitted = ContinuousOptimalBinning.fit(df, "LSTAT", "target",
                                              BinningConfig(name = "LSTAT"))
    val expected = Array(4.6500001, 5.49499989, 6.86500001, 9.7249999,
                         13.0999999, 14.4000001, 17.23999977, 19.89999962,
                         23.31500053)
    assert(fitted.status == "OPTIMAL")
    assert(fitted.splits.length == expected.length,
           s"splits ${fitted.splits.mkString(",")}")
    fitted.splits.zip(expected).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"split $a vs $b")
    }
    // table sanity: totals
    assert(math.abs(fitted.table.tRecords - 506.0) < 1e-9)
    assert(math.abs(fitted.table.tMean - 22.532806324110677) < 1e-6)
  }

  test("min_mean_diff produces means separated by at least the diff") {
    val spark = TestSpark.spark
    val df = spark.read.parquet(boston)
    val fitted = ContinuousOptimalBinning.fit(
      df, "LSTAT", "target",
      BinningConfig(name = "LSTAT", monotonicTrend = None,
                    minEventRateDiff = 2.0))
    assert(fitted.status == "OPTIMAL")
    val means = fitted.table.means.take(fitted.nDataBins)
    means.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(math.abs(w(0) - w(1)) >= 2.0 - 1e-9,
               s"adjacent means ${w.mkString(",")}")
    }
  }

  test("transform mean metric is total") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = spark.read.parquet(boston)
    val fitted = ContinuousOptimalBinning.fit(df, "LSTAT", "target",
                                              BinningConfig(name = "LSTAT"))
    val out = df.select(
      fitted.transform(org.apache.spark.sql.functions.col("LSTAT"))
        .as("m")).as[Double].collect()
    assert(out.length == 506 && out.forall(!_.isNaN))
    // golden transform values (`test_continuous_binning.py:267-272`)
    val expected = Array(30.47142857, 25.56067416, 39.718, 39.718,
                         30.47142857)
    out.take(5).zip(expected).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b")
    }
  }

  test("ContinuousOptimalBinning2D: rectangle means partition the grid") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    // z has a clear 2x2 block structure over (x, y)
    val rows = (1 to 4000).map { _ =>
      val x = rnd.nextDouble() * 10
      val y = rnd.nextDouble() * 10
      val block = (if (x < 5) 0 else 1) * 2 + (if (y < 5) 0 else 1)
      (x, y, block * 10.0 + rnd.nextGaussian())
    }
    val df = rows.toDF("x", "y", "z")
    val f = OptimalBinning2D.fitContinuous(df, "x", "y", "z",
      OptimalBinning2D.Config2D(maxNPrebinsX = 4, maxNPrebinsY = 4))
    assert(f.status == "OPTIMAL")
    // rectangles tile the grid: counts sum to n
    assert(math.abs(f.rects.map(_.n).sum - 4000.0) < 1e-9)
    // weighted rect means reproduce the global mean
    val wMean = f.rects.map(r => r.n * r.mean).sum / 4000.0
    assert(math.abs(wMean - f.tMean) < 1e-9)
    // transform assigns every row a mean and they average to the target
    val preds = df.select(f.transform(col("x"), col("y")).as("m"))
      .agg(avg("m"), count(when(isnan(col("m")), 1))).head
    assert(preds.getLong(1) == 0)
    assert(math.abs(preds.getDouble(0) - f.tMean) < 0.5)
  }

  test("continuous PW binning recovers a linear relationship") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 5000).map { _ =>
      val x = rnd.nextDouble() * 100
      (x, 2.0 * x + 5.0 + rnd.nextGaussian() * 0.5)
    }
    val df = rows.toDF("x", "y")
    val f = PWBinning.fitContinuous(df, "x", "y")
    // prediction at a grid of points tracks 2x + 5
    val err = df.select(
      avg(abs(f.predictColumn(col("x")) - col("y"))).as("mae")).head
      .getDouble(0)
    assert(err < 1.0, s"mae $err")
    // bounds clamp when provided
    val fb = PWBinning.fitContinuous(df, "x", "y", lb = Some(50.0),
                                     ub = Some(100.0))
    val mn = df.select(min(fb.predictColumn(col("x"))),
                       max(fb.predictColumn(col("x")))).head
    assert(mn.getDouble(0) >= 50.0 - 1e-9 && mn.getDouble(1) <= 100.0 + 1e-9)
  }

  test("continuous analysis: Welch tests, quality score, trend type") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    // strictly rising mean: y = x + small noise
    val df = (1 to 4000)
      .map(i => (i.toDouble, i.toDouble + rnd.nextGaussian() * 5))
      .toDF("x", "y")
    val f = ContinuousOptimalBinning.fit(df, "x", "y",
      BinningConfig(name = "x"))
    val a = f.table.analysis()
    assert(a.adjacentTests.length == f.nDataBins - 1)
    a.adjacentTests.foreach { case (_, _, t, p) =>
      assert(!t.isNaN)
      assert(p >= 0 && p <= 1, s"p=$p")
    }
    assert(a.qualityScore >= 0 && a.qualityScore <= 1)
    assert(a.monotonicTrendType == "ascending", a.monotonicTrendType)
  }

  test("categorical continuous fit: mean-ordered bins, totals, cutoff " +
       "Others, and the bounded-collect tail pool") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // deterministic category -> mean structure: mean(catK) = 2k
    val docs = (0 until 8).flatMap { k =>
      (1 to 40 + k).map(i => (s"cat$k", 2.0 * k + (i % 3) - 1))
    }.toDF("x", "y")
    val f = ContinuousOptimalBinning.fit(docs, "x", "y",
      BinningConfig(name = "x", dtype = "categorical"))
    assert(f.status == "OPTIMAL")
    // every row is accounted for
    assert(f.table.tRecords == (0 until 8).map(40 + _).sum)
    // bin means are ordered (categories ordinalized by target mean)
    val dataMeans = f.table.means.take(f.nDataBins)
    assert(dataMeans.sameElements(dataMeans.sorted), dataMeans.mkString(","))

    // catCutoff pools rare categories into Others
    val withRare = docs.union(Seq(("rare1", 99.0), ("rare2", -7.0))
      .toDF("x", "y"))
    val fc = ContinuousOptimalBinning.fit(withRare, "x", "y",
      BinningConfig(name = "x", dtype = "categorical",
                    catCutoff = Some(0.01)))
    assert(fc.catOthers.toSet == Set("rare1", "rare2"), 
           fc.catOthers.mkString(","))
    assert(fc.table.tRecords == f.table.tRecords + 2)

    // oversized-cardinality path: cap the histogram budget so the tail
    // pools into Others via the exact anti-join aggregate; totals and
    // per-row accounting must survive the pooling
    val fb = ContinuousOptimalBinning.fit(withRare, "x", "y",
      BinningConfig(name = "x", dtype = "categorical",
                    histogramMaxBuckets = 5))
    assert(fb.status == "OPTIMAL")
    assert(fb.table.tRecords == fc.table.tRecords)
    assert(fb.catOthers.nonEmpty) // the tail became Others
    // analysis() excludes the Others/Special/Missing tail rows
    val a = f.table.analysis()
    assert(a.adjacentTests.length == math.max(f.nDataBins - 1, 0))
  }

  test("batch fitContinuous grid-compresses high-cardinality variables " +
       "like the single-var path (bounded driver collect)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 30k distinct continuous x values >> histogramMaxBuckets=1000
    val df = (1 to 30000).map { i =>
      val x = i + rnd.nextDouble() * 0.5
      (x, 3.0 * x + rnd.nextGaussian() * 10)
    }.toDF("x", "y")
    val cfg = BinningConfig(name = "x", histogramMaxBuckets = 1000)
    val single = ContinuousOptimalBinning.fit(df, "x", "y", cfg)
    val batch = BinningProcess.fitContinuous(df, Seq("x"), "y", cfg)("x")
    assert(single.status == "OPTIMAL" && batch.status == "OPTIMAL")
    // identical grid => identical histogram => identical solve
    assert(batch.splits.toSeq == single.splits.toSeq,
           s"batch ${batch.splits.mkString(",")} vs " +
             s"single ${single.splits.mkString(",")}")
    assert(batch.table.tRecords == single.table.tRecords)
  }
}
