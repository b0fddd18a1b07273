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
  }
}
