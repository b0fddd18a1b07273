package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScorecardAnalytics

/** Specs for the deployment-side scorecard analytics: gains/lift
  * table, cost-threshold sweep, characteristic (score-shift)
  * analysis, and the band migration matrix. All cases are small
  * enough to check against hand arithmetic exactly. */
class DeploymentAnalyticsSpec extends AnyFunSuite {

  // three bands with event rates 0.8 (bin 2), 0.5 (bin 0), 0.2 (bin 1):
  // rank order must be 2, 0, 1
  private def bandedDf() = {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows =
      Seq.fill(8)((2L, 1.0)) ++ Seq.fill(2)((2L, 0.0)) ++   // 10 rows, 8 ev
      Seq.fill(5)((0L, 1.0)) ++ Seq.fill(5)((0L, 0.0)) ++   // 10 rows, 5 ev
      Seq.fill(2)((1L, 1.0)) ++ Seq.fill(8)((1L, 0.0))      // 10 rows, 2 ev
    rows.toDF("bin", "y")
  }

  test("gainsTable: rate-desc ranking, cumulative capture/depth ppm " +
       "and lift are exact") {
    val got = ScorecardAnalytics.gainsTable(bandedDf(), col("bin"), "y")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(4), r.getLong(5),
                 r.getLong(6), r.getLong(7), r.getDouble(8)))
    // totals: n=30, e=15
    assert(got(0) == ((1, 2L, 10L, 8L, 533333L, 333333L,
                       (8.0 * 30 / (10 * 15) * 1e6).round / 1e6)))
    assert(got(1) == ((2, 0L, 20L, 13L, 866666L, 666666L, 1.3)))
    assert(got(2) == ((3, 1L, 30L, 15L, 1000000L, 1000000L, 1.0)))
  }

  test("gainsTable: rate ties break on the smaller bin id") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (Seq.fill(2)((7L, 1.0)) ++ Seq.fill(2)((7L, 0.0)) ++
              Seq.fill(2)((3L, 1.0)) ++ Seq.fill(2)((3L, 0.0)))
      .toDF("bin", "y")
    val ranks = ScorecardAnalytics.gainsTable(df, col("bin"), "y")
      .select("rank", "bin").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(ranks.toSeq == Seq((1, 3L), (2, 7L)))
  }

  test("thresholdSweep: integer confusion matrix per depth; smallest " +
       "argmin k is flagged, exactly once") {
    val got = ScorecardAnalytics
      .thresholdSweep(bandedDf(), col("bin"), "y", fnCost = 5L,
                      fpCost = 1L)
      .collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getLong(4),
                 r.getLong(5), r.getLong(6), r.getLong(7)))
    // k=1: tp=8 fp=2 fn=7 tn=13 cost=37
    // k=2: tp=13 fp=7 fn=2 tn=8  cost=17  <- best
    // k=3: tp=15 fp=15 fn=0 tn=0 cost=15  <- actually best (cost 15)
    assert(got(0) == ((1, 8L, 2L, 7L, 13L, 37L, 0L)))
    assert(got(1) == ((2, 13L, 7L, 2L, 8L, 17L, 0L)))
    assert(got(2) == ((3, 15L, 15L, 0L, 0L, 15L, 1L)))
    assert(got.map(_._7).sum == 1L)
  }

  test("thresholdSweep: cost ties flag only the smallest k") {
    val spark = TestSpark.spark
    import spark.implicits._
    // two pure bands: k=1 (all events caught, no FP) cost 0;
    // k=2 adds 0 events and n FPs -> higher cost, single best at k=1
    val df = (Seq.fill(3)((0L, 1.0)) ++ Seq.fill(3)((1L, 0.0)))
      .toDF("bin", "y")
    val flags = ScorecardAnalytics
      .thresholdSweep(df, col("bin"), "y", 5L, 1L)
      .select("k", "is_best").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(flags.toSeq == Seq((1, 1L), (2, 0L)))
  }

  test("characteristicShift: train WoE closed form, ppm shares, and " +
       "signed shift mass per bin; bins absent in one cohort fill 0") {
    val spark = TestSpark.spark
    import spark.implicits._
    // train: bin0 n=4(e=1), bin1 n=4(e=2); test: bin0 n=2, bin1 n=6
    val train = (Seq((0L, 1.0), (0L, 0.0), (0L, 0.0), (0L, 0.0),
                     (1L, 1.0), (1L, 1.0), (1L, 0.0), (1L, 0.0)))
      .toDF("bin", "y")
    val test_ = (Seq.fill(2)((0L, 0.0)) ++ Seq.fill(6)((1L, 0.0)))
      .toDF("bin", "y")
    val got = ScorecardAnalytics
      .characteristicShift(train, test_, Seq("v" -> col("bin")), "y")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
                 r.getLong(5), r.getDouble(6), r.getDouble(7)))
    // totals: tot_train=8, tot_e=3, tot_ne=5, tot_test=8
    // bin0: woe = ln((3/5)/(1/3)) = ln(1.8); shift=(0.25-0.5)*woe6
    val woe0 = BigDecimal(math.log(1.8))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val woe1 = BigDecimal(math.log((2.0 / 5) / (2.0 / 3)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sh0 = BigDecimal(-0.25 * woe0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sh1 = BigDecimal(0.25 * woe1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == ((0L, 4L, 2L, 500000L, 250000L, woe0, sh0)))
    assert(got(1) == ((1L, 4L, 6L, 500000L, 750000L, woe1, sh1)))
  }

  test("characteristicShift: a pure bin (e=0) takes woe 0 and " +
       "contributes no shift mass") {
    val spark = TestSpark.spark
    import spark.implicits._
    val train = Seq((0L, 0.0), (0L, 0.0), (1L, 1.0), (1L, 0.0))
      .toDF("bin", "y")
    val test_ = Seq((0L, 0.0), (1L, 0.0)).toDF("bin", "y")
    val got = ScorecardAnalytics
      .characteristicShift(train, test_, Seq("v" -> col("bin")), "y")
      .where(col("bin") === 0L).collect()
    assert(got.length == 1)
    assert(got(0).getDouble(6) == 0.0 && got(0).getDouble(7) == 0.0)
  }

  test("bandMigration: only both-snapshot keys count; row shares are " +
       "truncated ppm within the origin band") {
    val spark = TestSpark.spark
    import spark.implicits._
    val before = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (9L, 2L))
      .toDF("k", "band")
    val after = Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 1L), (8L, 0L))
      .toDF("k", "band")
    val got = ScorecardAnalytics
      .bandMigration(before, after, "k", "band")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // band 0 -> {0:1, 1:2} of 3; band 1 -> {1:1}; key 9/8 drop
    assert(got.toSeq == Seq((0L, 0L, 1L, 333333L),
                            (0L, 1L, 2L, 666666L),
                            (1L, 1L, 1L, 1000000L)))
  }
}
