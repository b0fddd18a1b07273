package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Golden parity against the reference's OWN monitoring report
  * (`tests/results/test_scorecard_monitoring_default.txt`, produced by
  * `tests/test_scorecard_monitoring.py` on the breast-cancer data with
  * sklearn's `train_test_split(test_size=0.3, random_state=42)` and a
  * default `LogisticRegression()`).
  *
  * The split indices are a committed fixture
  * (`breast_cancer_split42.csv`) generated from numpy's documented
  * RandomState(42) permutation — the exact rows sklearn hands the
  * reference — so every number in the golden becomes checkable:
  * target analysis exactly, classification tallies exactly (the
  * golden's TPR/TNR/FPR/FNR/balanced-accuracy/discriminant-power rows
  * are all derived from four integers), PSI/Gini to reporting
  * precision. The estimator maps sklearn's default C=1.0 L2 penalty
  * via `regParam = 1/(C * W)` (`Scorecard.scala` driverGlmFit note).
  */
class GoldenMonitoringSpec extends AnyFunSuite {

  test("system stability golden: sklearn split42 + default scorecard " +
       "reproduce test_scorecard_monitoring_default.txt") {
    val spark = TestSpark.spark
    val raw = spark.read.parquet(
        "/root/reference/tests/data/breast_cancer.parquet")
      .coalesce(1) // single partition -> mono id == file row order
      .withColumn("__row", monotonically_increasing_id())
    val split = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(getClass.getResource("/breast_cancer_split42.csv").getPath)
      .withColumnRenamed("row", "__row")
    val joined = raw.join(split, Seq("__row")).cache()
    val train = joined.where(col("cohort") === "train")
      .drop("__row", "cohort")
    val test = joined.where(col("cohort") === "test")
      .drop("__row", "cohort")

    // golden "Target analysis": expected 398/249/149, actual 171/108/63
    def tgt(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
                     sum(col("target").cast("long"))).head
      (r.getLong(0), r.getLong(1))
    }
    assert(tgt(train) == ((398L, 249L)), tgt(train).toString)
    assert(tgt(test) == ((171L, 108L)), tgt(test).toString)

    val vars = raw.columns
      .filterNot(c => c == "target" || c == "__row").toSeq
    // sklearn LogisticRegression(): L2, C=1.0 -> regParam = 1/(1*398)
    val sc = Scorecard.fit(train, vars, "target",
                           regParam = 1.0 / 398.0)

    // golden "Performance metrics": TPR/TNR rows are exact integer
    // tallies of default-threshold predictions (sklearn predict is
    // p >= 0.5). Actual: TP 107/108, TN 61/63; expected: TP 249/249,
    // TN 146/149 — DP 4.460557 and balanced accuracy follow from the
    // same four integers.
    def tallies(df: DataFrame): (Long, Long) = {
      val p = sc.predictProbaColumn()
      val r = df.agg(
        sum(when(col("target") === 1 && p >= 0.5, 1L).otherwise(0L)),
        sum(when(col("target") === 0 && p < 0.5, 1L).otherwise(0L)))
        .head
      (r.getLong(0), r.getLong(1))
    }
    assert(tallies(train) == ((249L, 146L)),
           s"train (TP, TN) = ${tallies(train)}; golden (249, 146)")
    assert(tallies(test) == ((107L, 61L)),
           s"test (TP, TN) = ${tallies(test)}; golden (107, 61)")

    // golden PSI section: total prints 0.0018 with verdict "No
    // significant change"; 3 score bins, all in [0.00, 0.10)
    val mon = new ScorecardMonitoring(sc, psiNBins = 20,
                                      psiMethod = "cart",
                                      psiYCol = Some("target"))
    val st = mon.stabilityStats(train, test, "target")
    assert(st.psiBins.length == 3,
           s"golden has 3 PSI score bins; got ${st.psiBins.length}")
    assert(st.psiBins.forall(_._4 < 0.10))
    assert(st.psiTotal > 0.0 && st.psiTotal < 0.0025,
           f"psiTotal=${st.psiTotal}%.6f; golden prints 0.0018")

    // golden significance histogram over the 3 bins: (1, 0, 1, 1)
    val pvals = st.tests.map(_._5)
    assert(pvals.length == 3)
    def bucket(lo: Double, hi: Double) =
      pvals.count(p => p >= lo && p < hi)
    assert((bucket(0, 0.05), bucket(0.05, 0.10), bucket(0.10, 0.50),
            bucket(0.50, 1.0)) == ((1, 0, 1, 1)),
           pvals.mkString(","))

    // golden Gini row: expected 0.999838, actual 0.986185
    val ge = st.performance("gini_expected")
    val ga = st.performance("gini_actual")
    assert(math.abs(ge - 0.999838) < 2e-3, f"gini_expected=$ge%.6f")
    assert(math.abs(ga - 0.986185) < 2e-3, f"gini_actual=$ga%.6f")
    joined.unpersist()
  }

  test("continuous system stability golden: boston split42 + default " +
       "continuous scorecard reproduce " +
       "test_scorecard_monitoring_default_continuous.txt") {
    val spark = TestSpark.spark
    val raw = spark.read.parquet(
        getClass.getResource("/boston_housing.parquet").getPath)
      .coalesce(1)
      .withColumn("__row", monotonically_increasing_id())
    val split = spark.read
      .option("header", "true").option("inferSchema", "true")
      .csv(getClass.getResource("/boston_split42.csv").getPath)
      .withColumnRenamed("row", "__row")
    val joined = raw.join(split, Seq("__row")).cache()
    val train = joined.where(col("cohort") === "train")
      .drop("__row", "cohort")
    val test = joined.where(col("cohort") === "test")
      .drop("__row", "cohort")
    val vars = raw.columns
      .filterNot(c => c == "target" || c == "__row").toSeq

    // reference: BinningProcess defaults + sklearn LinearRegression
    // (exact OLS — our driver normal-equations solve is the same
    // optimum, no tolerance games needed)
    val sc = Scorecard.fitContinuousTarget(train, vars, "target")
    val mon = new ContinuousScorecardMonitoring(sc, psiNBins = 20)
    val st = mon.stabilityStats(train, test, "target")

    // golden "Target analysis" (Actual = test cohort):
    //   Mean 21.407895/23.015819, Std 8.632097/9.375315,
    //   p25 16.325/17.4, Median 20/21.75, p75 24.125/26.6
    val t = st.targetAnalysis.map(r => r._1 -> ((r._2, r._3))).toMap
    def close(a: Double, b: Double) = math.abs(a - b) < 5e-6
    assert(close(t("mean")._1, 23.015819) &&
           close(t("mean")._2, 21.407895), t("mean").toString)
    assert(close(t("std")._1, 9.375315) &&
           close(t("std")._2, 8.632097), t("std").toString)
    assert(close(t("p25")._1, 17.4) && close(t("p25")._2, 16.325) &&
           close(t("median")._1, 21.75) && close(t("median")._2, 20.0) &&
           close(t("p75")._1, 26.6) && close(t("p75")._2, 24.125),
           st.targetAnalysis.toString)

    // golden PSI section: total 0.1630 ("Requires investigation"),
    // 15 score bins: 14 in [0, 0.10), 1 in [0.10, 0.25)
    assert(st.psiBins.length == 15,
           s"golden has 15 PSI bins; got ${st.psiBins.length}")
    val psiHist = (st.psiBins.count(_._4 < 0.10),
                   st.psiBins.count(b => b._4 >= 0.10 && b._4 < 0.25),
                   st.psiBins.count(_._4 >= 0.25))
    assert(psiHist == ((14, 1, 0)), psiHist.toString)
    assert(math.abs(st.psiTotal - 0.1630) < 5e-4,
           f"psiTotal=${st.psiTotal}%.6f; golden prints 0.1630")

    // golden significance histogram: (1, 0, 5, 9) over 15 bins
    val pvals = st.tests.map(_._5)
    def bucket(lo: Double, hi: Double) =
      pvals.count(p => p >= lo && p < hi)
    assert((bucket(0, 0.05), bucket(0.05, 0.10), bucket(0.10, 0.50),
            bucket(0.50, 1.0)) == ((1, 0, 5, 9)),
           pvals.sorted.mkString(","))

    // golden "Performance metrics" — all ten, both cohorts, to the
    // golden's own print precision (OLS is exact; binning parity does
    // the rest)
    val goldenPerf = Seq(
      ("Mean absolute error", 2.546775, 2.482286),
      ("Mean squared error", 12.187764, 12.583966),
      ("Median absolute error", 1.947342, 2.059913),
      ("Explained variance", 0.861340, 0.831908),
      ("R^2", 0.861340, 0.831117),
      ("Mean percentage error", -0.024922, -0.032197),
      ("Mean absolute percentage error", 0.125992, 0.125897),
      ("Symmetric mean absolute percentage error", 0.060410, 0.061339),
      ("Median absolute percentage error", 0.091783, 0.097021),
      ("Symmetric median absolute percentage error", 0.046868,
       0.049889))
    goldenPerf.foreach { case (k, e, a) =>
      assert(math.abs(st.performanceExpected(k) - e) < 5e-6,
             f"$k expected: ${st.performanceExpected(k)}%.6f vs $e")
      assert(math.abs(st.performanceActual(k) - a) < 5e-6,
             f"$k actual: ${st.performanceActual(k)}%.6f vs $a")
    }
    joined.unpersist()
  }
}
