package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Golden parity for the remaining reference REPORT-TEXT and
  * sketch-tolerance surfaces (the .txt goldens under
  * `/root/reference/tests/results` and the
  * `tests/test_binning_sketch.py` eps assertions):
  *
  *  - sketch binning accuracy: the reference asserts the GK (eps=1e-4)
  *    and t-digest sketch fits on breast-cancer `mean radius` land
  *    within rel 1e-2 of IV 5.04392547 / Gini 0.87541620 /
  *    JS 0.39378376 with quality_score ~ 0, and that a two-half
  *    add+merge reproduces the same numbers
  *    (`test_binning_sketch.py:124-200`).
  *  - `information()` statistics blocks
  *    (`test_binning_process_information.txt`,
  *    `test_scorecard_monitoring_information.txt`): the value-bearing
  *    fields — record counts, variable counts, target type — on the
  *    SAME fixtures. Timing lines are run-dependent noise the
  *    reference golden itself cannot pin; they are out of scope by
  *    design.
  */
class GoldenReportSpec extends AnyFunSuite {

  private def bc = TestSpark.spark.read
    .parquet("/root/reference/tests/data/breast_cancer.parquet")

  private def relClose(got: Double, want: Double, rel: Double = 1e-2) =
    math.abs(got - want) <= rel * math.abs(want)

  test("sketch eps golden: GK eps=1e-4 on breast-cancer mean radius " +
       "reproduces the reference's IV/Gini/JS within rel 1e-2; " +
       "two-half add+merge lands on the same numbers") {
    val df = bc.select(col("mean radius").as("x"),
                       col("target").cast("double").as("y"))
    def solveTable(sk: graft.streaming.OptimalBinningSketch) = {
      val f = sk.solve()
      assert(f.status == "OPTIMAL", f.status)
      f.table
    }
    val whole = new graft.streaming.OptimalBinningSketch(
      BinningConfig(name = "mean radius"), eps = 1e-4)
    whole.add(df, "x", "y")
    val t = solveTable(whole)
    assert(relClose(t.iv, 5.04392547), f"iv=${t.iv}%.8f")
    assert(relClose(t.gini, 0.87541620), f"gini=${t.gini}%.8f")
    assert(relClose(t.js, 0.39378376), f"js=${t.js}%.8f")
    // pytest approx(0.0, rel=1e-2) is an (effectively) exact-zero
    // check; the quality score collapses through the p-value term
    assert(t.analysis().qualityScore < 1e-6,
           t.analysis().qualityScore.toString)

    // merge golden (`test_numerical_default_merge`): halves by row
    // position, exactly the reference's x[:250] / x[250:]
    val idx = bc.coalesce(1)
      .withColumn("__row", monotonically_increasing_id())
      .select(col("mean radius").as("x"),
              col("target").cast("double").as("y"), col("__row"))
    val sk1 = new graft.streaming.OptimalBinningSketch(
      BinningConfig(name = "mean radius"), eps = 1e-4)
    val sk2 = new graft.streaming.OptimalBinningSketch(
      BinningConfig(name = "mean radius"), eps = 1e-4)
    sk1.add(idx.where(col("__row") < 250), "x", "y")
    sk2.add(idx.where(col("__row") >= 250), "x", "y")
    sk1.merge(sk2)
    val tm = solveTable(sk1)
    assert(relClose(tm.iv, 5.04392547), f"merged iv=${tm.iv}%.8f")
    assert(relClose(tm.gini, 0.87541620), f"merged gini=${tm.gini}%.8f")
    assert(relClose(tm.js, 0.39378376), f"merged js=${tm.js}%.8f")
  }

  test("sketch eps golden: t-digest variant reproduces the same " +
       "IV/Gini/JS bounds (test_binning_sketch.py:164-200)") {
    val df = bc.select(col("mean radius").as("x"),
                       col("target").cast("double").as("y"))
    val sk = new graft.streaming.OptimalBinningSketch(
      BinningConfig(name = "mean radius"), eps = 1e-4,
      sketchType = "t-digest")
    sk.add(df, "x", "y")
    val f = sk.solve()
    assert(f.status == "OPTIMAL", f.status)
    val t = f.table
    assert(relClose(t.iv, 5.04392547), f"iv=${t.iv}%.8f")
    assert(relClose(t.gini, 0.87541620), f"gini=${t.gini}%.8f")
    assert(relClose(t.js, 0.39378376), f"js=${t.js}%.8f")
  }

  test("binning process information golden: breast-cancer 30-variable " +
       "fit reproduces test_binning_process_information.txt statistics") {
    val df = bc.withColumn("y", col("target").cast("double"))
    val vars = bc.columns.filterNot(_ == "target").toSeq
    assert(vars.length == 30) // golden: Number of variables 30
    val proc = BinningProcess.fit(df, vars, "y")
    // golden statistics block: records 569, numerical 30,
    // categorical 0, selected 30
    assert(proc.selectedVariables.length == 30,
           proc.selectedVariables.length.toString)
    val info = proc.information()
    assert(info.contains("30 variables"), info)
    assert(info.contains("numerical        30"), info)
    assert(info.contains("categorical      0"), info)
    assert(info.contains("selected         30"), info)
    // record count: every variable's table totals the full fixture
    val n = proc.fits(vars.head).table.tRecords
    assert(n == 569.0, n.toString)
  }

  test("scorecard information golden: breast-cancer 30-variable fit " +
       "reproduces test_scorecard_information.txt statistics " +
       "(569 records / 30 variables / binary / 30-0-30)") {
    val df = bc.withColumn("y", col("target").cast("double"))
    val vars = bc.columns.filterNot(_ == "target").toSeq
    val sc = Scorecard.fit(df, vars, "y")
    val info = sc.information()
    def collapsed = info.replaceAll("\\s+", " ").trim
    assert(collapsed.contains("Number of records 569"), info)
    assert(collapsed.contains("Number of variables 30"), info)
    assert(collapsed.contains("Target type binary"), info)
    assert(collapsed.contains("Number of numerical 30"), info)
    assert(collapsed.contains("Number of categorical 0"), info)
    assert(collapsed.contains("Number of selected 30"), info)
  }

  test("scorecard monitoring information golden: boston split42 " +
       "reproduces test_scorecard_monitoring_information.txt " +
       "(A 152 / E 354 / 13 variables / continuous)") {
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
    val sc = Scorecard.fitContinuousTarget(train, vars, "target")
    val mon = new ContinuousScorecardMonitoring(sc, psiNBins = 20)
    val st = mon.stabilityStats(train, test, "target",
                                withPerformance = false)
    val info = mon.information(st)
    def collapsed = info.replaceAll("\\s+", " ").trim
    assert(collapsed.contains("Number of records Actual 152"), info)
    assert(collapsed.contains("Number of records Expected 354"), info)
    assert(collapsed.contains("Number of scorecard variables 13"), info)
    assert(collapsed.contains("Target type continuous"), info)
    joined.unpersist()
  }

  test("binary monitoring information block: breast-cancer split42 " +
       "cohort counts and variable count (the binary variant of the " +
       "same surface)") {
    val spark = TestSpark.spark
    val raw = spark.read.parquet(
        "/root/reference/tests/data/breast_cancer.parquet")
      .coalesce(1)
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
    val vars = raw.columns
      .filterNot(c => c == "target" || c == "__row").toSeq
    val sc = Scorecard.fit(train, vars, "target",
                           regParam = 1.0 / 398.0)
    val mon = new ScorecardMonitoring(sc, psiNBins = 20,
                                      psiMethod = "cart",
                                      psiYCol = Some("target"))
    val st = mon.stabilityStats(train, test, "target")
    val info = mon.information(st)
    def collapsed = info.replaceAll("\\s+", " ").trim
    assert(collapsed.contains("Number of records Actual 171"), info)
    assert(collapsed.contains("Number of records Expected 398"), info)
    assert(collapsed.contains(
      s"Number of scorecard variables ${sc.selected.length}"), info)
    assert(collapsed.contains("Target type binary"), info)
    joined.unpersist()
  }
}
