package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Categorical fixture from `tests/test_binning.py:290-340`
  * (occupation vs default flag, cat_cutoff=0.1). */
class CategoricalBinningSpec extends AnyFunSuite {

  private val x = Array(
    "Working", "State servant", "Working", "Working", "Working",
    "State servant", "Commercial associate", "State servant",
    "Pensioner", "Working", "Working", "Pensioner", "Working",
    "Working", "Working", "Working", "Working", "Working", "Working",
    "State servant", "Working", "Commercial associate", "Working",
    "Pensioner", "Working", "Working", "Working", "Working",
    "State servant", "Working", "Commercial associate", "Working",
    "Working", "Commercial associate", "State servant", "Working",
    "Commercial associate", "Working", "Pensioner", "Working",
    "Commercial associate", "Working", "Working", "Pensioner",
    "Working", "Working", "Pensioner", "Working", "State servant",
    "Working", "State servant", "Commercial associate", "Working",
    "Commercial associate", "Pensioner", "Working", "Pensioner",
    "Working", "Working", "Working", "Commercial associate", "Working",
    "Pensioner", "Working", "Commercial associate",
    "Commercial associate", "State servant", "Working",
    "Commercial associate", "Commercial associate",
    "Commercial associate", "Working", "Working", "Working",
    "Commercial associate", "Working", "Commercial associate",
    "Working", "Working", "Pensioner", "Working", "Pensioner",
    "Working", "Working", "Pensioner", "Working", "State servant",
    "Working", "Working", "Working", "Working", "Working",
    "Commercial associate", "Commercial associate",
    "Commercial associate", "Working", "Commercial associate",
    "Working", "Working", "Pensioner")

  private val y = Array(
    1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0)

  test("categorical with cat_cutoff: OPTIMAL, others bin, totals conserved") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = x.zip(y.map(_.toDouble)).toSeq.toDF("occupation", "target")
    val fitted = OptimalBinning.fit(df, "occupation", "target",
      BinningConfig(name = "occupation", dtype = "categorical",
                    catCutoff = Some(0.1)))
    assert(fitted.status == "OPTIMAL")
    // every category is at/above the 10% cutoff in this fixture (State
    // servant is exactly 10% and `freq >= cutoff` keeps it, mirroring
    // `preprocessing.py:32-42`), so no others bin
    assert(fitted.catOthers != null && fitted.catOthers.isEmpty)
    assert(fitted.table.tRecords.toLong == 100L)
    // a tighter cutoff does produce an others group
    val withOthers = OptimalBinning.fit(df, "occupation", "target",
      BinningConfig(name = "occupation", dtype = "categorical",
                    catCutoff = Some(0.15)))
    assert(withOthers.catOthers.toSet == Set("State servant", "Pensioner"))
    // transform totality incl. an unseen category -> mean-event-rate woe 0
    val out = df
      .union(Seq(("Unemployed", 0.0)).toDF("occupation", "target"))
      .select(fitted.transform(
        org.apache.spark.sql.functions.col("occupation")).as("w"))
      .as[Double].collect()
    assert(out.length == 101 && out.forall(v => !v.isNaN))
  }

  test("sample weights: weight-2 rows equal duplicated rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = spark.read.parquet(TestSpark.breastCancer)
      .select("mean radius", "target")
    val weighted = df.withColumn("w",
      org.apache.spark.sql.functions.lit(2.0))
    val duplicated = df.union(df)
    // fixed user splits isolate the counting path (CART's
    // min_samples_leaf counts raw samples even under weights, mirroring
    // sklearn/reference, so prebinning itself differs by design)
    val us = Array(11.425, 12.33, 13.095, 13.705, 15.045, 16.925)
    val a = OptimalBinning.fit(weighted, "mean radius", "target",
      BinningConfig(name = "x", userSplits = Some(us),
                    monotonicTrend = None), weightCol = Some("w"))
    val b = OptimalBinning.fit(duplicated, "mean radius", "target",
      BinningConfig(name = "x", userSplits = Some(us),
                    monotonicTrend = None))
    assert(a.splits.toSeq == b.splits.toSeq)
    assert(math.abs(a.table.iv - b.table.iv) < 1e-9)
    assert(a.table.nEvent.toSeq == b.table.nEvent.toSeq)
  }

  test("class weights scale event counts") {
    val spark = TestSpark.spark
    val df = spark.read.parquet(TestSpark.breastCancer)
    val cw = OptimalBinning.fit(df, "mean radius", "target",
      BinningConfig(name = "x",
                    classWeight = Some(Map(1.0 -> 2.0))))
    val base = OptimalBinning.fit(df, "mean radius", "target",
      BinningConfig(name = "x"))
    assert(math.abs(cw.table.tEvent - 2 * base.table.tEvent) < 1e-9)
    assert(math.abs(cw.table.tNonevent - base.table.tNonevent) < 1e-9)
  }

  test("categorical user-split groups become atomic prebins") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = x.zip(y.map(_.toDouble)).toSeq.toDF("occupation", "target")
    val groups = Array(Array("Pensioner", "Working"),
                       Array("Commercial associate"),
                       Array("State servant"))
    val fitted = OptimalBinning.fit(df, "occupation", "target",
      BinningConfig(name = "occupation", dtype = "categorical",
                    userSplitsCategorical = Some(groups),
                    monotonicTrend = None))
    assert(fitted.status == "OPTIMAL")
    // every emitted bin is a union of whole groups
    fitted.catBins.foreach { bin =>
      groups.foreach { g =>
        val inter = bin.toSet.intersect(g.toSet)
        assert(inter.isEmpty || inter == g.toSet,
               s"group split across bins: ${bin.mkString(",")}")
      }
    }
    assert(fitted.table.tRecords.toLong == 100L)
    val out = df.select(fitted.transform(
      org.apache.spark.sql.functions.col("occupation")).as("w"))
      .as[Double].collect()
    assert(out.forall(v => !v.isNaN))
  }

  test("high-cardinality categorical: top-K + catch-all others bin") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = spark.read
      .parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .withColumn("y", org.apache.spark.sql.functions
        .when(org.apache.spark.sql.functions.col("l_returnflag") === "R",
              1.0).otherwise(0.0))
      .withColumn("catx", org.apache.spark.sql.functions
        .col("l_shipdate").cast("string"))
    val fitted = OptimalBinning.fit(df, "catx", "y",
      BinningConfig(name = "catx", dtype = "categorical",
                    histogramMaxBuckets = 100))
    assert(fitted.status == "OPTIMAL")
    assert(fitted.othersCatchAll)
    // totals conserved: every row lands in a bin incl. the tail
    assert(fitted.table.tRecords.toLong == df.count())
    val out = df.select(fitted.transform(
      org.apache.spark.sql.functions.col("catx")).as("w"))
      .as[Double].collect()
    assert(out.forall(v => !v.isNaN))
  }

  test("cat_unknown: reference defaults and explicit overrides per " +
       "metric (`transformations.py:153-158,291-297`)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = x.zip(y.map(_.toDouble)).toSeq.toDF("occupation", "target")
    val probe = Seq(("NeverSeen", 0.0)).toDF("occupation", "target")
    def fit(cfg: BinningConfig) =
      OptimalBinning.fit(df, "occupation", "target", cfg)
    val base = BinningConfig(name = "occupation", dtype = "categorical")

    // default: unknown -> WoE of the mean event rate (== 0 by the WoE
    // identity log((1/er - 1) * tE/tNe) at er = tE/(tE+tNe))
    val f = fit(base)
    val dWoe = probe.select(f.transform(col("occupation")).as("v"))
      .as[Double].head()
    assert(math.abs(dWoe) < 1e-12, s"default unknown woe $dWoe")
    val dEr = probe.select(
      f.transform(col("occupation"), "event_rate").as("v"))
      .as[Double].head()
    assert(math.abs(dEr - f.table.tEvent / f.table.tRecords) < 1e-12)
    val dIdx = probe.select(
      f.transform(col("occupation"), "indices").as("v")).as[Int].head()
    assert(dIdx == -1)
    val dBin = probe.select(
      f.transform(col("occupation"), "bins").as("v")).as[String].head()
    assert(dBin == "unknown")

    // explicit overrides route through typed literals
    val fo = fit(base.copy(catUnknown = Some(-99.5)))
    assert(probe.select(fo.transform(col("occupation")).as("v"))
      .as[Double].head() == -99.5)
    val fi = fit(base.copy(catUnknown = Some(7)))
    assert(probe.select(fi.transform(col("occupation"), "indices").as("v"))
      .as[Int].head() == 7)
    val fb = fit(base.copy(catUnknown = Some("none-of-the-above")))
    assert(probe.select(fb.transform(col("occupation"), "bins").as("v"))
      .as[String].head() == "none-of-the-above")
  }
}
