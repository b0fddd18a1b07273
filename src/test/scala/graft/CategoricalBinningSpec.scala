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
}
