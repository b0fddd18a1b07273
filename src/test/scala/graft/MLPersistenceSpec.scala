package graft

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.{OptimalBinningEstimator, OptimalBinningModel}
import graft.operators.{BinningConfig, SpecialList}
import graft.sources.ModelIO

/** spark.ml persistence round-trip for the Pipeline stage — mirrors
  * the reference's estimator save/load surface
  * (`binning_process.py:317-349`, `scorecard.py:507-538`): an
  * UNFITTED Pipeline persists its full configuration, and a fitted
  * PipelineModel reloads to an IDENTICAL transform. */
class MLPersistenceSpec extends AnyFunSuite {

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-ml-$tag").toFile
    d.delete(); d.getAbsolutePath
  }

  private def liData = {
    val spark = TestSpark.spark
    spark.read.parquet(TestSpark.sf0001 + "/lineitem.parquet")
      .withColumn("label",
                  when(col("l_returnflag") === "R", 1.0).otherwise(0.0))
  }

  test("BinningConfig JSON codec: every field round-trips") {
    val c = BinningConfig(
      name = "v", dtype = "numerical", prebinningMethod = "quantile",
      divergence = "js", maxNPrebins = 12, minPrebinSize = 0.02,
      minNBins = Some(2), maxNBins = Some(5), minBinSize = Some(0.01),
      maxBinSize = Some(0.9), minBinNEvent = Some(3L),
      maxBinNNonevent = Some(99L), monotonicTrend = Some("descending"),
      minEventRateDiff = 0.01, maxPvalue = Some(0.05),
      maxPvaluePolicy = "all", gamma = 1.5,
      outlierDetector = Some("zscore"),
      outlierParams = Map("zscore_threshold" -> 3.5),
      fixLb = Some(1.0), fixUb = Some(9.0), catCutoff = Some(0.05),
      catUnknown = Some(-1.0),
      userSplits = Some(Array(1.0, 2.5)),
      userSplitsFixed = Some(Array(true, false)),
      specialCodes = Some(SpecialList(Seq(-9.0, "N/A"))),
      splitDigits = Some(4), classWeight = Some(Map(0.0 -> 1.0, 1.0 -> 2.5)),
      timeLimitMs = 5000L, histogramMaxBuckets = 777)
    val r = ModelIO.configFromJson(ModelIO.configToJson(c))
    assert(r.name == c.name && r.dtype == c.dtype)
    assert(r.prebinningMethod == c.prebinningMethod)
    assert(r.divergence == c.divergence)
    assert(r.maxNPrebins == c.maxNPrebins)
    assert(r.minPrebinSize == c.minPrebinSize)
    assert(r.minNBins == c.minNBins && r.maxNBins == c.maxNBins)
    assert(r.minBinSize == c.minBinSize && r.maxBinSize == c.maxBinSize)
    assert(r.minBinNEvent == c.minBinNEvent)
    assert(r.maxBinNNonevent == c.maxBinNNonevent)
    assert(r.monotonicTrend == c.monotonicTrend)
    assert(r.minEventRateDiff == c.minEventRateDiff)
    assert(r.maxPvalue == c.maxPvalue)
    assert(r.maxPvaluePolicy == c.maxPvaluePolicy)
    assert(r.gamma == c.gamma)
    assert(r.outlierDetector == c.outlierDetector)
    assert(r.outlierParams == c.outlierParams)
    assert(r.fixLb == c.fixLb && r.fixUb == c.fixUb)
    assert(r.catCutoff == c.catCutoff && r.catUnknown == c.catUnknown)
    assert(r.userSplits.get.toSeq == c.userSplits.get.toSeq)
    assert(r.userSplitsFixed.get.toSeq == c.userSplitsFixed.get.toSeq)
    assert(r.specialCodes == c.specialCodes)
    assert(r.splitDigits == c.splitDigits)
    assert(r.classWeight == c.classWeight)
    assert(r.timeLimitMs == c.timeLimitMs)
    assert(r.histogramMaxBuckets == c.histogramMaxBuckets)
    // absent optional collections must load as None, NOT Some(empty)
    // (json4s extracts a missing field as an empty list)
    val d = ModelIO.configFromJson(ModelIO.configToJson(BinningConfig()))
    assert(d.userSplits.isEmpty && d.userSplitsCategorical.isEmpty &&
           d.userSplitsFixed.isEmpty && d.specialCodes.isEmpty &&
           d.classWeight.isEmpty && d.catUnknown.isEmpty)
    // narrow numeric special values NORMALIZE through JSON (the
    // documented contract): Int/Short/Byte -> Long, Float -> Double
    val narrow = BinningConfig(
      outlierParams = Map("k" -> 3, "f" -> 1.5f),
      catUnknown = Some(7),
      specialCodes = Some(SpecialList(Seq(-9, 2.5f, "N/A"))))
    val nr = ModelIO.configFromJson(ModelIO.configToJson(narrow))
    assert(nr.outlierParams == Map("k" -> 3L, "f" -> 1.5))
    assert(nr.catUnknown == Some(7L))
    assert(nr.specialCodes == Some(SpecialList(Seq(-9L, 2.5, "N/A"))))
  }

  test("unfitted Pipeline.save / Pipeline.load keeps the FULL config " +
       "and fits to the same transform") {
    val spark = TestSpark.spark
    val est = new OptimalBinningEstimator()
      .setInputCol("l_extendedprice").setLabelCol("label")
      .setOutputCol("woe").setMetric("woe")
      .setConfig(BinningConfig(
        userSplits = Some(Array(25000.0, 50000.0, 75000.0)),
        monotonicTrend = None))
    val pipe = new Pipeline().setStages(Array(est))
    val path = tmp("pipe")
    pipe.write.overwrite().save(path)
    val loaded = Pipeline.load(path)
    val lest = loaded.getStages(0).asInstanceOf[OptimalBinningEstimator]
    assert(lest.getConfig.userSplits.get.toSeq == Seq(25000.0, 50000.0,
                                                      75000.0))
    assert(lest.getConfig.monotonicTrend.isEmpty)
    val df = liData
    val a = pipe.fit(df).transform(df)
      .agg(round(sum("woe"), 6), count(lit(1))).collect()(0)
    val b = loaded.fit(df).transform(df)
      .agg(round(sum("woe"), 6), count(lit(1))).collect()(0)
    assert(a == b)
    spark.catalog.clearCache()
  }

  test("PipelineModel.save / load transforms IDENTICALLY (woe and " +
       "bins metrics), and the saved model stays ModelIO-readable") {
    val spark = TestSpark.spark
    val df = liData
    Seq("woe", "bins").foreach { metric =>
      val est = new OptimalBinningEstimator()
        .setInputCol("l_extendedprice").setLabelCol("label")
        .setOutputCol("out").setMetric(metric)
        .setConfig(BinningConfig(monotonicTrend = Some("auto")))
      val fitted: PipelineModel =
        new Pipeline().setStages(Array(est)).fit(df)
      val path = tmp(s"model-$metric")
      fitted.write.overwrite().save(path)
      val reloaded = PipelineModel.load(path)
      val a = fitted.transform(df)
        .select(col("l_orderkey"), col("l_linenumber"), col("out"))
        .orderBy("l_orderkey", "l_linenumber").collect()
      val b = reloaded.transform(df)
        .select(col("l_orderkey"), col("l_linenumber"), col("out"))
        .orderBy("l_orderkey", "l_linenumber").collect()
      assert(a.length == b.length && a.sameElements(b),
             s"$metric transform mismatch after reload")
      // the model Param carries the native ModelIO document: the same
      // splits load through the non-spark.ml path too
      val m = reloaded.stages(0).asInstanceOf[OptimalBinningModel]
      val native = ModelIO.fromJson(ModelIO.toJson(m.fitted))
      assert(native.splits.toSeq == m.fitted.splits.toSeq)
    }
    spark.catalog.clearCache()
  }
}
