package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Degenerate-input behavior: constant columns, all-missing columns,
  * single-class targets, tiny inputs. A 100 TB pipeline will contain
  * all of these somewhere; fits must degrade to sensible one-bin
  * tables, never throw.
  */
class EdgeCaseSpec extends AnyFunSuite {

  test("empty input: fit yields an empty one-bin table, transform total") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq.empty[(Double, Int)].toDF("x", "y")
    val f = OptimalBinning.fit(df, "x", "y", BinningConfig(name = "x"))
    assert(f.splits.isEmpty)
    assert(f.table.rows.map(_.count).sum == 0.0)
    // transform over fresh data must still be a total function
    val woe = Seq((1.0, 0)).toDF("x", "y")
      .select(f.transform(col("x")).as("w")).as[Double].collect()
    assert(woe.length == 1 && !woe(0).isNaN)
    // curation ops on empty frames
    assert(graft.pipeline.Curation.stratifiedSample(
      df, col("y"), col("x"), 0.5).count() == 0)
  }

  test("round-7 profiling/cardinality operators degrade cleanly on " +
       "empty and single-row inputs") {
    val spark = TestSpark.spark
    import spark.implicits._
    val empty = Seq.empty[(String, Long)].toDF("g", "key")
    // KMV over an empty frame: only the ALL row, everything zero
    val kmv = Cardinality.kmvDistinct(empty, "g", "key", 8).collect()
    assert(kmv.map(_.getString(0)).toSeq === Seq("ALL"))
    assert(kmv.head.getLong(1) === 0L && kmv.head.getLong(3) === 0L)
    // Benford with no qualifying rows: zero rows, no division anywhere
    assert(QualityChecks.benford(
      Seq(0.1, -5.0).toDF("v"), "v").count() === 0L)
    // KS with one cohort empty: d_num = n1 * F1 max (all mass on one
    // side), never a crash
    val oneSided = Seq((1L, true), (2L, true)).toDF("v", "f")
    val ks = Monitoring.ks2Sample(oneSided, "v", col("f"), 10L)
      .collect().head
    assert(ks.getLong(0) === 2L && ks.getLong(1) === 0L &&
           ks.getLong(2) === 0L) // |0*F1 - 2*F2| with F2 = 0
    // skew report on an empty frame: totals row survives the missing
    // p90 table (left join, not cross)
    val sr = QualityChecks.skewReport(empty, "key").collect().head
    assert(sr.getLong(0) === 0L && sr.isNullAt(4))
    // key-gap audit over one key: dense by definition
    val kg = QualityChecks.keyGapAudit(Seq(42L).toDF("k"), "k", 10L)
      .collect().head
    assert(kg.toSeq.take(5) === Seq(1L, 42L, 42L, 0L, 0L))
    assert(kg.isNullAt(5) && kg.isNullAt(6))
    // gap profile with only single-event keys: zero gaps, null stats
    val gp = Temporal.eventGapProfile(
      Seq((1L, 5L, 1L), (2L, 9L, 2L)).toDF("u", "sec", "id")
        .withColumn("ts", timestamp_seconds(col("sec"))),
      "u", "ts", "id").collect().head
    assert(gp.getLong(0) === 0L && gp.isNullAt(1))
    spark.catalog.clearCache()
  }

  test("BinningProcess: empty variable list no-ops instead of an " +
       "opaque empty.reduceLeft from the melt union") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toDouble, i % 2)).toDF("x", "y")
    val p = BinningProcess.fit(df, Nil, "y")
    assert(p.fits.isEmpty)
    assert(BinningProcess.fitContinuous(df, Nil, "x").isEmpty)
  }

  test("constant column fits to a single bin") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1 to 500).map(i => (7.5, i % 2)).toDF("x", "y")
    val f = OptimalBinning.fit(df, "x", "y", BinningConfig(name = "x"))
    assert(f.splits.isEmpty)
    val woe = df.select(f.transform(col("x")).as("w"))
      .as[Double].collect()
    assert(woe.forall(!_.isNaN))
    assert(math.abs(f.table.rows.map(_.count).sum - 500.0) < 1e-9)
  }

  test("all-missing column: counts land in the missing bin") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1 to 300)
      .map(i => (Option.empty[java.lang.Double], i % 2)).toDF("x", "y")
    val f = OptimalBinning.fit(df, "x", "y", BinningConfig(name = "x"))
    assert(f.splits.isEmpty)
    val missingRow = f.table.rows.find(_.bin == "Missing")
    assert(missingRow.isDefined && missingRow.get.count == 300.0,
           f.table.rows.map(r => s"${r.bin}:${r.count}").mkString(","))
  }

  test("single-class target: fit degrades without throwing") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1 to 400).map(i => (i.toDouble, 0)).toDF("x", "y")
    val f = OptimalBinning.fit(df, "x", "y", BinningConfig(name = "x"))
    // pure-bin refinement merges everything: nothing to separate
    assert(f.splits.isEmpty, f.splits.mkString(","))
    assert(f.table.rows.map(_.count).sum == 400.0)
  }

  test("continuous fit on constant target") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1 to 400).map(i => (i.toDouble, 5.0)).toDF("x", "y")
    val f = ContinuousOptimalBinning.fit(df, "x", "y",
                                         BinningConfig(name = "x"))
    assert(f.table.tMean == 5.0)
    val m = df.select(f.transform(col("x")).as("m")).as[Double].collect()
    assert(m.forall(v => math.abs(v - 5.0) < 1e-9))
  }

  test("tiny input (fewer rows than prebins)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1)).toDF("x", "y")
    val f = OptimalBinning.fit(df, "x", "y", BinningConfig(name = "x"))
    assert(f.table.rows.map(_.count).sum == 4.0)
    val woe = df.select(f.transform(col("x")).as("w"))
      .as[Double].collect()
    assert(woe.forall(!_.isNaN))
  }

  test("spark.ml Pipeline composition: binning stage -> assembler -> LR") {
    val spark = TestSpark.spark
    val df = spark.read.parquet(TestSpark.breastCancer)
      .withColumnRenamed("target", "label")
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.classification.LogisticRegression
    import graft.ml.OptimalBinningEstimator

    val binRadius = new OptimalBinningEstimator()
      .setInputCol("mean radius").setOutputCol("woe_radius")
    val binTexture = new OptimalBinningEstimator()
      .setInputCol("mean texture").setOutputCol("woe_texture")
    val assembler = new VectorAssembler()
      .setInputCols(Array("woe_radius", "woe_texture"))
      .setOutputCol("features")
    val lr = new LogisticRegression().setMaxIter(25)
    val pipeline = new Pipeline()
      .setStages(Array(binRadius, binTexture, assembler, lr))

    val model = pipeline.fit(df)
    val scored = model.transform(df)
    assert(scored.columns.contains("prediction"))
    val auc = new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setRawPredictionCol("rawPrediction").evaluate(scored)
    assert(auc > 0.9, s"auc $auc")
    // fitted binning accessible from the pipeline model
    val fitted = model.stages(0)
      .asInstanceOf[graft.ml.OptimalBinningModel].fitted
    assert(fitted.splits.nonEmpty)

    // transformSchema must declare the ACTUAL output type per metric:
    // "bins" emits string labels and "indices" integer ids — a
    // DoubleType declaration would pass Pipeline validation and break
    // the downstream stage at runtime
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}
    def declared(metric: String) = new OptimalBinningEstimator()
      .setInputCol("mean radius").setOutputCol("out").setMetric(metric)
      .transformSchema(df.schema).apply("out").dataType
    assert(declared("woe") == DoubleType)
    assert(declared("bins") == StringType)
    assert(declared("indices") == IntegerType)
    val binsModel = new OptimalBinningEstimator()
      .setInputCol("mean radius").setOutputCol("binlab")
      .setMetric("bins").fit(df)
    assert(binsModel.transformSchema(df.schema)("binlab").dataType ==
           StringType)
    assert(binsModel.transform(df).schema("binlab").dataType ==
           StringType)
  }

  test("binning table toDF mirrors the reference build() shape") {
    val spark = TestSpark.spark
    val df = spark.read.parquet(TestSpark.breastCancer)
    val f = OptimalBinning.fit(df, "mean radius", "target",
                               BinningConfig(name = "mean radius"))
    val t = f.table.toDF(spark)
    assert(t.columns.toSeq == Seq("Bin", "Count", "Count (%)", "Non-event",
                                  "Event", "Event rate", "WoE", "IV", "JS"))
    val totals = t.where(col("Bin") === "Totals").head
    assert(totals.getDouble(1) == 569.0)
    assert(math.abs(totals.getDouble(7) - 5.04392547) < 1e-6)

    val cf = ContinuousOptimalBinning.fit(
      spark.read.parquet("src/test/resources/boston_housing.parquet"),
      "LSTAT", "target", BinningConfig(name = "LSTAT"))
    val ct = cf.table.toDF(spark)
    assert(ct.columns.contains("Zeros count"))
    assert(ct.where(col("Bin") === "Totals").head.getDouble(1) == 506.0)
  }

  test("categorical with a single category") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = (1 to 200).map(i => ("only", i % 2)).toDF("x", "y")
    val f = OptimalBinning.fit(df, "x", "y",
      BinningConfig(name = "x", dtype = "categorical"))
    assert(f.table.rows.map(_.count).sum == 200.0)
  }

  test("fix_lb/fix_ub bound filter restricts clean rows only") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rows = (1 to 400).map(i => (i.toDouble, i % 2)) :+
      ((Double.NaN, 1))
    val df = rows.toDF("x", "y")
    val f = OptimalBinning.fit(df, "x", "y",
      BinningConfig(name = "x", fixLb = Some(50.0), fixUb = Some(350.0),
                    monotonicTrend = None))
    // clean mass is exactly the in-bound rows; missing row is preserved
    val dataCount = f.table.rows.take(f.nDataBins).map(_.count).sum
    assert(math.abs(dataCount - 301.0) < 1e-9, s"dataCount $dataCount")
    val missingRow = f.table.rows.find(_.bin == "Missing")
    assert(missingRow.exists(_.count == 1.0))
  }

  test("special-code dict groups get separate bins and transforms") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 900).map { i =>
      val x = i % 9 match {
        case 7 => -1.0   // special group "sentinel"
        case 8 => -2.0   // special group "error"
        case _ => rnd.nextDouble() * 100
      }
      (x, if (rnd.nextDouble() < 0.4) 1.0 else 0.0)
    }
    val df = rows.toDF("x", "y")
    val f = OptimalBinning.fit(df, "x", "y",
      BinningConfig(name = "x",
        specialCodes = Some(SpecialDict(Seq(
          "sentinel" -> Seq(-1.0), "error" -> Seq(-2.0)))),
        monotonicTrend = None))
    val labels = f.table.rows.map(_.bin)
    assert(labels.contains("sentinel"), labels.toSeq)
    assert(labels.contains("error"), labels.toSeq)
    val sentinelRow = f.table.rows.find(_.bin == "sentinel").get
    val errorRow = f.table.rows.find(_.bin == "error").get
    assert(sentinelRow.count == 100.0, sentinelRow)
    assert(errorRow.count == 100.0, errorRow)
    // transform maps each group to ITS OWN empirical event-rate value
    val t = df.select(col("x"),
      f.transform(col("x"), metric = "event_rate").as("er"))
    val erSent = t.where(col("x") === -1.0).select("er").distinct().collect()
    val erErr = t.where(col("x") === -2.0).select("er").distinct().collect()
    assert(erSent.length == 1 && erErr.length == 1)
    assert(math.abs(erSent(0).getDouble(0) - sentinelRow.eventRate) < 1e-9)
    assert(math.abs(erErr(0).getDouble(0) - errorRow.eventRate) < 1e-9)
  }

  test("round-7 operators degrade cleanly on empty/degenerate inputs") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    // funnel with NO step-1 events: every step row emits 0 users
    val ev = Seq((1L, new Timestamp(1000L), "view"))
      .toDF("user_id", "ts", "event_type")
    val fun = graft.operators.Funnel
      .funnelCounts(ev, "user_id", "ts", "event_type",
                    Seq("signup", "view"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(fun.toSeq == Seq((1, 0L), (2, 0L)), fun.toSeq)
    // token budget over an input with no positive-token rows: empty
    val docs0 = Seq((1L, "s", 0L), (2L, "s", 0L))
      .toDF("id", "source", "ntok")
    assert(graft.pipeline.Curation.tokenBudgetSample(
      docs0, col("source"), col("id"), col("ntok"), 10L).count() == 0)
    // hybrid RRF when the keyword side matches nothing: vector-only
    // contributions survive
    val d = Seq((1L, "alpha")).toDF("doc_id", "text")
    val e = Seq((1L, Seq(1.0f)), (2L, Seq(0.5f)))
      .toDF("vec_id", "embedding")
    val rrf = graft.pipeline.Search.hybridRrf(
      d, e, "text", "doc_id", "vec_id", "embedding",
      Seq("zzz_nomatch"), Array(1.0), kList = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rrf.toSeq == Seq((1L, 16393L), (2L, 16129L)), rrf.toSeq)
    // grouped median of an empty frame: no rows, no throw
    assert(graft.operators.Histograms.groupedLowerMedian(
      Seq.empty[(String, Option[Double])].toDF("g", "v"), "g", "v")
      .count() == 0)
    // scd2/transitions with all-null ts: empty, no throw
    val nullTs = Seq((1L, null.asInstanceOf[Timestamp], 1L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(graft.operators.Temporal
      .scd2Intervals(nullTs, "user_id", "ts", "event_id").count() == 0)
    assert(graft.operators.Temporal
      .transitionCounts(nullTs, "user_id", "ts", "event_id",
                        "event_type").count() == 0)
  }
}
