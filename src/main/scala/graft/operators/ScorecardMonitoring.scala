package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scorecard monitoring (`optbinning/scorecard/monitoring.py:166`):
  * population-stability and significance analysis between an expected
  * (train) and actual (production) cohort. Every report is a small
  * aggregate: score deciles from the expected cohort (one exact
  * percentile agg), then one groupBy per cohort + a bins-sized join.
  */
final class ScorecardMonitoring(val scorecard: FittedScorecard,
                                val psiNBins: Int = 20,
                                /** Score prebinning for the PSI bins:
                                  * "quantile" | "uniform" | "cart"
                                  * (`monitoring.py:195` psi_method;
                                  * reference default "cart"). cart
                                  * needs `psiYCol`. */
                                val psiMethod: String = "quantile",
                                val psiMinBinSize: Double = 0.05,
                                /** Target column for cart score bins
                                  * (`monitoring.py:492-498` fits
                                  * PreBinning on (score, y_expected)). */
                                val psiYCol: Option[String] = None) {

  require(Set("quantile", "uniform", "cart")(psiMethod),
          s"psi_method must be uniform, quantile or cart; got $psiMethod")

  /** Score-bin splits are a function of the EXPECTED cohort only and are
    * fitted once per monitor (the reference's `fit(X_expected)` computes
    * them once, `monitoring.py:480-500`); every report against the same
    * monitor reuses them, so psi/tests/report never re-run the
    * prebinning jobs. */
  private var splitsCache: Array[Double] = _

  private def scoreBins(expected: DataFrame): Array[Double] = {
    if (splitsCache != null) return splitsCache
    splitsCache = computeScoreBins(expected)
    splitsCache
  }

  private def computeScoreBins(expected: DataFrame): Array[Double] = {
    val sc = scorecard.scoreColumn()
    psiMethod match {
      case "quantile" =>
        val probs = (1 until psiNBins).map(_.toDouble / psiNBins)
        expected
          .select(percentile(sc, array(probs.map(lit(_)): _*)).as("q"))
          .head.getSeq[Double](0).toArray.distinct.sorted
      case "uniform" =>
        val r = expected.agg(min(sc), max(sc)).head
        val (lo, hi) = (r.getDouble(0), r.getDouble(1))
        (1 until psiNBins)
          .map(i => lo + (hi - lo) * i / psiNBins).toArray
      case "cart" =>
        val y = psiYCol.getOrElse(throw new IllegalArgumentException(
          "psi_method=cart needs psiYCol (CART fits on (score, y))"))
        // bounded per-score histogram (grid-compressed beyond 10k
        // buckets), then the same greedy CART used for prebinning
        val base = expected.select(sc.as("s"),
                                   col(y).cast("double").as("y"))
        val st = base.agg(count(lit(1)), min(col("s")), max(col("s")))
          .head
        val keyed =
          if (st.getLong(0) <= 10000) base
          else Histograms.gridCompress(base, "s", st.getDouble(1),
                                       st.getDouble(2), 10000)
        val hist = keyed.groupBy("s")
          .agg(count(lit(1)).as("n"),
               sum(when(col("y") === 0.0, 1.0).otherwise(0.0)).as("y0"),
               sum(when(col("y") =!= 0.0, 1.0).otherwise(0.0)).as("y1"))
          .collect()
          .map(r => graft.core.Prebinning.HistBucket(
            r.getDouble(0), r.getLong(1), r.getDouble(2),
            r.getDouble(3)))
          .sortBy(_.value)
        val total = hist.map(_.n).sum
        graft.core.Prebinning.cartSplits(
          hist, maxLeafNodes = psiNBins,
          minSamplesLeaf = math.ceil(psiMinBinSize * total).toLong,
          classification = true)
    }
  }

  /** System stability: PSI over score deciles
    * (`monitoring.py:502-545`). Returns (bin, count_e, count_a, psi). */
  /** Score staged as its own projection, then the bin chain compares a
    * plain attribute. Inlining the score into every `when` branch would
    * evaluate the full points CASE once per split per row (CollapseProject
    * keeps the stage because the alias is non-cheap and referenced by
    * every branch). */
  private def binnedScore(df: DataFrame, splits: Array[Double]): Column = {
    val s = col("__score")
    splits.indices.foldRight(lit(splits.length): Column) { (i, acc) =>
      when(s < splits(i), lit(i)).otherwise(acc)
    }
  }

  def psiTable(expected: DataFrame, actual: DataFrame): DataFrame = {
    val splits = scoreBins(expected)
    def binned(df: DataFrame): DataFrame =
      df.select(scorecard.scoreColumn().as("__score"))
        .select(binnedScore(df, splits).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("count"))
    Monitoring.psiTable(binned(expected), binned(actual))
  }

  def psiTotal(expected: DataFrame, actual: DataFrame): Double =
    psiTable(expected, actual).agg(sum("psi")).head.getDouble(0)

  /** Per-variable PSI over each selected variable's fitted bins
    * (`monitoring.py:776-817`). Returns (variable, psi). */
  def psiVariableTable(expected: DataFrame,
                       actual: DataFrame): Seq[(String, Double)] = {
    scorecard.selected.toSeq.map { v =>
      val f = scorecard.process.fits(v)
      val idx = f.transform(col(v), metric = "indices")
      def binned(df: DataFrame) =
        df.select(idx.as("bin")).groupBy("bin")
          .agg(count(lit(1)).as("count"))
      val psi = Monitoring.psiTable(binned(expected), binned(actual))
        .agg(sum("psi")).head.getDouble(0)
      v -> psi
    }
  }

  /** Significance tests per score bin: 2-proportion Z-test of event rates
    * between cohorts (`monitoring.py:598-654`). Returns
    * (bin, er_expected, er_actual, z, p-value). */
  def significanceTests(expected: DataFrame, actual: DataFrame,
                        yCol: String)
      : Array[(Int, Double, Double, Double, Double)] = {
    val splits = scoreBins(expected)
    def agg(df: DataFrame) = {
      df.select(scorecard.scoreColumn().as("__score"),
                col(yCol).cast("double").as("y"))
        .select(binnedScore(df, splits).as("bin"), col("y"))
        .groupBy("bin")
        .agg(sum("y").as("e"),
             (count(lit(1)).cast("double") - sum("y")).as("ne"))
        .collect()
        .map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2))))
        .toMap
    }
    val e = agg(expected)
    val a = agg(actual)
    (e.keySet ++ a.keySet).toArray.sorted.map { b =>
      val (e1, ne1) = e.getOrElse(b, (0.0, 0.0))
      val (e2, ne2) = a.getOrElse(b, (0.0, 0.0))
      val (z, p) = graft.core.Stats.testProportions(e1, ne1, e2, ne2)
      (b, e1 / math.max(e1 + ne1, 1), e2 / math.max(e2 + ne2, 1), z, p)
    }
  }

  /** Performance comparison: Gini/KS of the score on both cohorts
    * (`monitoring.py:656-700`). */
  def performance(expected: DataFrame, actual: DataFrame,
                  yCol: String): Map[String, Double] = {
    def withScore(df: DataFrame) =
      df.select(col(yCol).as("y"), scorecard.predictProbaColumn().as("p"))
    // gini and ks share the per-score aggregate: one scan per cohort
    val (ge, ke) = ModelMetrics.giniAndKs(withScore(expected), "y", "p")
    val (ga, ka) = ModelMetrics.giniAndKs(withScore(actual), "y", "p")
    Map(
      "gini_expected" -> ge,
      "gini_actual" -> ga,
      "ks_expected" -> ke,
      "ks_actual" -> ka)
  }

  /** Target analysis: count/event statistics per cohort
    * (`monitoring.py` target report). */
  def targetAnalysis(expected: DataFrame, actual: DataFrame,
                     yCol: String): Seq[(String, Double, Double)] = {
    def stats(df: DataFrame): (Double, Double) = {
      val r = df.agg(count(lit(1)).cast("double"),
                     avg(col(yCol).cast("double"))).head
      (r.getDouble(0), r.getDouble(1))
    }
    val (ne, re) = stats(expected)
    val (na, ra) = stats(actual)
    Seq(("count", ne, na), ("event_rate", re, ra))
  }

  /** Text overview mirroring the reference's `system_stability_report`
    * (`monitoring.py:73-163`): PSI total + verdict and the per-bin PSI /
    * p-value histograms, target analysis, performance metrics.
    */
  def systemStabilityReport(expected: DataFrame, actual: DataFrame,
                            yCol: String): String = {
    val psi = psiTable(expected, actual)
      .select("psi").collect().map(_.getDouble(0))
    val tPsi = psi.sum
    def histo(vals: Array[Double], splits: Seq[Double]): Array[Int] = {
      val bins = Array.fill(splits.length + 1)(0)
      vals.foreach { v =>
        bins(splits.count(v > _)) += 1
      }
      bins
    }
    val psiBins = histo(psi, Seq(0.10, 0.25))
    val pvals = significanceTests(expected, actual, yCol).map(_._5)
    val pvalBins = histo(pvals, Seq(0.05, 0.10, 0.50))
    val ta = targetAnalysis(expected, actual, yCol)
    val perf = performance(expected, actual, yCol)
    val sb = new StringBuilder
    sb ++= "System stability report\n\n"
    sb ++= "  Population Stability Index (PSI)\n"
    val verdict = Monitoring.psiVerdict(tPsi)
    sb ++= f"    PSI total: $tPsi%7.4f ($verdict%s)\n"
    Seq("[0.00, 0.10)", "[0.10, 0.25)", "[0.25, Inf+)")
      .zip(psiBins).foreach { case (l, c) =>
        sb ++= f"    $l%-14s $c%5d\n"
      }
    sb ++= "\n  Significance tests (H0: actual == expected)\n"
    Seq("[0.00, 0.05)", "[0.05, 0.10)", "[0.10, 0.50)", "[0.50, 1.00)")
      .zip(pvalBins).foreach { case (l, c) =>
        sb ++= f"    $l%-14s $c%5d\n"
      }
    sb ++= "\n  Target analysis\n"
    ta.foreach { case (k, e, a) =>
      sb ++= f"    $k%-12s expected $e%12.6f actual $a%12.6f\n"
    }
    sb ++= "\n  Performance metrics\n"
    perf.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb ++= f"    $k%-14s $v%10.6f\n"
    }
    sb.result()
  }
}
