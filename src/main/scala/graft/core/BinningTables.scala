package graft.core

/** Driver-side binning artifacts: per-bin aggregate vectors and the
  * binning-table statistics computed from them. Mirrors
  * `optbinning/binning/binning_statistics.py` (binary `:417-608`,
  * continuous `:1517-1700`) including the synthetic trailing
  * Special(s)/Missing (and categorical Others) bins.
  */
object BinningTables {

  /** Interval/category label formatting (`binning_statistics.py:63-77`). */
  def binStrFormat(bins: Array[Double], showDigits: Int): Array[String] = {
    val fmt = s"%.${showDigits}f"
    (0 until bins.length - 1).map { i =>
      val lo = fmt.format(bins(i))
      val hi = fmt.format(bins(i + 1))
      if (bins(i).isInfinite) s"($lo, $hi)" else s"[$lo, $hi)"
    }.toArray
  }

  /** Merge per-prebin counts into final bins following the solver solution
    * (`binning_statistics.py:225-261` bin_info): unselected prebins
    * accumulate into the next selected end.
    */
  def mergeBySolution(solution: Array[Boolean],
                      values: Array[Double]): Array[Double] = {
    val out = new scala.collection.mutable.ArrayBuffer[Double]
    var accum = 0.0
    var i = 0
    while (i < solution.length) {
      if (solution(i)) { out += values(i) + accum; accum = 0.0 }
      else accum += values(i)
      i += 1
    }
    if (solution.isEmpty && values.nonEmpty) out += values(0)
    out.toArray
  }

  /** One row of a binary binning table. */
  final case class BinaryBinRow(bin: String, count: Double, countPct: Double,
                                nonevent: Double, event: Double,
                                eventRate: Double, woe: Double, iv: Double,
                                js: Double)

  /** Binary binning table (`binning_statistics.py:417-608`).
    *
    * @param nNonevent / nEvent per final bin INCLUDING trailing
    *        others/special(s)/missing entries, in that order.
    */
  final class BinaryBinningTable(
      val name: String,
      val dtype: String,
      val splits: Array[Double],
      val nNonevent: Array[Double],
      val nEvent: Array[Double],
      val binLabels: Array[String],
      val nSpecials: Int) {

    val nRecords: Array[Double] =
      nNonevent.zip(nEvent).map { case (a, b) => a + b }
    val tNonevent: Double = nNonevent.sum
    val tEvent: Double = nEvent.sum
    val tRecords: Double = tNonevent + tEvent
    val tEventRate: Double = tEvent / tRecords

    val pRecords: Array[Double] = nRecords.map(_ / tRecords)
    private val pEvent = nEvent.map(_ / tEvent)
    private val pNonevent = nNonevent.map(_ / tNonevent)
    private val mask = nEvent.zip(nNonevent).map { case (e, ne) =>
      e > 0 && ne > 0
    }

    val eventRate: Array[Double] = nEvent.indices.map { i =>
      if (mask(i)) nEvent(i) / nRecords(i) else 0.0
    }.toArray

    private val woeConstant = math.log(tEvent / tNonevent)
    val woe: Array[Double] = eventRate.indices.map { i =>
      if (mask(i)) math.log(1 / eventRate(i) - 1) + woeConstant else 0.0
    }.toArray

    val ivValues: Array[Double] = nEvent.indices.map { i =>
      if (mask(i)) {
        val p = pEvent(i); val q = pNonevent(i)
        if (p - q == 0.0) 0.0 else (p - q) * math.log(p / q)
      } else 0.0
    }.toArray

    val jsValues: Array[Double] = nEvent.indices.map { i =>
      if (mask(i)) {
        val p = pEvent(i); val q = pNonevent(i)
        val m = 0.5 * (p + q)
        0.5 * (Metrics.xlogy(p, p / m) + Metrics.xlogy(q, q / m))
      } else 0.0
    }.toArray

    val iv: Double = ivValues.sum
    val js: Double = jsValues.sum
    val gini: Double = Metrics.gini(nEvent, nNonevent)
    val hellinger: Double = {
      val pe = pEvent.zip(mask).collect { case (v, true) => v }
      val pn = pNonevent.zip(mask).collect { case (v, true) => v }
      Metrics.hellingerSum(pe, pn)
    }
    val triangular: Double = {
      val pe = pEvent.zip(mask).collect { case (v, true) => v }
      val pn = pNonevent.zip(mask).collect { case (v, true) => v }
      Metrics.triangularSum(pe, pn)
    }
    val ks: Double = {
      var cumE = 0.0; var cumNe = 0.0; var best = 0.0
      var i = 0
      while (i < pEvent.length) {
        cumE += pEvent(i); cumNe += pNonevent(i)
        best = math.max(best, math.abs(cumE - cumNe))
        i += 1
      }
      best
    }
    val hhi: Double = Metrics.hhi(pRecords)
    val hhiNorm: Double = Metrics.hhi(pRecords, normalized = true)

    def rows: Array[BinaryBinRow] = binLabels.indices.map { i =>
      BinaryBinRow(binLabels(i), nRecords(i), pRecords(i), nNonevent(i),
                   nEvent(i), eventRate(i), woe(i), ivValues(i), jsValues(i))
    }.toArray

    /** Reference-shaped table DataFrame
      * (`BinningTable.build()`, `binning_statistics.py:515-608`):
      * same column names, optional Totals row. */
    def toDF(spark: org.apache.spark.sql.SparkSession,
             addTotals: Boolean = true)
        : org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      val body = rows.toSeq.map(r =>
        (r.bin, r.count, r.countPct, r.nonevent, r.event,
         r.eventRate, r.woe, r.iv, r.js))
      val withTotals =
        if (addTotals)
          body :+ (("Totals", tRecords, 1.0, tNonevent, tEvent,
                    tEvent / tRecords, Double.NaN, iv, js))
        else body
      withTotals.toDF("Bin", "Count", "Count (%)", "Non-event", "Event",
                      "Event rate", "WoE", "IV", "JS")
    }

    /** Statistical analysis (`binning_statistics.py:879-1005`): adjacent-bin
      * significance tests over the non-synthetic bins, Cramer's V, quality
      * score, and the monotonic-trend classification.
      */
    def analysis(pvalueTest: String = "chi2",
                 nSamples: Int = 100,
                 hasOthers: Boolean = false): BinaryAnalysis = {
      val nBins = nRecords.length
      var nMetric = nBins - 1 - nSpecials
      if (hasOthers) nMetric -= 1
      val nNev = nNonevent.take(nMetric)
      val nEv = nEvent.take(nMetric)

      val cramerV =
        if (nNev.length >= 2) Stats.chi2CramerV(nNev, nEv)._2 else 0.0

      val stats = (0 until nMetric - 1).map { i =>
        val a = Array(nNev(i), nNev(i + 1))
        val b = Array(nEv(i), nEv(i + 1))
        val (t, p) =
          if (pvalueTest == "chi2") {
            val (s, pv, _) = Stats.chi2Contingency(Array(a, b)); (s, pv)
          } else {
            Stats.fisherExact(a(0), a(1), b(0), b(1))
          }
        // obs.ravel() ordering: aA=ne_A, aB=ne_B, bA=e_A, bB=e_B
        val (pab, pba) = Stats.bayesianProbability(
          a(0), a(1), b(0), b(1), nSamples)
        (t, p, pab, pba)
      }.toArray

      val pValues = stats.map(_._2)
      val quality = Metrics.binningQualityScore(iv, pValues, hhiNorm)
      // the same nMetric that bounds the tests: a SpecialDict (several
      // special rows) or an Others bin leaves >2 trailing synthetic
      // rows, which a hardcoded dropRight(2) would feed into the trend
      // classifier as spurious 0.0 rates
      val trendType =
        AutoMonotonic.typeOfMonotonicTrend(eventRate.take(nMetric))
      BinaryAnalysis(cramerV, stats, quality, trendType)
    }
  }

  final case class BinaryAnalysis(
      cramerV: Double,
      adjacentTests: Array[(Double, Double, Double, Double)],
      qualityScore: Double,
      monotonicTrendType: String)

  /** Continuous analysis result: adjacent Welch t-tests
    * (binA, binB, t, p), quality score, monotonic trend type. */
  final case class ContinuousAnalysis(
      adjacentTests: Array[(Int, Int, Double, Double)],
      qualityScore: Double,
      monotonicTrendType: String)

  /** One row of a continuous binning table
    * (`binning_statistics.py:1674-1686`). */
  final case class ContinuousBinRow(bin: String, count: Double,
                                    countPct: Double, sum: Double,
                                    std: Double, mean: Double,
                                    min: Double, max: Double,
                                    zerosCount: Double, woe: Double,
                                    iv: Double)

  /** Continuous binning table (`binning_statistics.py:1517-1700`): WoE_i =
    * |mean_i - t_mean| and IV_i = WoE_i * p_records_i.
    */
  final class ContinuousBinningTable(
      val name: String,
      val dtype: String,
      val splits: Array[Double],
      val nRecords: Array[Double],
      val sums: Array[Double],
      val stds: Array[Double],
      val mins: Array[Double],
      val maxs: Array[Double],
      val nZeros: Array[Double],
      val binLabels: Array[String],
      /** Count of leading DATA bins; -1 = infer as binLabels.length - 2
        * (plain Special + Missing tail). Constructors that add Others or
        * SpecialDict group rows must pass the real count so analysis()
        * excludes every synthetic row. */
      val nDataBins: Int = -1) {

    val tRecords: Double = nRecords.sum
    val tSum: Double = sums.sum
    val tMean: Double = tSum / tRecords
    val pRecords: Array[Double] = nRecords.map(_ / tRecords)
    val means: Array[Double] = sums.zip(nRecords).map { case (s, r) =>
      if (r > 0) s / r else 0.0
    }
    // signed WoE = mean - t_mean; IV = |WoE| * p_records (`:1640-1642`)
    val woe: Array[Double] = means.map(_ - tMean)
    val ivValues: Array[Double] = woe.zip(pRecords).map { case (w, p) =>
      math.abs(w) * p
    }
    val iv: Double = ivValues.sum
    val tWoe: Double = woe.map(math.abs).sum
    val hhi: Double = Metrics.hhi(pRecords)
    val hhiNorm: Double = Metrics.hhi(pRecords, normalized = true)

    def rows: Array[ContinuousBinRow] = binLabels.indices.map { i =>
      ContinuousBinRow(binLabels(i), nRecords(i), pRecords(i), sums(i),
                       stds(i), means(i), mins(i), maxs(i), nZeros(i),
                       woe(i), ivValues(i))
    }.toArray

    /** Continuous table analysis (`binning_statistics.py:1951-2035`):
      * Welch t-tests between consecutive data bins from the stored
      * (mean, std, n) triples, the continuous quality score
      * (`metrics.py:353-366`), and the monotonic-trend type of the mean
      * sequence. Data bins = all but the trailing special/missing rows.
      */
    def analysis(): ContinuousAnalysis = {
      // all-but-synthetic rows; see nDataBins doc (Others/SpecialDict
      // tails are longer than the default Special+Missing pair)
      val nMetric = if (nDataBins >= 0) nDataBins
                    else binLabels.length - 2
      val tests = (0 until math.max(nMetric - 1, 0)).map { i =>
        val (t, p) = graft.core.Stats.ttestIndFromStats(
          means(i), stds(i), nRecords(i),
          means(i + 1), stds(i + 1), nRecords(i + 1))
        (i, i + 1, t, p)
      }.toArray
      val rwoe = if (tMean == 0) tWoe else tWoe / math.abs(tMean)
      val score1 = if (rwoe == 0) 0.0 else math.max(1 - 1 / rwoe, 0.0)
      val score2 = tests.map(1.0 - _._4).product
      val quality = score1 * score2 * (1.0 - hhiNorm)
      val trendType = graft.core.AutoMonotonic.typeOfMonotonicTrend(
        means.take(nMetric))
      ContinuousAnalysis(tests, quality, trendType)
    }

    /** Reference-shaped table DataFrame
      * (`binning_statistics.py:1604-1700`). */
    def toDF(spark: org.apache.spark.sql.SparkSession,
             addTotals: Boolean = true)
        : org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      val body = rows.toSeq.map(r =>
        (r.bin, r.count, r.countPct, r.sum, r.std, r.mean, r.min, r.max,
         r.zerosCount, r.woe, r.iv))
      val withTotals =
        if (addTotals)
          body :+ (("Totals", tRecords, 1.0, tSum, Double.NaN, tMean,
                    mins.filter(!_.isNaN).minOption.getOrElse(Double.NaN),
                    maxs.filter(!_.isNaN).maxOption.getOrElse(Double.NaN),
                    nZeros.sum, tWoe, iv))
        else body
      withTotals.toDF("Bin", "Count", "Count (%)", "Sum", "Std", "Mean",
                      "Min", "Max", "Zeros count", "WoE", "IV")
    }
  }
}
