package graft.core

/** Candidate-bin tables for the optimal-binning solver, mirroring
  * `optbinning/binning/model_data.py`. For n prebins:
  * - `V(i)(j)` = scaled divergence contribution of candidate bin spanning
  *   prebins j..i (suffix-cumsum construction, `model_data.py:123-148`).
  * - `D(i)(j)` = scaled event rate of that candidate bin.
  * - violation pairs: adjacent candidate-bin pairs that may not both be
  *   selected (p-value Z-test / min event-rate diff, `model_data.py:30-107`).
  * Values are scaled by M=1e6 and truncated to Long exactly as the reference
  * does (`cp.py:53`, numpy astype int64), so objective values are comparable.
  */
object ModelData {

  final case class BinaryModelData(
      d: Array[Array[Long]],          // event rate, scaled
      v: Array[Array[Long]],          // divergence contribution, scaled
      sEvent: Array[Array[Double]],   // events in candidate bin j..i
      sNonevent: Array[Array[Double]],
      pvalueViolations: Array[((Int, Int), (Int, Int))],
      minDiffViolations: Array[((Int, Int), (Int, Int))])

  val M: Double = 1e6

  /** `model_data.py:110-174`. Divergence in {iv, js, hellinger, triangular}.
    */
  def binary(divergence: String, nNonevent: Array[Double],
             nEvent: Array[Double], maxPvalue: Option[Double],
             maxPvaluePolicy: String,
             minEventRateDiff: Double): BinaryModelData = {
    val n = nNonevent.length
    val tEvent = nEvent.sum
    val tNonevent = nNonevent.sum

    val d = Array.ofDim[Array[Long]](n)
    val v = Array.ofDim[Array[Long]](n)
    val eTab = Array.ofDim[Array[Double]](n)
    val neTab = Array.ofDim[Array[Double]](n)

    var i = 1
    while (i <= n) {
      // suffix cumsums over prebins 0..i-1: s(j) = sum over j..i-1
      val sE = new Array[Double](i)
      val sNE = new Array[Double](i)
      var acc1 = 0.0; var acc2 = 0.0
      var j = i - 1
      while (j >= 0) {
        acc1 += nEvent(j); acc2 += nNonevent(j)
        sE(j) = acc1; sNE(j) = acc2
        j -= 1
      }
      val rate = new Array[Long](i)
      val iv = new Array[Long](i)
      j = 0
      while (j < i) {
        val p = sE(j) / tEvent
        val q = sNE(j) / tNonevent
        val div = divergence match {
          case "iv" =>
            if (p - q == 0.0) 0.0 else (p - q) * math.log(p / q)
          case "js" =>
            val m = 0.5 * (p + q)
            0.5 * (Metrics.xlogy(p, p / m) + Metrics.xlogy(q, q / m))
          case "hellinger" =>
            val dd = math.sqrt(p) - math.sqrt(q); 0.5 * dd * dd
          case "triangular" =>
            if (p + q == 0.0) 0.0 else (p - q) * (p - q) / (p + q)
        }
        rate(j) = (sE(j) / (sE(j) + sNE(j)) * M).toLong // trunc, as astype
        iv(j) = (div * M).toLong
        j += 1
      }
      d(i - 1) = rate
      v(i - 1) = iv
      eTab(i - 1) = sE
      neTab(i - 1) = sNE
      i += 1
    }

    val pv = maxPvalue match {
      case Some(mp) =>
        findPvalueViolations(n, eTab, neTab, mp, maxPvaluePolicy)
      case None => Array.empty[((Int, Int), (Int, Int))]
    }
    val md =
      if (minEventRateDiff > 0)
        findMinDiffViolations(n, d, (minEventRateDiff * M).toLong)
      else Array.empty[((Int, Int), (Int, Int))]

    BinaryModelData(d, v, eTab, neTab, pv, md)
  }

  /** Z-test violation pairs (`model_data.py:30-57`). A pair
    * (((i,r),(j,k))) means candidate bins (r..i) and (k..j) are NOT
    * significantly different (|z| < z(1-p/2)) and may not both be selected.
    * Policy "consecutive" only emits pairs with k == i+1 (adjacent bins).
    */
  def findPvalueViolations(n: Int, e: Array[Array[Double]],
                           ne: Array[Array[Double]], maxPvalue: Double,
                           policy: String)
      : Array[((Int, Int), (Int, Int))] = {
    val zscore = Stats.normPpf(1.0 - maxPvalue / 2)
    val out = new scala.collection.mutable.ArrayBuffer[((Int, Int), (Int, Int))]
    def zOk(e1: Double, ne1: Double, e2: Double, ne2: Double): Boolean = {
      val n1 = e1 + ne1; val n2 = e2 + ne2
      val p1 = e1 / n1; val p2 = e2 / n2
      val p = (e1 + e2) / (n1 + n2)
      val z = (p1 - p2) / math.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
      math.abs(z) < zscore
    }
    policy match {
      case "all" =>
        for (i <- 0 until n - 1; r <- 0 to i; j <- i + 1 until n;
             k <- i + 1 to j)
          if (zOk(e(i)(r), ne(i)(r), e(j)(k), ne(j)(k)))
            out += (((i, r), (j, k)))
      case "consecutive" =>
        for (i <- 0 until n - 1; r <- 0 to i; j <- i + 1 until n)
          if (zOk(e(i)(r), ne(i)(r), e(j)(i + 1), ne(j)(i + 1)))
            out += (((i, r), (j, i + 1)))
    }
    out.toArray
  }

  /** Min event-rate-diff violation pairs over adjacent candidates
    * (`model_data.py:96-107`). */
  def findMinDiffViolations(n: Int, x: Array[Array[Long]],
                            minDiff: Long): Array[((Int, Int), (Int, Int))] = {
    val out = new scala.collection.mutable.ArrayBuffer[((Int, Int), (Int, Int))]
    for (i <- 0 until n - 1; k <- 0 to i; j <- i + 1 until n)
      if (math.abs(x(i)(k) - x(j)(i + 1)) < minDiff)
        out += (((i, k), (j, i + 1)))
    out.toArray
  }

  /** Multiclass model data (`model_data.py:177-242`): per class one-vs-rest
    * D/V tables plus per-class violation pairs; same scaling. */
  def multiclass(nNonevent: Array[Array[Double]],  // (prebin)(class)
                 nEvent: Array[Array[Double]],
                 maxPvalue: Option[Double], maxPvaluePolicy: String,
                 minEventRateDiff: Double)
      : Array[BinaryModelData] = {
    val nClasses = nEvent(0).length
    Array.tabulate(nClasses) { c =>
      binary("iv", nNonevent.map(_(c)), nEvent.map(_(c)), maxPvalue,
             maxPvaluePolicy, minEventRateDiff)
    }
  }

  // --- continuous target ------------------------------------------------

  final case class ContinuousModelData(
      d: Array[Array[Long]],       // scaled bin means (monotonicity)
      v: Array[Array[Long]],       // scaled objective contribution
      uTab: Array[Array[Double]],  // unscaled means
      sTab: Array[Array[Double]],  // stds
      rTab: Array[Array[Double]],  // record counts
      pvalueViolations: Array[((Int, Int), (Int, Int))],
      minDiffViolations: Array[((Int, Int), (Int, Int))])

  /** Continuous model data (`model_data.py:246-299`): candidate bin j..i
    * contributes |mean(bin) - t_mean| (scaled to int64) to the objective;
    * monotonicity compares scaled means; min-diff / p-value violations use
    * unscaled means (std, n) per reference.
    */
  def continuous(nRecords: Array[Double], sums: Array[Double],
                 ssums: Array[Double],
                 maxPvalue: Option[Double], maxPvaluePolicy: String,
                 minMeanDiff: Double): ContinuousModelData = {
    val n = nRecords.length
    val tMean = sums.sum / nRecords.sum

    val d = Array.ofDim[Array[Long]](n)
    val v = Array.ofDim[Array[Long]](n)
    val uTab = Array.ofDim[Array[Double]](n)
    val sTab = Array.ofDim[Array[Double]](n)
    val rTab = Array.ofDim[Array[Double]](n)

    var i = 1
    while (i <= n) {
      val sR = new Array[Double](i)
      val sS = new Array[Double](i)
      val sSS = new Array[Double](i)
      var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
      var j = i - 1
      while (j >= 0) {
        a1 += nRecords(j); a2 += sums(j); a3 += ssums(j)
        sR(j) = a1; sS(j) = a2; sSS(j) = a3
        j -= 1
      }
      val mean = new Array[Double](i)
      val std = new Array[Double](i)
      val meanScaled = new Array[Long](i)
      val obj = new Array[Long](i)
      j = 0
      while (j < i) {
        mean(j) = sS(j) / sR(j)
        val variance = sSS(j) / sR(j) - mean(j) * mean(j)
        std(j) = math.sqrt(math.max(variance, 0.0))
        meanScaled(j) = (mean(j) * M).toLong
        obj(j) = (math.abs(mean(j) - tMean) * M).toLong
        j += 1
      }
      d(i - 1) = meanScaled
      v(i - 1) = obj
      uTab(i - 1) = mean
      sTab(i - 1) = std
      rTab(i - 1) = sR
      i += 1
    }

    val pv = maxPvalue match {
      case Some(mp) =>
        val out =
          new scala.collection.mutable.ArrayBuffer[((Int, Int), (Int, Int))]
        maxPvaluePolicy match {
          case "all" =>
            for (i2 <- 0 until n - 1; t <- 0 to i2; j <- i2 + 1 until n;
                 k <- i2 + 1 to j) {
              val p = Stats.ttestIndFromStats(
                uTab(i2)(t), sTab(i2)(t), rTab(i2)(t),
                uTab(j)(k), sTab(j)(k), rTab(j)(k))._2
              if (p > mp) out += (((i2, t), (j, k)))
            }
          case "consecutive" =>
            for (i2 <- 0 until n - 1; k <- 0 to i2; j <- i2 + 1 until n) {
              val p = Stats.ttestIndFromStats(
                uTab(i2)(k), sTab(i2)(k), rTab(i2)(k),
                uTab(j)(i2 + 1), sTab(j)(i2 + 1), rTab(j)(i2 + 1))._2
              if (p > mp) out += (((i2, k), (j, i2 + 1)))
            }
        }
        out.toArray
      case None => Array.empty[((Int, Int), (Int, Int))]
    }

    val md =
      if (minMeanDiff > 0) {
        val out =
          new scala.collection.mutable.ArrayBuffer[((Int, Int), (Int, Int))]
        for (i2 <- 0 until n - 1; k <- 0 to i2; j <- i2 + 1 until n)
          if (math.abs(uTab(i2)(k) - uTab(j)(i2 + 1)) < minMeanDiff)
            out += (((i2, k), (j, i2 + 1)))
        out.toArray
      } else Array.empty[((Int, Int), (Int, Int))]

    ContinuousModelData(d, v, uTab, sTab, rTab, pv, md)
  }
}
