package graft.core

/** Divergence and concentration metrics over discrete distributions.
  * Re-expresses `optbinning/binning/metrics.py` semantics (xlogy-guarded
  * logs, identical masks and orderings) in pure Scala; these run driver-side
  * over <=~100-entry bin aggregates.
  */
object Metrics {

  /** xlogy(x, y) = x * log(y), 0 when x == 0 (scipy.special.xlogy). */
  @inline def xlogy(x: Double, y: Double): Double =
    if (x == 0.0) 0.0 else x * math.log(y)

  /** Entropy of a discrete distribution (`metrics.py:25-38`). */
  def entropy(x: Array[Double]): Double = -x.map(v => xlogy(v, v)).sum

  /** Gini / accuracy ratio from per-bin event, nonevent counts
    * (`metrics.py:41-78`): sort bins by nonevent rate, then
    * 1 - sum_i ev_i*(ne_i + 2*cumsum_{j<i} ne_j) / (tE*tNE).
    */
  def gini(event: Array[Double], nonevent: Array[Double]): Double = {
    val pairs = event.zip(nonevent).filter { case (e, ne) => e + ne > 0 }
    val n = pairs.length
    if (n <= 1) 0.0
    else {
      val te = pairs.map(_._1).sum
      val tne = pairs.map(_._2).sum
      val sorted = pairs.sortBy { case (e, ne) => ne / (e + ne) }
      var cum = 0.0
      var dot = 0.0
      var i = 0
      while (i < n) {
        val (e, ne) = sorted(i)
        dot += e * (ne + 2.0 * cum)
        cum += ne
        i += 1
      }
      1.0 - dot / (te * tne)
    }
  }

  /** Elementwise Kullback-Leibler contributions (`metrics.py:81-104`). */
  def kullbackLeibler(x: Array[Double], y: Array[Double]): Array[Double] =
    x.zip(y).map { case (a, b) => xlogy(a, a / b) }

  def kullbackLeiblerSum(x: Array[Double], y: Array[Double]): Double =
    kullbackLeibler(x, y).sum

  /** Elementwise Jeffrey / IV contributions: (x-y)*log(x/y)
    * (`metrics.py:107-132`). */
  def jeffrey(x: Array[Double], y: Array[Double]): Array[Double] =
    x.zip(y).map { case (a, b) =>
      if (a - b == 0.0) 0.0 else (a - b) * math.log(a / b)
    }

  def jeffreySum(x: Array[Double], y: Array[Double]): Double =
    jeffrey(x, y).sum

  /** Elementwise Jensen-Shannon contributions (`metrics.py:135-157`). */
  def jensenShannon(x: Array[Double], y: Array[Double]): Array[Double] = {
    val m = x.zip(y).map { case (a, b) => 0.5 * (a + b) }
    val klx = kullbackLeibler(x, m)
    val kly = kullbackLeibler(y, m)
    klx.zip(kly).map { case (a, b) => 0.5 * (a + b) }
  }

  def jensenShannonSum(x: Array[Double], y: Array[Double]): Double =
    jensenShannon(x, y).sum

  /** Multivariate Jensen-Shannon over k distributions arranged as columns
    * (`metrics.py:160-196`). X(i)(c) = P_c(i); equal weights when
    * weights == null.
    */
  def jensenShannonMultivariate(x: Array[Array[Double]],
                                weights: Array[Double] = null): Double = {
    val n = x(0).length // number of distributions
    val w = if (weights != null) weights else Array.fill(n)(1.0 / n)
    val mixture = x.map(row => row.zip(w).map { case (v, wi) => v * wi }.sum)
    var js = entropy(mixture)
    var c = 0
    while (c < n) {
      js -= w(c) * entropy(x.map(_(c)))
      c += 1
    }
    js
  }

  /** Elementwise Hellinger discrimination (`metrics.py:199-224`). */
  def hellinger(x: Array[Double], y: Array[Double]): Array[Double] =
    x.zip(y).map { case (a, b) =>
      val d = math.sqrt(a) - math.sqrt(b); 0.5 * d * d
    }

  def hellingerSum(x: Array[Double], y: Array[Double]): Double =
    hellinger(x, y).sum

  /** Elementwise triangular (LeCam) discrimination (`metrics.py:227-253`). */
  def triangular(x: Array[Double], y: Array[Double]): Array[Double] =
    x.zip(y).map { case (a, b) =>
      if (a + b == 0.0) 0.0 else (a - b) * (a - b) / (a + b)
    }

  def triangularSum(x: Array[Double], y: Array[Double]): Double =
    triangular(x, y).sum

  /** Herfindahl-Hirschman index of a share vector (`metrics.py:307-329`). */
  def hhi(s: Array[Double], normalized: Boolean = false): Double = {
    val h = s.map(v => v * v).sum
    if (!normalized) h
    else {
      val n = s.length
      if (n == 1) 1.0
      else {
        val n1 = 1.0 / n
        (h - n1) / (1 - n1)
      }
    }
  }

  /** Binning quality score (`metrics.py:332-344`). */
  def binningQualityScore(iv: Double, pValues: Array[Double],
                          hhiNorm: Double): Double = {
    val c = 0.39573882184806863
    val score1 = iv * math.exp(0.5 * (1 - (iv / c) * (iv / c))) / c
    val score2 = pValues.map(1.0 - _).product
    val score3 = 1.0 - hhiNorm
    score1 * score2 * score3
  }

  /** Multiclass variant normalizes JS by log(n_classes)
    * (`metrics.py:347-350`). */
  def multiclassBinningQualityScore(js: Double, nClasses: Int,
                                    pValues: Array[Double],
                                    hhiNorm: Double): Double =
    binningQualityScore(js / math.log(nClasses), pValues, hhiNorm)

  /** Continuous-target quality score (`metrics.py:353-369`):
    * rwoe = sum|WoE|/mean ratio. */
  def continuousBinningQualityScore(rwoe: Double, pValues: Array[Double],
                                    hhiNorm: Double): Double = {
    val score1 = if (rwoe == 0) 0.0 else math.max(1 - 1 / rwoe, 0.0)
    val score2 = pValues.map(1.0 - _).product
    score1 * score2 * (1.0 - hhiNorm)
  }
}
