package graft.core

import org.apache.commons.math3.distribution.{
  BetaDistribution, HypergeometricDistribution, NormalDistribution,
  TDistribution, ChiSquaredDistribution
}
import org.apache.commons.math3.special.Beta

/** Statistical tests used by the binning-table `analysis()` phase and the
  * p-value bin constraints. Re-expresses the scipy.stats calls in the
  * reference (`optbinning/binning/metrics.py:256-304`,
  * `optbinning/binning/model_data.py:19-27,75-90`) on commons-math3, which
  * ships on the Spark classpath.
  */
object Stats {
  private val stdNormal = new NormalDistribution(null, 0.0, 1.0)

  /** Survival function of the standard normal. */
  def normSf(x: Double): Double = 1.0 - stdNormal.cumulativeProbability(x)

  /** Inverse CDF (percent-point function) of the standard normal. */
  def normPpf(p: Double): Double = stdNormal.inverseCumulativeProbability(p)

  /** Two-proportion pooled Z-test (`metrics.py:256-268`).
    * Returns (|z|, two-sided p-value).
    */
  def testProportions(e1: Double, ne1: Double, e2: Double,
                      ne2: Double): (Double, Double) = {
    val n1 = e1 + ne1
    val n2 = e2 + ne2
    val p1 = e1 / n1
    val p2 = e2 / n2
    val p = (e1 + e2) / (n1 + n2)
    val z = (p1 - p2) / math.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
    val statistic = math.abs(z)
    (statistic, 2.0 * normSf(statistic))
  }

  /** Pearson chi-squared test of independence, no continuity correction,
    * on an r x k contingency table (rows = observations vectors).
    * Mirrors `scipy.stats.chi2_contingency(obs, correction=False)`.
    * Returns (statistic, p-value, dof).
    */
  def chi2Contingency(obs: Array[Array[Double]]): (Double, Double, Int) = {
    val r = obs.length
    val k = obs(0).length
    val rowSums = obs.map(_.sum)
    val colSums = Array.tabulate(k)(j => obs.map(_(j)).sum)
    val total = rowSums.sum
    var stat = 0.0
    var i = 0
    while (i < r) {
      var j = 0
      while (j < k) {
        val e = rowSums(i) * colSums(j) / total
        if (e > 0) {
          val d = obs(i)(j) - e
          stat += d * d / e
        }
        j += 1
      }
      i += 1
    }
    val dof = (r - 1) * (k - 1)
    val p =
      if (dof <= 0) 1.0
      else 1.0 - new ChiSquaredDistribution(null, dof.toDouble)
        .cumulativeProbability(stat)
    (stat, p, dof)
  }

  /** chi2 + Cramer's V for a 2 x k table of (nonevent, event) counts
    * (`metrics.py:271-280`). */
  def chi2CramerV(nNonevent: Array[Double],
                  nEvent: Array[Double]): (Double, Double) = {
    val (t, _, _) = chi2Contingency(Array(nNonevent, nEvent))
    val cramerV = math.sqrt(t / (nNonevent.sum + nEvent.sum))
    (t, cramerV)
  }

  /** chi2 + Cramer's V for an r x k table (`metrics.py:283-288`). */
  def chi2CramerVMulti(table: Array[Array[Double]]): (Double, Double) = {
    val r = table.length
    val k = table(0).length
    val (t, _, _) = chi2Contingency(table)
    val total = table.map(_.sum).sum
    val cramerV = math.sqrt(t / total / math.min(k - 1, r - 1))
    (t, cramerV)
  }

  /** Fisher exact test, two-sided, for a 2x2 table ((a,b),(c,d)).
    * Mirrors `scipy.stats.fisher_exact` (`metrics.py:276`): odds ratio =
    * a*d/(b*c); p = sum of hypergeometric pmf values <= pmf(observed)
    * (with scipy's relative tolerance factor 1+1e-7).
    */
  def fisherExact(a: Double, b: Double, c: Double,
                  d: Double): (Double, Double) = {
    val ai = math.round(a).toInt; val bi = math.round(b).toInt
    val ci = math.round(c).toInt; val di = math.round(d).toInt
    val n = ai + bi + ci + di
    val k = ai + bi        // row 1 total (successes drawn)
    val m = ai + ci        // col 1 total (success states)
    val hg = new HypergeometricDistribution(null, n, m, k)
    val pObs = hg.probability(ai)
    val lo = math.max(0, k - (n - m))
    val hi = math.min(k, m)
    var p = 0.0
    var x = lo
    val eps = pObs * (1 + 1e-7)
    while (x <= hi) {
      val px = hg.probability(x)
      if (px <= eps) p += px
      x += 1
    }
    val odds =
      if (bi * ci == 0) Double.PositiveInfinity
      else a * d / (b * c)
    (odds, math.min(p, 1.0))
  }

  /** Welch two-sample t-test from summary stats, equal_var=False; mirrors
    * `scipy.stats.ttest_ind_from_stats(u1, s1, n1, u2, s2, n2, False)`
    * (`model_data.py:75-90`, `monitoring.py:650-652`).
    * Returns (t, two-sided p-value).
    */
  def ttestIndFromStats(u1: Double, s1: Double, n1: Double, u2: Double,
                        s2: Double, n2: Double): (Double, Double) = {
    val vn1 = s1 * s1 / n1
    val vn2 = s2 * s2 / n2
    val df = {
      val num = (vn1 + vn2) * (vn1 + vn2)
      val den = vn1 * vn1 / (n1 - 1) + vn2 * vn2 / (n2 - 1)
      if (den == 0) 1.0 else num / den
    }
    val t = (u1 - u2) / math.sqrt(vn1 + vn2)
    val dist = new TDistribution(null, df)
    val p = 2.0 * (1.0 - dist.cumulativeProbability(math.abs(t)))
    (t, p)
  }

  /** Bayesian A/B probability P[p_A > p_B] under Beta posteriors
    * (`metrics.py:296-304`). The reference shuffles the evaluation grid, but
    * the mean over the grid is permutation-invariant, so a deterministic
    * midpoint grid gives the identical result.
    * obs = ((aA, aB), (bA, bB)); returns (P[A>B], P[B>A]).
    */
  def bayesianProbability(aA: Double, aB: Double, bA: Double, bB: Double,
                          nSamples: Int): (Double, Double) = {
    val betaB = new BetaDistribution(null, aB, bB)
    var acc = 0.0
    var i = 1
    while (i <= nSamples) {
      val v = (i - 0.5) / nSamples
      val x = betaB.inverseCumulativeProbability(v)
      acc += Beta.regularizedBeta(x, aA, bA)
      i += 1
    }
    val p = acc / nSamples
    (p, 1 - p)
  }

  /** Exact 1-feature L2-regularized logistic regression on a weighted
    * value histogram — sklearn `LogisticRegression()` default objective
    * (C = 1: 0.5 * beta^2 + sum log-loss; intercept unpenalized), solved
    * by full Newton to machine precision (sklearn's lbfgs stops at
    * tol = 1e-4, so agreement is ~1e-4 relative). Returns (alpha, beta)
    * of P[y=1|x] = sigmoid(alpha + beta * x).
    */
  def logistic1D(values: Array[Double], weights: Array[Double],
                 rates: Array[Double], l2: Double = 1.0): (Double, Double) = {
    var a = 0.0; var b = 0.0
    var it = 0
    while (it < 200) {
      var g0 = 0.0; var g1 = 0.0
      var h00 = 0.0; var h01 = 0.0; var h11 = 0.0
      var i = 0
      while (i < values.length) {
        val x = values(i); val w = weights(i); val y = rates(i)
        val z = a + b * x
        val s = 1.0 / (1.0 + math.exp(-z))
        val d = w * (s - y)
        val h = math.max(w * s * (1.0 - s), 1e-300)
        g0 += d; g1 += d * x
        h00 += h; h01 += h * x; h11 += h * x * x
        i += 1
      }
      g1 += l2 * b
      h11 += l2
      val det = h00 * h11 - h01 * h01
      if (math.abs(det) < 1e-300) return (a, b)
      val da = (h11 * g0 - h01 * g1) / det
      val db = (h00 * g1 - h01 * g0) / det
      a -= da; b -= db
      if (math.abs(da) < 1e-13 && math.abs(db) < 1e-13) return (a, b)
      it += 1
    }
    (a, b)
  }
}
