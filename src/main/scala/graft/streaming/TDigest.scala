package graft.streaming

import scala.collection.mutable.ArrayBuffer

/** Shared surface of the two quantile sketches ([[GKSketch]],
  * [[TDigest]]) that back [[BSketch]] — the reference's `sketch`
  * parameter ("gk" | "t-digest", `bsketch.py:22-29`).
  */
trait QuantileSketch extends Serializable {
  def add(value: Double): Unit
  def mergeSketch(other: QuantileSketch): Unit
  def n: Long
  def minValue: Double
  def maxValue: Double
  def sum: Double
  def quantile(q: Double): Double
  /** (representative value, weight) pairs for sketch-based bin counting
    * (`bsketch.py:46-62`). */
  def entryCounts(): (Array[Double], Array[Double])
}

/** Mergeable t-digest (Dunning & Ertl, "Computing extremely accurate
  * quantiles using t-digests", 2019 — the merging-digest variant). The
  * reference wraps the external `tdigest` package (`bsketch.py:16`);
  * this is an independent implementation of the published algorithm:
  * buffered points + incoming centroids are merged in sorted order into
  * new centroids whose cumulative-quantile span is bounded by the k1
  * scale function, concentrating resolution at the tails. More accurate
  * than GK at extreme quantiles, slower to update — matching the
  * trade-off the reference documents (`binning_sketch.py:358-367`).
  */
final class TDigest(val compression: Double = 100.0)
    extends QuantileSketch {

  // (mean, weight), sorted by mean after compress()
  private var means = Array.empty[Double]
  private var weights = Array.empty[Double]
  private val bufMean = ArrayBuffer.empty[Double]
  private val bufWeight = ArrayBuffer.empty[Double]

  private var _count = 0L
  private var _min = Double.PositiveInfinity
  private var _max = Double.NegativeInfinity
  private var _sum = 0.0

  override def n: Long = _count
  override def minValue: Double = _min
  override def maxValue: Double = _max
  override def sum: Double = _sum

  override def add(value: Double): Unit = {
    bufMean += value
    bufWeight += 1.0
    _count += 1
    _sum += value
    if (value < _min) _min = value
    if (value > _max) _max = value
    if (bufMean.length >= 1024) compress()
  }

  override def mergeSketch(other: QuantileSketch): Unit = other match {
    case td: TDigest =>
      td.compress()
      var i = 0
      while (i < td.means.length) {
        bufMean += td.means(i)
        bufWeight += td.weights(i)
        i += 1
      }
      _count += td._count
      _sum += td._sum
      _min = math.min(_min, td._min)
      _max = math.max(_max, td._max)
      compress()
    case _ =>
      throw new IllegalArgumentException("cannot merge t-digest with GK")
  }

  /** k1 scale-function centroid size limit: a centroid spanning
    * cumulative quantiles [qL, qR] is admissible while
    * k(qR) - k(qL) <= 1 with k(q) = (compression / 2pi) asin(2q - 1). */
  private def kScale(q: Double): Double =
    compression / (2.0 * math.Pi) *
      math.asin(2.0 * math.min(math.max(q, 0.0), 1.0) - 1.0)

  private def compress(): Unit = {
    if (bufMean.isEmpty) return
    val m = means.length + bufMean.length
    val allM = new Array[Double](m)
    val allW = new Array[Double](m)
    System.arraycopy(means, 0, allM, 0, means.length)
    System.arraycopy(weights, 0, allW, 0, weights.length)
    var i = 0
    while (i < bufMean.length) {
      allM(means.length + i) = bufMean(i)
      allW(means.length + i) = bufWeight(i)
      i += 1
    }
    bufMean.clear()
    bufWeight.clear()

    val order = allM.indices.sortBy(allM)
    val total = allW.sum
    val outM = ArrayBuffer.empty[Double]
    val outW = ArrayBuffer.empty[Double]

    var curM = allM(order(0))
    var curW = allW(order(0))
    var wSoFar = 0.0
    var kLeft = kScale(0.0)
    i = 1
    while (i < m) {
      val j = order(i)
      val proposed = curW + allW(j)
      val qRight = (wSoFar + proposed) / total
      if (kScale(qRight) - kLeft <= 1.0) {
        // absorb into current centroid (weighted mean)
        curM = (curM * curW + allM(j) * allW(j)) / proposed
        curW = proposed
      } else {
        outM += curM
        outW += curW
        wSoFar += curW
        kLeft = kScale(wSoFar / total)
        curM = allM(j)
        curW = allW(j)
      }
      i += 1
    }
    outM += curM
    outW += curW
    means = outM.toArray
    weights = outW.toArray
  }

  /** Quantile by linear interpolation between centroid means, with the
    * observed min/max as end anchors. */
  override def quantile(q: Double): Double = {
    require(0 <= q && q <= 1, "q must be in [0, 1]")
    require(_count > 0, "t-digest does not contain values")
    compress()
    val k = means.length
    if (k == 1) return means(0)
    val target = q * _count
    // cumulative weight at centroid centers
    var cum = 0.0
    var i = 0
    while (i < k) {
      val center = cum + weights(i) / 2.0
      if (target < center) {
        if (i == 0) return _min + (means(0) - _min) *
          math.max(target, 0.0) / math.max(weights(0) / 2.0, 1e-12)
        val prevCenter = cum - weights(i - 1) / 2.0
        val frac = (target - prevCenter) / math.max(center - prevCenter,
                                                    1e-12)
        return means(i - 1) + (means(i) - means(i - 1)) * frac
      }
      cum += weights(i)
      i += 1
    }
    _max
  }

  override def entryCounts(): (Array[Double], Array[Double]) = {
    compress()
    (means.clone(), weights.clone())
  }
}
