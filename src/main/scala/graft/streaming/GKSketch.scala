package graft.streaming

import scala.collection.mutable.ArrayBuffer

/** Greenwald-Khanna epsilon-approximate quantile sketch; faithful
  * re-expression of the reference's GK variant
  * (`optbinning/binning/distributed/gk.py:37-219`, which follows
  * Greenwald & Khanna 2001 with DataDog's gkarray amortization): incoming
  * buffer + amortized merge-compress at 1/eps cadence, spread-aware merge.
  * Mergeable and serializable — the partial-aggregation buffer for the
  * Spark binning sketch aggregate.
  */
final class GKSketch(val eps: Double) extends QuantileSketch {

  override def mergeSketch(other: QuantileSketch): Unit = other match {
    case gk: GKSketch => merge(gk)
    case _ => throw new IllegalArgumentException(
      "cannot merge GK with t-digest")
  }

  final case class Entry(var value: Double, var g: Double, var delta: Double)
    extends Serializable

  var entries: ArrayBuffer[Entry] = ArrayBuffer.empty
  var incoming: ArrayBuffer[Double] = ArrayBuffer.empty
  private var _min: Double = Double.PositiveInfinity
  private var _max: Double = Double.NegativeInfinity
  private var _count: Long = 0L
  private var _sum: Double = 0.0

  private val compressThreshold: Long = (1.0 / eps).toLong + 1

  def n: Long = _count
  def minValue: Double = _min
  def maxValue: Double = _max
  def sum: Double = _sum

  def add(value: Double): Unit = {
    incoming += value
    _count += 1
    _sum += value
    if (value < _min) _min = value
    if (value > _max) _max = value
    if (_count % compressThreshold == 0) mergeCompress()
  }

  def copyFrom(gk: GKSketch): Unit = {
    entries = gk.entries.map(e => Entry(e.value, e.g, e.delta))
    incoming = gk.incoming.clone()
    _count = gk._count
    _min = gk._min
    _max = gk._max
    _sum = gk._sum
  }

  /** Merge another sketch (`gk.py:85-125`). */
  def merge(gk: GKSketch): Unit = {
    require(eps == gk.eps, "gk does not share signature")
    if (gk._count == 0) return
    if (_count == 0) { copyFrom(gk); return }

    val spread = (gk.eps * (gk.n - 1)).toLong
    gk.mergeCompress()

    val mergedEntries = ArrayBuffer.empty[Entry]
    var g = gk.entries(0).g + gk.entries(0).delta - 1 - spread
    if (g > 0) mergedEntries += Entry(gk._min, g, 0)

    val nGk = gk.entries.length
    var i = 0
    while (i < nGk - 1) {
      val tp1 = gk.entries(i + 1)
      val t = gk.entries(i)
      g = tp1.g + (tp1.delta - t.delta)
      if (g > 0) mergedEntries += Entry(t.value, g, 0)
      i += 1
    }
    val lastT = gk.entries(nGk - 1)
    g = spread + 1 - lastT.delta
    if (g > 0) mergedEntries += Entry(lastT.value, g, 0)

    _count += gk._count
    _min = math.min(_min, gk._min)
    _max = math.max(_max, gk._max)
    _sum += gk._sum

    mergeCompress(mergedEntries)
  }

  /** Amortized compress (`gk.py:127-183`). */
  def mergeCompress(extra: ArrayBuffer[Entry] = ArrayBuffer.empty): Unit = {
    val removeThreshold = 2.0 * eps * (_count - 1)
    val inc = ArrayBuffer.empty[Entry]
    incoming.foreach(v => inc += Entry(v, 1, 0))
    extra.foreach(e => inc += Entry(e.value, e.g, e.delta))
    val incSorted = inc.sortBy(_.value)

    val merged = ArrayBuffer.empty[Entry]
    var i = 0
    var j = 0
    val nIncoming = incSorted.length
    val nEntries = entries.length
    var continueLoop = true
    while (i < nIncoming || j < nEntries) {
      continueLoop = true
      if (i == nIncoming) {
        val t = entries(j)
        j += 1
        if (j < nEntries) {
          val tn = entries(j)
          if (t.g + tn.g + tn.delta <= removeThreshold) {
            tn.g += t.g
            continueLoop = false
          }
        }
        if (continueLoop) merged += t
      } else if (j == nEntries) {
        val t = incSorted(i)
        i += 1
        if (i < nIncoming) {
          val tn = incSorted(i)
          if (t.g + tn.g + tn.delta <= removeThreshold) {
            tn.g += t.g
            continueLoop = false
          }
        }
        if (continueLoop) merged += t
      } else if (incSorted(i).value < entries(j).value) {
        val ti = incSorted(i)
        val tj = entries(j)
        if (ti.g + tj.g + tj.delta <= removeThreshold) {
          tj.g += ti.g
        } else {
          ti.delta = tj.g + tj.delta - ti.g
          merged += ti
        }
        i += 1
      } else {
        val t = entries(j)
        j += 1
        if (j < nEntries) {
          val tn = entries(j)
          if (t.g + tn.g + tn.delta <= removeThreshold) {
            tn.g += t.g
            continueLoop = false
          }
        }
        if (continueLoop) merged += t
      }
    }
    entries = merged
    incoming = ArrayBuffer.empty
  }

  /** Quantile query (`gk.py:189-214`). */
  def quantile(q: Double): Double = {
    require(0 <= q && q <= 1, "q must be in [0, 1]")
    require(_count > 0, "GK sketch does not contain values")
    if (incoming.nonEmpty) mergeCompress()
    val rank = (q * (_count - 1) + 1).toLong
    val spread = (eps * (_count - 1)).toLong
    var gSum = 0.0
    var i = 0
    val nEntries = entries.length
    var break = false
    while (i < nEntries && !break) {
      gSum += entries(i).g
      if (gSum + entries(i).delta > rank + spread) break = true
      else i += 1
    }
    if (i == 0) _min else entries(i - 1).value
  }

  /** Flush the incoming buffer and return (value, g) pairs — the inputs to
    * sketch-based bin counting (`bsketch.py:46-62`). */
  def entryCounts(): (Array[Double], Array[Double]) = {
    if (incoming.nonEmpty) mergeCompress()
    (entries.map(_.value).toArray, entries.map(_.g).toArray)
  }
}
