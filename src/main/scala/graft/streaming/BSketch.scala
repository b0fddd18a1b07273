package graft.streaming

/** Binning sketch for a numerical variable against a binary target
  * (`optbinning/binning/distributed/bsketch.py:65-268`): event and
  * non-event values tracked in two separate GK sketches plus
  * missing/special counters. The state is a commutative monoid — the
  * Spark partial-aggregation buffer.
  */
final class BSketch(val eps: Double,
                    val specialCodes: Array[Double],
                    val sketchType: String = "gk") extends Serializable {

  private def mkSketch(): QuantileSketch = sketchType match {
    case "gk"       => new GKSketch(eps)
    // the reference passes eps straight through as the tdigest
    // package's delta (`bsketch.py:102` TDigest(eps, K)); the
    // merging-digest equivalent is compression ~ 1/delta — a
    // hardcoded compression would silently IGNORE the caller's
    // accuracy request (eps=1e-4 used to get the same digest as
    // eps=1e-1). Floor of 20 keeps a degenerate eps from collapsing
    // the digest to a handful of centroids.
    // clamped: eps -> 0 would make the compression infinite and the
    // digest never compress (unbounded centroids); 1e6 centroids is
    // already far beyond any accuracy a caller can mean by eps
    case "t-digest" =>
      new TDigest(math.min(1e6, math.max(20.0, 1.0 / math.max(eps, 1e-9))))
    case other => throw new IllegalArgumentException(
      s"sketch must be gk or t-digest; got $other")
  }

  val sketchE: QuantileSketch = mkSketch()
  val sketchNe: QuantileSketch = mkSketch()
  var countMissingE: Long = 0L
  var countMissingNe: Long = 0L
  var countSpecialE: Long = 0L
  var countSpecialNe: Long = 0L

  def nEvent: Long = sketchE.n
  def nNonevent: Long = sketchNe.n
  def n: Long = nEvent + nNonevent

  /** Add one observation; x may be null/NaN (missing) or special. */
  def add(x: java.lang.Double, y: Double): Unit = {
    val isEvent = y == 1.0
    if (x == null || x.isNaN) {
      if (isEvent) countMissingE += 1 else countMissingNe += 1
    } else if (specialCodes != null && specialCodes.contains(x.toDouble)) {
      if (isEvent) countSpecialE += 1 else countSpecialNe += 1
    } else {
      if (isEvent) sketchE.add(x) else sketchNe.add(x)
    }
  }

  def merge(other: BSketch): Unit = {
    require(eps == other.eps && sketchType == other.sketchType,
            "bsketch does not share signature")
    sketchE.mergeSketch(other.sketchE)
    sketchNe.mergeSketch(other.sketchNe)
    countMissingE += other.countMissingE
    countMissingNe += other.countMissingNe
    countSpecialE += other.countSpecialE
    countSpecialNe += other.countSpecialNe
  }

  /** Per-bin (event, nonevent) counts from the sketch entries
    * (`bsketch.py:148-174`): searchsorted side='left' — a value equal to a
    * split goes to the LOWER bin, mirroring `_indices_count`.
    */
  def bins(splits: Array[Double]): (Array[Double], Array[Double]) = {
    val nBins = splits.length + 1
    val binsE = new Array[Double](nBins)
    val binsNe = new Array[Double](nBins)
    def accumulate(sk: QuantileSketch, out: Array[Double]): Unit = {
      val (values, counts) = sk.entryCounts()
      var i = 0
      while (i < values.length) {
        out(searchSortedLeft(splits, values(i))) += counts(i)
        i += 1
      }
    }
    accumulate(sketchE, binsE)
    accumulate(sketchNe, binsNe)
    (binsE, binsNe)
  }

  /** np.searchsorted(a, v, side='left'): count of a(i) < v. */
  private def searchSortedLeft(a: Array[Double], v: Double): Int = {
    var lo = 0; var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) / 2
      if (a(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Combined event+nonevent sketch for equi-quantile split generation
    * (`bsketch.py:208-222` merge_sketches). */
  def mergedSketch: QuantileSketch = {
    val out = mkSketch()
    out.mergeSketch(sketchE)
    out.mergeSketch(sketchNe)
    out
  }
}
