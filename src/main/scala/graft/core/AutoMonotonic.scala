package graft.core

/** Automatic monotonic-trend selection, a verbatim re-expression of the
  * hard-coded decision trees in `optbinning/binning/auto_monotonic.py`.
  * Operates on the <=max_n_prebins prebin aggregate, driver-side.
  */
object AutoMonotonic {

  /** Number of sign changes (peaks + valleys) in a sequence
    * (`auto_monotonic.py:13-26`). */
  def nPeaksValleys(x: Array[Double]): Int = {
    val diffSign = x.sliding(2).map { w =>
      math.signum(w(1) - w(0))
    }.toArray
    diffSign.sliding(2).count(w => w.length == 2 && w(1) != w(0))
  }

  /** argmax / argmin change point for the heuristic modes
    * (`auto_monotonic.py:29-35`). */
  def peakValleyTrendChangeHeuristic(x: Array[Double],
                                     trend: String): Int =
    if (trend == "peak_heuristic") x.indexOf(x.max) else x.indexOf(x.min)

  /** Area within extreme points over total rectangular area
    * (`auto_monotonic.py:38-79`). */
  def extremePointsArea(x: Array[Double]): Double = {
    val n = x.length
    if (n <= 2) return 0.0
    val posMin = x.indexOf(x.min)
    val posMax = x.indexOf(x.max)
    val (xinit, xmin, xmax, xlast) =
      (0.0, posMin.toDouble, posMax.toDouble, n.toDouble)
    val (yinit, ymin, ymax, ylast) = (x(0), x(posMin), x(posMax), x(n - 1))
    // 0.5 * |det| of the two triangles in homogeneous coords
    def triArea(x1: Double, x2: Double, x3: Double,
                y1: Double, y2: Double, y3: Double): Double =
      0.5 * math.abs(x1 * (y2 - y3) - x2 * (y1 - y3) + x3 * (y1 - y2))
    val area1 = triArea(xinit, xmin, xmax, yinit, ymin, ymax)
    val area2 = triArea(xmin, xmax, xlast, ymin, ymax, ylast)
    (area1 + area2) / ((ymax - ymin) * n)
  }

  /** Convex hull area (Andrew's monotone chain + shoelace) of the
    * (index, rate) point set; mirrors scipy ConvexHull.volume in 2D, with
    * the reference's degenerate-input fallback to 0
    * (`auto_monotonic.py:118-134`). */
  def convexHullAreaRatio(x: Array[Double]): Double = {
    val n = x.length
    if (n <= 2) return 0.0
    val rect = (x.max - x.min) * n
    if (rect == 0.0) return 0.0
    val pts = Array.tabulate(n)(i => (i.toDouble, x(i)))
    def cross(o: (Double, Double), a: (Double, Double),
              b: (Double, Double)): Double =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    val sorted = pts.sortBy(p => (p._1, p._2))
    val hull = new scala.collection.mutable.ArrayBuffer[(Double, Double)]
    for (p <- sorted) {
      while (hull.length >= 2 &&
             cross(hull(hull.length - 2), hull.last, p) <= 0) {
        hull.remove(hull.length - 1)
      }
      hull += p
    }
    val lower = hull.length + 1
    for (p <- sorted.reverseIterator) {
      while (hull.length >= lower &&
             cross(hull(hull.length - 2), hull.last, p) <= 0) {
        hull.remove(hull.length - 1)
      }
      hull += p
    }
    hull.remove(hull.length - 1)
    if (hull.length < 3) return 0.0 // collinear: scipy raises -> reference 0
    var area = 0.0
    var i = 0
    while (i < hull.length) {
      val (x1, y1) = hull(i)
      val (x2, y2) = hull((i + 1) % hull.length)
      area += x1 * y2 - x2 * y1
      i += 1
    }
    math.abs(area) / 2.0 / rect
  }

  final case class TrendFeatures(
      nPrebins: Int, nTrendChanges: Int, pTrendChanges: Double,
      lrSense: Int, posMin: Int, posMax: Int,
      pRecordsMinLeft: Double, pRecordsMinRight: Double,
      pRecordsMaxLeft: Double, pRecordsMaxRight: Double,
      pArea: Double, pConvexHull: Double)

  /** Shape features of the (rate or mean) sequence
    * (`auto_monotonic.py:84-155` / `:158-230`). */
  def trendFeatures(nRecords: Array[Double],
                    rate: Array[Double]): TrendFeatures = {
    val n = rate.length
    val nChanges = nPeaksValleys(rate)
    // np.polyfit deg=1 slope, closed form
    val tMean = (n - 1) / 2.0
    val yMean = rate.sum / n
    var cov = 0.0; var varT = 0.0
    var i = 0
    while (i < n) {
      cov += (i - tMean) * (rate(i) - yMean)
      varT += (i - tMean) * (i - tMean)
      i += 1
    }
    val lrSense = if (cov / varT > 0) 1 else 0
    val posMin = rate.indexOf(rate.min)
    val posMax = rate.indexOf(rate.max)
    val total = nRecords.sum
    TrendFeatures(
      nPrebins = n,
      nTrendChanges = nChanges,
      pTrendChanges = nChanges.toDouble / n,
      lrSense = lrSense,
      posMin = posMin, posMax = posMax,
      pRecordsMinLeft = nRecords.take(posMin).sum / total,
      pRecordsMinRight = nRecords.drop(posMin + 1).sum / total,
      pRecordsMaxLeft = nRecords.take(posMax).sum / total,
      pRecordsMaxRight = nRecords.drop(posMax + 1).sum / total,
      pArea = extremePointsArea(rate),
      pConvexHull = convexHullAreaRatio(rate))
  }

  /** Trend classifier for auto / auto_heuristic
    * (`auto_monotonic.py:231-289`). */
  def autoMonotonicDecision(f: TrendFeatures): String = {
    val trend =
      if (f.pArea <= 0.22145836800336838) {
        if (f.lrSense == 0) {
          if (f.pConvexHull <= 0.48331470787525177) {
            if (f.pRecordsMinRight <= 0.010740397498011589) 1
            else if (f.pRecordsMinRight <= 0.022145185619592667) 3
            else 1
          } else {
            if (f.pRecordsMaxRight <= 0.6426683664321899) 3 else 1
          }
        } else 0
      } else {
        if (f.pRecordsMinRight <= 0.06137961149215698) {
          if (f.pConvexHull <= 0.23837491869926453) 1
          else if (f.pRecordsMaxLeft <= 0.10170064494013786) {
            if (f.pRecordsMaxLeft <= 0.01817034650593996) 3 else 1
          } else 2
        } else {
          if (f.pRecordsMinLeft <= 0.05336669087409973) {
            if (f.pRecordsMaxRight <= 0.0695494469255209) 0
            else if (f.pRecordsMaxLeft <= 0.14705360680818558) 0
            else 2
          } else {
            if (f.pRecordsMinLeft <= 0.8308950066566467) 3
            else if (f.pRecordsMaxRight <= 0.1587613895535469) 3
            else 2
          }
        }
      }
    trend match {
      case 0 => "ascending"
      case 1 => "descending"
      case 2 => "peak"
      case 3 => "valley"
    }
  }

  /** Trend classifier for auto_asc_desc (`auto_monotonic.py:292-331`). */
  def autoAscDescDecision(f: TrendFeatures): String = {
    val trend =
      if (f.lrSense == 0) {
        if (f.pArea <= 0.4890555590391159) {
          if (f.pRecordsMaxRight <= 0.029244758188724518) 0 else 1
        } else {
          if (f.pConvexHull <= 0.5553120970726013) 0 else 1
        }
      } else {
        if (f.pRecordsMaxLeft <= 0.03698493912816048) 1
        else if (f.pRecordsMinLeft <= 0.7991077601909637) {
          if (f.pArea <= 0.48206718266010284) 0
          else if (f.pRecordsMaxLeft <= 0.8631451725959778) 0
          else 1
        } else {
          if (f.pTrendChanges <= 0.5277777910232544) {
            if (f.pRecordsMinLeft <= 0.8155287206172943) 1 else 0
          } else 1
        }
      }
    if (trend == 0) "ascending" else "descending"
  }

  /** Entry point for binary targets (`auto_monotonic.py:417-423`). */
  def autoMonotonic(nNonevent: Array[Double], nEvent: Array[Double],
                    autoMode: String): String = {
    val nRecords = nNonevent.zip(nEvent).map { case (a, b) => a + b }
    val rate = nEvent.zip(nRecords).map { case (e, r) => e / r }
    decide(trendFeatures(nRecords, rate), autoMode)
  }

  /** Entry point for continuous targets (`auto_monotonic.py:426-429`). */
  def autoMonotonicContinuous(nRecords: Array[Double], sums: Array[Double],
                              autoMode: String): String = {
    val mean = sums.zip(nRecords).map { case (s, r) => s / r }
    decide(trendFeatures(nRecords, mean), autoMode)
  }

  private def decide(f: TrendFeatures, autoMode: String): String =
    autoMode match {
      case "auto" | "auto_heuristic" => autoMonotonicDecision(f)
      case "auto_asc_desc"           => autoAscDescDecision(f)
      case other =>
        throw new IllegalArgumentException(s"bad auto mode: $other")
    }

  private def isPeak(x: Array[Double]): Boolean = {
    val t = x.indexOf(x.max)
    val asc = (1 to t).forall(i => x(i) - x(i - 1) >= 0)
    val desc = (t + 1 until x.length).forall(i => x(i) - x(i - 1) <= 0)
    asc && desc
  }

  private def isValley(x: Array[Double]): Boolean = {
    val t = x.indexOf(x.min)
    val desc = (1 to t).forall(i => x(i) - x(i - 1) <= 0)
    val asc = (t + 1 until x.length).forall(i => x(i) - x(i - 1) >= 0)
    asc && desc
  }

  private def isConvex(x: Array[Double]): Boolean =
    (1 until x.length - 1).forall(i => x(i + 1) - 2 * x(i) + x(i - 1) >= 0)

  private def isConcave(x: Array[Double]): Boolean =
    (1 until x.length - 1).forall(i => -x(i + 1) + 2 * x(i) - x(i - 1) >= 0)

  /** Classify a final event-rate sequence (`auto_monotonic.py:432-463`). */
  def typeOfMonotonicTrend(x: Array[Double]): String = {
    if (x.length == 1) return "undefined"
    if (nPeaksValleys(x) >= 1) {
      if (isPeak(x)) { if (isConcave(x)) "peak (concave)" else "peak" }
      else if (isValley(x)) {
        if (isConvex(x)) "valley (convex)" else "valley"
      } else "no monotonic"
    } else {
      if ((1 until x.length).forall(i => x(i) - x(i - 1) >= 0)) "ascending"
      else "descending"
    }
  }
}
