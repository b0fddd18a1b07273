package graft.core

import scala.collection.mutable

/** Driver-side optimal-binning solver. Replaces the reference's OR-Tools
  * CP-SAT / MIP formulations (`optbinning/binning/cp.py`,
  * `optbinning/binning/mip.py`) with an exact interval-partition dynamic
  * program over the <=max_n_prebins prebin aggregate. The CP model's
  * x[i,j] structure ("bin ending at prebin i starts at prebin j",
  * `cp.py:75-82`) is exactly the DP state space; all constraints are
  * per-candidate-bin or adjacent-pair checks, so the DP is optimal for
  * trends none/ascending/descending/peak_heuristic/valley_heuristic
  * (pairwise monotonicity over a totally ordered scalar reduces to
  * adjacent pairs). Free peak/valley solve the heuristic DP for every
  * change point (mirrors the CP auxiliary change-point variable `t`,
  * `cp.py:141-148`). Concave/convex and max_pvalue_policy="all" require
  * non-adjacent pair/triple constraints and use a DFS enumeration with
  * identical semantics (`cp.py:433-459`: all-triples midpoint condition).
  */
object Solver {

  final case class Constraints(
      minNBins: Option[Int] = None,
      maxNBins: Option[Int] = None,
      minBinSize: Option[Long] = None,      // absolute weighted records
      maxBinSize: Option[Long] = None,
      minBinNEvent: Option[Long] = None,
      maxBinNEvent: Option[Long] = None,
      minBinNNonevent: Option[Long] = None,
      maxBinNNonevent: Option[Long] = None,
      userSplitsFixed: Option[Array[Boolean]] = None, // length n-1
      /** Scaled bin-size-spread regularization: objective loses
        * gammaReg * (max bin size - min bin size), with gammaReg =
        * ceil(M * gamma / total_records) like `cp.py:69-78`. Couples all
        * bins globally, so gamma > 0 routes to the DFS enumeration. */
      gammaReg: Long = 0L,
      /** Apply the reference CP's ascending/descending dominance
        * preprocessing (`cp.py:404-431`): ban singleton prebins whose
        * local pair violates the trend direction. The cut is part of the
        * reference's observable behavior (it can even force INFEASIBLE
        * against fixed splits), so the binary fit opts in whenever
        * min_event_rate_diff == 0, matching `cp.py`'s guard. */
      monoPreprocess: Boolean = false,
      timeLimitMs: Long = 100000L)

  final case class Result(status: String, solution: Array[Boolean],
                          objective: Long)

  /** Solve the generalized bin-merge problem.
    *
    * @param n number of prebins
    * @param d D(i)(j): scaled rate/mean of candidate bin j..i (monotonicity)
    * @param v V(i)(j): scaled objective contribution of candidate bin j..i
    * @param nRecords per-prebin weighted record counts
    * @param nEvent / nNonevent per-prebin counts (binary; empty arrays for
    *        continuous where event-count constraints do not apply)
    * @param trend one of null/"ascending"/"descending"/"concave"/"convex"/
    *        "peak"/"valley"/"peak_heuristic"/"valley_heuristic"
    * @param trendChange fixed change point for the heuristic modes
    * @param adjacentViolations adjacent candidate pairs that may not both be
    *        selected (p-value consecutive + min-diff)
    * @param allViolations non-adjacent pairs (p-value policy "all")
    */
  def solve(n: Int,
            d: Array[Array[Long]],
            v: Array[Array[Long]],
            nRecords: Array[Long],
            nEvent: Array[Long],
            nNonevent: Array[Long],
            trend: Option[String],
            trendChange: Int,
            cons: Constraints,
            adjacentViolations: Array[((Int, Int), (Int, Int))],
            allViolations: Array[((Int, Int), (Int, Int))]): Result = {

    val deadline = System.nanoTime() + cons.timeLimitMs * 1000000L

    // prefix sums for O(1) candidate-bin stats
    val cumRec = prefix(nRecords)
    val cumEv = if (nEvent.nonEmpty) prefix(nEvent) else null
    val cumNe = if (nNonevent.nonEmpty) prefix(nNonevent) else null

    val fixed = cons.userSplitsFixed.getOrElse(Array.fill(math.max(n - 1, 0))(false))
    // Fixed split i forces x[i, i] == 1 in the reference CP
    // (`cp.py:580-584`): the prebin ENDING at that split is a bin on its
    // own. Any bin containing a fixed prebin i must be the singleton
    // (i, i).
    def violatesFixed(s: Int, e: Int): Boolean = {
      var i = s
      val hi = math.min(e, fixed.length - 1)
      while (i <= hi) {
        if (fixed(i) && (s != i || e != i)) return true
        i += 1
      }
      false
    }

    def binFeasible(s: Int, e: Int): Boolean = {
      if (violatesFixed(s, e)) return false
      val size = cumRec(e + 1) - cumRec(s)
      if (cons.minBinSize.exists(size < _)) return false
      if (cons.maxBinSize.exists(size > _)) return false
      if (cumEv != null) {
        val ev = cumEv(e + 1) - cumEv(s)
        if (cons.minBinNEvent.exists(ev < _)) return false
        if (cons.maxBinNEvent.exists(ev > _)) return false
      }
      if (cumNe != null) {
        val ne = cumNe(e + 1) - cumNe(s)
        if (cons.minBinNNonevent.exists(ne < _)) return false
        if (cons.maxBinNNonevent.exists(ne > _)) return false
      }
      true
    }

    val adjViol = new mutable.HashSet[Long]
    adjacentViolations.foreach { case ((i, r), (j, k)) =>
      adjViol += pack(i, r, j, k)
    }

    val binFeasibleFinal: (Int, Int) => Boolean =
      if (cons.monoPreprocess &&
          (trend.contains("ascending") || trend.contains("descending"))) {
        val banned = singletonBans(n, d, trend.contains("ascending"))
        (s, e) => !(s == e && banned(s)) && binFeasible(s, e)
      } else binFeasible

    def binRecords(s: Int, e: Int): Long = cumRec(e + 1) - cumRec(s)
    val needDfs = allViolations.nonEmpty || cons.gammaReg > 0

    trend match {
      case Some("concave") | Some("convex") =>
        dfsSolve(n, d, v, trend.get, 0, binFeasibleFinal, binRecords,
                 adjViol, allViolations, cons, deadline)
      case Some("peak") | Some("valley") =>
        val h = if (trend.contains("peak")) "peak_heuristic"
                else "valley_heuristic"
        if (needDfs)
          bestOverChangePointsBy(n, deadline, tc =>
            dfsSolve(n, d, v, h, tc, binFeasibleFinal, binRecords, adjViol,
                     allViolations, cons, deadline))
        else
          bestOverChangePoints(n, d, v, h, binFeasibleFinal, adjViol, cons,
                               deadline)
      case _ if needDfs =>
        dfsSolve(n, d, v, trend.orNull, trendChange, binFeasibleFinal,
                 binRecords, adjViol, allViolations, cons, deadline)
      case _ =>
        dpSolve(n, d, v, trend.orNull, trendChange, binFeasibleFinal,
                adjViol, cons)
    }
  }

  /** Multiclass variant (`multiclass_cp.py`): shared bin structure,
    * objective = sum of per-class scaled divergences, independent
    * monotonicity constraint per class. Same DP; the transition check
    * quantifies over classes.
    */
  def solveMulti(n: Int,
                 d: Array[Array[Array[Long]]],     // per class
                 v: Array[Array[Array[Long]]],     // per class
                 nRecords: Array[Long],
                 trends: Array[Option[String]],
                 trendChanges: Array[Int],
                 cons: Constraints,
                 adjacentViolations: Array[((Int, Int), (Int, Int))])
      : Result = {
    val nClasses = d.length
    // fail fast on trends the pairwise transition check cannot express:
    // monoOk's default branch would silently skip an unsupported trend,
    // and a *_heuristic trend without a resolved change point (-1)
    // degenerates to pure descending/ascending
    trends.zipWithIndex.foreach { case (t, c) =>
      t.foreach {
        case "ascending" | "descending" => ()
        case h @ ("peak_heuristic" | "valley_heuristic") =>
          require(trendChanges(c) >= 0,
            s"$h for class $c needs a resolved trend change point; " +
            "compute it with AutoMonotonic.peakValleyTrendChangeHeuristic")
        case other => throw new IllegalArgumentException(
          s"per-class monotonic trend $other is not supported by the " +
          "shared-bin solver (allowed: ascending, descending, " +
          "peak_heuristic, valley_heuristic with a change point); " +
          "concave/convex need the single-variable solver")
      }
    }
    val cumRec = prefix(nRecords)
    val fixed =
      cons.userSplitsFixed.getOrElse(Array.fill(math.max(n - 1, 0))(false))

    def binFeasible(s: Int, e: Int): Boolean = {
      // singleton fixed-prebin rule, as in `solve` (`cp.py:580-584`)
      var i = s
      val hi = math.min(e, fixed.length - 1)
      while (i <= hi) {
        if (fixed(i) && (s != i || e != i)) return false
        i += 1
      }
      val size = cumRec(e + 1) - cumRec(s)
      !(cons.minBinSize.exists(size < _) || cons.maxBinSize.exists(size > _))
    }

    val adjViol = new mutable.HashSet[Long]
    adjacentViolations.foreach { case ((i, r), (j, k)) =>
      adjViol += pack(i, r, j, k)
    }

    // summed objective; per-class monotonic check via a combined V and a
    // custom mono function — reuse dpSolve by building a synthetic "class"
    // closure
    val vSum = Array.tabulate(n) { i =>
      Array.tabulate(i + 1) { j =>
        var acc = 0L
        var c = 0
        while (c < nClasses) { acc += v(c)(i)(j); c += 1 }
        acc
      }
    }

    def monoAllOk(sA: Int, eA: Int, eB: Int): Boolean = {
      var c = 0
      while (c < nClasses) {
        trends(c) match {
          case Some(t) =>
            if (!monoOk(t, trendChanges(c), d(c), sA, eA, eB)) return false
          case None => ()
        }
        c += 1
      }
      true
    }

    dpSolveGeneric(n, vSum, monoAllOk, binFeasible, adjViol, cons)
  }

  /** Reference CP dominance preprocessing (`cp.py:404-431`): for plain
    * ascending/descending trends with min_event_rate_diff == 0, ban
    * singleton prebin i when merging it into its successor moves the
    * rate against the trend (and propagate along the run of violating
    * pairs, mirroring the reference's inner loop).
    */
  private def singletonBans(n: Int, d: Array[Array[Long]],
                            ascending: Boolean): Array[Boolean] = {
    val banned = new Array[Boolean](n)
    @inline def viol(pairEnd: Int, start: Int): Boolean =
      if (ascending) d(pairEnd)(start) > d(pairEnd)(pairEnd)
      else d(pairEnd)(start) < d(pairEnd)(pairEnd)
    var i = 0
    while (i < n - 1) {
      if (viol(i + 1, i)) {
        var j = 0
        while (j < n - i - 1) {
          if (viol(i + 1 + j, i)) banned(i + j) = true
          j += 1
        }
      }
      i += 1
    }
    banned
  }

  private def prefix(a: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + 1)
    var i = 0
    while (i < a.length) { out(i + 1) = out(i) + a(i); i += 1 }
    out
  }

  @inline private def pack(i: Int, r: Int, j: Int, k: Int): Long =
    ((i.toLong & 0xffff) << 48) | ((r.toLong & 0xffff) << 32) |
      ((j.toLong & 0xffff) << 16) | (k.toLong & 0xffff)

  /** Adjacent-pair monotonicity check between bin A=(sA..eA) and the
    * immediately following bin B=(eA+1..eB). */
  @inline private def monoOk(trend: String, tc: Int,
                             d: Array[Array[Long]],
                             sA: Int, eA: Int, eB: Int): Boolean = {
    if (trend == null) return true
    val rA = d(eA)(sA)
    val rB = d(eB)(eA + 1)
    trend match {
      case "ascending"  => rA <= rB
      case "descending" => rA >= rB
      case "peak_heuristic" =>
        // ascending among bins ending < tc, descending among bins ending
        // >= tc, free across the change point (`cp.py:498-530`)
        if (eA < tc && eB < tc) rA <= rB
        else if (eA >= tc && eB >= tc) rA >= rB
        else true
      case "valley_heuristic" =>
        if (eA < tc && eB < tc) rA >= rB
        else if (eA >= tc && eB >= tc) rA <= rB
        else true
      case _ => true
    }
  }

  /** Exact DP. States (e, s) = partition of prebins 0..e whose last bin is
    * (s..e); optional bin-count dimension when min/max n_bins set. */
  private def dpSolve(n: Int, d: Array[Array[Long]], v: Array[Array[Long]],
                      trend: String, trendChange: Int,
                      binFeasible: (Int, Int) => Boolean,
                      adjViol: mutable.HashSet[Long],
                      cons: Constraints): Result =
    dpSolveGeneric(n, v,
                   (sA, eA, eB) => monoOk(trend, trendChange, d, sA, eA, eB),
                   binFeasible, adjViol, cons)

  private def dpSolveGeneric(n: Int, v: Array[Array[Long]],
                             monoCheck: (Int, Int, Int) => Boolean,
                             binFeasible: (Int, Int) => Boolean,
                             adjViol: mutable.HashSet[Long],
                             cons: Constraints): Result = {
    val needCount = cons.minNBins.isDefined || cons.maxNBins.isDefined
    val maxB = if (needCount) math.min(cons.maxNBins.getOrElse(n), n) else 1
    val NEG = Long.MinValue / 4

    // dp(e)(s)(b-1): best objective; parent pointer for reconstruction
    val dp = Array.fill(n, n, maxB)(NEG)
    val par = Array.fill(n, n, maxB)(-1) // packed (sPrev, bPrev)

    var e = 0
    while (e < n) {
      if (binFeasible(0, e)) dp(e)(0)(0) = v(e)(0)
      e += 1
    }

    e = 0
    while (e < n - 1) {
      var s = 0
      while (s <= e) {
        var b = 0
        while (b < maxB) {
          val cur = dp(e)(s)(b)
          if (cur > NEG && (!needCount || b + 1 < maxB)) {
            val b2 = if (needCount) b + 1 else 0
            var e2 = e + 1
            while (e2 < n) {
              if (binFeasible(e + 1, e2) &&
                  monoCheck(s, e, e2) &&
                  !adjViol.contains(pack(e, s, e2, e + 1))) {
                val cand = cur + v(e2)(e + 1)
                if (cand > dp(e2)(e + 1)(b2)) {
                  dp(e2)(e + 1)(b2) = cand
                  par(e2)(e + 1)(b2) = s * maxB + b
                }
              }
              e2 += 1
            }
          }
          b += 1
        }
        s += 1
      }
      e += 1
    }

    // answer: full cover must end at prebin n-1
    var best = NEG
    var bestS = -1
    var bestB = -1
    var s = 0
    while (s < n) {
      var b = 0
      while (b < maxB) {
        val nb = b + 1
        val okCount = !needCount ||
          (cons.minNBins.forall(nb >= _) && cons.maxNBins.forall(nb <= _))
        if (okCount && dp(n - 1)(s)(b) > best) {
          best = dp(n - 1)(s)(b); bestS = s; bestB = b
        }
        b += 1
      }
      s += 1
    }

    if (bestS < 0) {
      val sol = Array.fill(n)(false)
      sol(n - 1) = true
      Result("INFEASIBLE", sol, 0L)
    } else {
      val sol = Array.fill(n)(false)
      var ce = n - 1; var cs = bestS; var cb = bestB
      while (ce >= 0) {
        sol(ce) = true
        if (cs == 0) ce = -1
        else {
          val p = par(ce)(cs)(cb)
          val pe = cs - 1
          val ps = p / maxB
          val pb = p % maxB
          ce = pe; cs = ps; cb = pb
        }
      }
      Result("OPTIMAL", sol, best)
    }
  }

  private def bestOverChangePoints(n: Int, d: Array[Array[Long]],
                                   v: Array[Array[Long]], heuristicTrend: String,
                                   binFeasible: (Int, Int) => Boolean,
                                   adjViol: mutable.HashSet[Long],
                                   cons: Constraints,
                                   deadline: Long): Result =
    bestOverChangePointsBy(n, deadline,
      tc => dpSolve(n, d, v, heuristicTrend, tc, binFeasible, adjViol, cons))

  /** Free peak/valley = best heuristic solve over every change point
    * (mirrors the CP auxiliary variable `t`, `cp.py:141-148`). */
  private def bestOverChangePointsBy(n: Int, deadline: Long,
                                     solveAt: Int => Result): Result = {
    var best: Result = null
    var tc = 0
    while (tc <= n && (best == null || System.nanoTime() < deadline)) {
      val r = solveAt(tc)
      if (r.status == "OPTIMAL" &&
          (best == null || best.status != "OPTIMAL" ||
           r.objective > best.objective)) best = r
      else if (best == null) best = r
      tc += 1
    }
    best
  }

  /** DFS over bin-end subsets for the constraint families the DP cannot
    * express: concave/convex all-triples midpoint conditions
    * (`cp.py:433-459`) and non-adjacent p-value violation pairs
    * (policy "all"). Exact for the default max_n_prebins=20; budget-guarded
    * beyond that (returns best found with status FEASIBLE on timeout).
    */
  private def dfsSolve(n: Int, d: Array[Array[Long]], v: Array[Array[Long]],
                       trend: String, trendChange: Int,
                       binFeasible: (Int, Int) => Boolean,
                       binRecords: (Int, Int) => Long,
                       adjViol: mutable.HashSet[Long],
                       allViolations: Array[((Int, Int), (Int, Int))],
                       cons: Constraints, deadline: Long): Result = {
    val allViol = new mutable.HashSet[Long]
    allViolations.foreach { case ((i, r), (j, k)) =>
      allViol += pack(i, r, j, k)
    }
    var bestObj = Long.MinValue
    var bestBins: List[(Int, Int)] = null
    var timedOut = false

    val bins = new mutable.ArrayBuffer[(Int, Int)] // (start, end)
    val rates = new mutable.ArrayBuffer[Long]

    def violatesTriples(newRate: Long): Boolean = {
      // concavity: for all a<b<new: r_a + r_new <= 2 r_b  (convex mirrored)
      val m = rates.length
      var b = 0
      while (b < m) {
        var a = 0
        while (a < b) {
          if (trend == "concave" && rates(a) + newRate > 2 * rates(b))
            return true
          if (trend == "convex" && rates(a) + newRate < 2 * rates(b))
            return true
          a += 1
        }
        b += 1
      }
      false
    }

    def violatesPairs(s: Int, e: Int): Boolean = {
      var i = 0
      while (i < bins.length) {
        val (ps, pe) = bins(i)
        if (allViol.contains(pack(pe, ps, e, s))) return true
        i += 1
      }
      if (bins.nonEmpty) {
        val (ps, pe) = bins.last
        if (pe == s - 1 && adjViol.contains(pack(pe, ps, e, s))) return true
      }
      false
    }

    def monoPairOk(e: Int): Boolean =
      bins.isEmpty || {
        val (ps, pe) = bins.last
        monoOk(trend, trendChange, d, ps, pe, e)
      }

    def rec(start: Int, obj: Long): Unit = {
      if (System.nanoTime() > deadline) { timedOut = true; return }
      if (start == n) {
        val nb = bins.length
        val okCount = cons.minNBins.forall(nb >= _) &&
          cons.maxNBins.forall(nb <= _)
        var effObj = obj
        if (cons.gammaReg > 0) {
          // gamma regularization: penalize bin-size spread (`cp.py:69-78`)
          var mn = Long.MaxValue
          var mx = Long.MinValue
          bins.foreach { case (s, e) =>
            val sz = binRecords(s, e)
            if (sz < mn) mn = sz
            if (sz > mx) mx = sz
          }
          effObj -= cons.gammaReg * (mx - mn)
        }
        if (okCount && effObj > bestObj) {
          bestObj = effObj
          bestBins = bins.toList
        }
        return
      }
      var e = start
      while (e < n && !timedOut) {
        if (binFeasible(start, e)) {
          val rate = d(e)(start)
          val trendOk =
            if (trend == "concave" || trend == "convex")
              !violatesTriples(rate)
            else monoPairOk(e)
          if (trendOk && !violatesPairs(start, e)) {
            bins += ((start, e))
            rates += rate
            rec(e + 1, obj + v(e)(start))
            bins.remove(bins.length - 1)
            rates.remove(rates.length - 1)
          }
        }
        e += 1
      }
    }

    rec(0, 0L)

    if (bestBins == null) {
      val sol = Array.fill(n)(false)
      sol(n - 1) = true
      Result(if (timedOut) "UNKNOWN" else "INFEASIBLE", sol, 0L)
    } else {
      val sol = Array.fill(n)(false)
      bestBins.foreach { case (_, e) => sol(e) = true }
      Result(if (timedOut) "FEASIBLE" else "OPTIMAL", sol, bestObj)
    }
  }
}
