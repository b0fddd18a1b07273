package graft.operators

import scala.collection.mutable

/** Counterfactual explanations on a scorecard
  * (`optbinning/scorecard/counterfactual/counterfactual.py:201`): find
  * per-feature bin changes moving an instance's predicted probability
  * across a target, optimizing the reference's objectives
  * (`counterfactual/mip.py:338-348`):
  *
  *  - proximity: range-normalized absolute WoE distance
  *    `sum_i |woe'_i - woe_i| / (max_i - min_i)`
  *    (`problem_data.py:35-46` inverse-range weights)
  *  - closeness: l1 Mahalanobis distance of the counterfactual WoE
  *    vector from the training mean, via the Cholesky factor of the
  *    inverse covariance (`problem_data.py:52-55`, `mip.py:273-277`)
  *
  * combined per `method`: "weighted" minimizes the weighted sum
  * (default weights 1/1), "hierarchical" minimizes objectives in
  * priority order (default 2/1 ranks proximity first) — mirroring
  * `counterfactual.py:427-433`. The reference solves a MIP; the search
  * space is (features x bins) with <= maxChanges active changes, so the
  * driver enumerates change subsets with branch-and-bound pruning on
  * the additive proximity term (exact for the reference's default
  * problem sizes; no MIP dependency). Diversity across multiple
  * counterfactuals via hard exclusion of previously used
  * (feature, bin) assignments (`multi_mip.py` diversity constraints).
  */
object Counterfactual {

  final case class CFResult(changes: Map[String, Int], // variable -> bin id
                            probability: Double,
                            nChanges: Int,
                            totalAbsWoeShift: Double,
                            objectives: Map[String, Double] = Map.empty)

  /** @param instanceBins current bin index per selected variable
    *        (from `fits(v).transform(..., "indices")` on the instance row)
    * @param outcomeGe target: predicted probability >= (true) or <= this
    * @param actionableFeatures restrict changes to these variables
    *        (`counterfactual.py:106-118`); None = all selected variables
    * @param method "weighted" | "hierarchical"
    * @param objectives objective -> weight; None = reference defaults
    */
  /** @param outcomeRange hard probability window for the counterfactual
    *        ("min_outcome"/"max_outcome" hard constraints,
    *        `counterfactual.py:30-40`); overrides the Ge/Le rule
    * @param softDiffOutcome weight of the "diff_outcome" soft term
    *        (`mip.py:346-348`): penalizes |probability - target|
    */
  def generate(scorecard: FittedScorecard,
               instanceBins: Map[String, Int],
               targetProbability: Double,
               outcomeGe: Boolean,
               maxChanges: Int = 3,
               nCounterfactuals: Int = 1,
               actionableFeatures: Option[Set[String]] = None,
               method: String = "weighted",
               objectives: Option[Map[String, Double]] = None,
               outcomeRange: Option[(Double, Double)] = None,
               softDiffOutcome: Double = 0.0)
      : Seq[CFResult] = {
    require(method == "weighted" || method == "hierarchical",
            s"method $method not supported")
    val objWeights: Map[String, Double] = objectives.getOrElse(
      if (method == "weighted") Map("proximity" -> 1.0, "closeness" -> 1.0)
      else Map("proximity" -> 2.0, "closeness" -> 1.0))
    require(objWeights.keySet.subsetOf(Set("proximity", "closeness")),
            s"objectives must be proximity/closeness: ${objWeights.keySet}")

    val vars = scorecard.selected
    val nVars = vars.length
    val actionable: Int => Boolean = actionableFeatures match {
      case Some(fs) =>
        val mask = vars.map(fs.contains)
        i => mask(i)
      case None => _ => true
    }
    val coefs = scorecard.coefficients
    // per-variable candidate WoE per DATA bin (special/missing excluded
    // as actionable targets)
    val woeByVar: Array[Array[Double]] = vars.map { v =>
      val f = scorecard.process.fits(v)
      f.table.woe.take(f.nDataBins)
    }
    // inverse-range proximity weights (`problem_data.py:46`)
    val wRange: Array[Double] = woeByVar.map { w =>
      val r = w.max - w.min
      if (r > 0) 1.0 / r else 0.0
    }
    val curWoe: Array[Double] =
      vars.indices.map(i => woeByVar(i)(instanceBins(vars(i)))).toArray
    val baseLinear = vars.indices.map(i => curWoe(i) * coefs(i)).sum +
      scorecard.estimatorIntercept

    def proba(linear: Double): Double = 1.0 / (1.0 + math.exp(-linear))
    def satisfied(p: Double): Boolean = outcomeRange match {
      case Some((lo, hi)) => p >= lo && p <= hi
      case None =>
        if (outcomeGe) p >= targetProbability else p <= targetProbability
    }

    val useCloseness = objWeights.contains("closeness") &&
      scorecard.woeStats.isDefined
    def closenessOf(woe: Array[Double]): Double = scorecard.woeStats match {
      case Some((mu, f)) if useCloseness =>
        // l1 norm of F^T (x' - mu), F lower triangular
        var s = 0.0
        var i = 0
        while (i < nVars) {
          var acc = 0.0
          var j = i
          while (j < nVars) { acc += f(j)(i) * (woe(j) - mu(j)); j += 1 }
          s += math.abs(acc)
          i += 1
        }
        s
      case _ => 0.0
    }

    // objective vector ordered by weight descending (hierarchical order)
    val orderedNames = objWeights.toSeq.sortBy(-_._2).map(_._1)
    def scoreOf(objs: Map[String, Double]): Either[Seq[Double], Double] =
      if (method == "hierarchical") Left(orderedNames.map(objs))
      else Right(objWeights.map { case (k, w) => w * objs(k) }.sum)
    def better(a: Either[Seq[Double], Double],
               b: Either[Seq[Double], Double]): Boolean = (a, b) match {
      case (Right(x), Right(y)) => x < y - 1e-15
      case (Left(x), Left(y)) =>
        x.zip(y).find { case (p, q) => math.abs(p - q) > 1e-12 }
          .exists { case (p, q) => p < q }
      case _ => false
    }

    val results = mutable.ArrayBuffer.empty[CFResult]
    val banned = mutable.Set.empty[(Int, Int)] // diversity exclusions

    for (_ <- 0 until nCounterfactuals) {
      var best: CFResult = null
      var bestScore: Either[Seq[Double], Double] = null
      // proximity accumulates per change, so it admits pruning when it
      // is the weighted floor / the top-priority objective
      val proxPrunable = method == "weighted" || orderedNames.head == "proximity"
      val proxW =
        if (method == "weighted") objWeights.getOrElse("proximity", 0.0)
        else 1.0

      def consider(changes: List[(Int, Int)], linear: Double,
                   shift: Double, prox: Double): Unit = {
        if (!satisfied(proba(linear))) return
        val woe = curWoe.clone
        changes.foreach { case (i, b) => woe(i) = woeByVar(i)(b) }
        val objs = Map(
          "proximity" -> prox,
          "closeness" -> closenessOf(woe)).filter {
          case (k, _) => objWeights.contains(k)
        }.withDefaultValue(0.0)
        val cand = CFResult(
          changes.map { case (i, b) => vars(i) -> b }.toMap,
          proba(linear), changes.length, shift,
          objs.filter { case (k, _) => objWeights.contains(k) })
        val diffOut = softDiffOutcome *
          math.abs(proba(linear) - targetProbability)
        val sc = scoreOf(Map("proximity" -> objs("proximity"),
                             "closeness" -> objs("closeness"))) match {
          case Right(v) => Right(v + diffOut)
          case Left(vs) => Left(vs :+ diffOut) // lowest priority
        }
        val tieBreak = best != null && !better(sc, bestScore) &&
          !better(bestScore, sc) &&
          (cand.nChanges < best.nChanges ||
           (cand.nChanges == best.nChanges &&
            cand.totalAbsWoeShift < best.totalAbsWoeShift))
        if (best == null || better(sc, bestScore) || tieBreak) {
          best = cand; bestScore = sc
        }
      }

      def rec(varIdx: Int, changes: List[(Int, Int)], linear: Double,
              shift: Double, prox: Double): Unit = {
        consider(changes, linear, shift, prox)
        if (varIdx >= nVars || changes.length >= maxChanges) return
        // prune on the additive proximity floor
        if (best != null && proxPrunable) {
          val floor =
            if (method == "weighted") Right(proxW * prox)
            else Left(prox +: orderedNames.tail.map(_ => 0.0))
          if (!better(floor, bestScore) &&
              better(bestScore, floor)) return
        }
        // skip this variable
        rec(varIdx + 1, changes, linear, shift, prox)
        if (!actionable(varIdx)) return
        // or change it to any other bin
        val cur = instanceBins(vars(varIdx))
        val curContrib = woeByVar(varIdx)(cur) * coefs(varIdx)
        woeByVar(varIdx).indices.foreach { b =>
          if (b != cur && !banned((varIdx, b))) {
            val dWoe = woeByVar(varIdx)(b) - woeByVar(varIdx)(cur)
            val delta = woeByVar(varIdx)(b) * coefs(varIdx) - curContrib
            rec(varIdx + 1, (varIdx, b) :: changes, linear + delta,
                shift + math.abs(delta),
                prox + wRange(varIdx) * math.abs(dWoe))
          }
        }
      }
      rec(0, Nil, baseLinear, 0.0, 0.0)
      if (best != null) {
        results += best
        best.changes.foreach { case (v, b) =>
          banned += ((vars.indexOf(v), b))
        }
      }
    }
    results.toSeq
  }
}
