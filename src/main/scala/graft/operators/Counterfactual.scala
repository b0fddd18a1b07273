package graft.operators

import scala.collection.mutable

/** Counterfactual explanations on a scorecard
  * (`optbinning/scorecard/counterfactual/counterfactual.py:201`): find
  * minimal per-feature bin changes moving an instance's predicted
  * probability across a target. The reference solves a MIP
  * (`counterfactual/mip.py`); the search space is (features x bins) with
  * <= maxChanges active changes, so the driver enumerates change subsets
  * with branch-and-bound pruning (exact for the reference's default
  * problem sizes; no MIP dependency). Diversity across multiple
  * counterfactuals via hard exclusion of previously used (feature, bin)
  * assignments (`multi_mip.py` diversity constraints).
  */
object Counterfactual {

  final case class CFResult(changes: Map[String, Int], // variable -> bin id
                            probability: Double,
                            nChanges: Int,
                            totalAbsWoeShift: Double)

  /** @param instanceBins current bin index per selected variable
    *        (from `fits(v).transform(..., "indices")` on the instance row)
    * @param outcomeGe target: predicted probability >= (true) or <= this
    */
  /** @param actionableFeatures restrict changes to these variables
    *        (`counterfactual.py:106-118`); None = all selected variables
    */
  def generate(scorecard: FittedScorecard,
               instanceBins: Map[String, Int],
               targetProbability: Double,
               outcomeGe: Boolean,
               maxChanges: Int = 3,
               nCounterfactuals: Int = 1,
               actionableFeatures: Option[Set[String]] = None)
      : Seq[CFResult] = {
    val vars = scorecard.selected
    val actionable: Int => Boolean = actionableFeatures match {
      case Some(fs) =>
        val mask = vars.map(fs.contains)
        i => mask(i)
      case None => _ => true
    }
    val coefs = scorecard.coefficients
    // per-variable candidate WoE per DATA bin (special/missing excluded as
    // actionable targets)
    val woeByVar: Array[Array[Double]] = vars.map { v =>
      val f = scorecard.process.fits(v)
      f.table.woe.take(f.nDataBins)
    }
    val baseLinear = vars.indices.map { i =>
      woeByVar(i)(instanceBins(vars(i))) * coefs(i)
    }.sum + scorecard.estimatorIntercept

    def proba(linear: Double): Double = 1.0 / (1.0 + math.exp(-linear))

    def satisfied(p: Double): Boolean =
      if (outcomeGe) p >= targetProbability else p <= targetProbability

    val results = mutable.ArrayBuffer.empty[CFResult]
    val banned = mutable.Set.empty[(Int, Int)] // diversity exclusions

    for (_ <- 0 until nCounterfactuals) {
      var best: CFResult = null
      // B&B over change subsets, ordered by (nChanges, woe shift)
      def rec(varIdx: Int, changes: List[(Int, Int)], linear: Double,
              shift: Double): Unit = {
        if (best != null && changes.length > best.nChanges) return
        if (satisfied(proba(linear))) {
          val cand = CFResult(
            changes.map { case (i, b) => vars(i) -> b }.toMap,
            proba(linear), changes.length, shift)
          if (best == null || cand.nChanges < best.nChanges ||
              (cand.nChanges == best.nChanges &&
               cand.totalAbsWoeShift < best.totalAbsWoeShift)) best = cand
          return
        }
        if (varIdx >= vars.length || changes.length >= maxChanges) return
        // skip this variable
        rec(varIdx + 1, changes, linear, shift)
        if (!actionable(varIdx)) return
        // or change it to any other bin
        val cur = instanceBins(vars(varIdx))
        val curContrib = woeByVar(varIdx)(cur) * coefs(varIdx)
        woeByVar(varIdx).indices.foreach { b =>
          if (b != cur && !banned((varIdx, b))) {
            val delta = woeByVar(varIdx)(b) * coefs(varIdx) - curContrib
            rec(varIdx + 1, (varIdx, b) :: changes, linear + delta,
                shift + math.abs(delta))
          }
        }
      }
      rec(0, Nil, baseLinear, 0.0)
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
