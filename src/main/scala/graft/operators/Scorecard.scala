package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Credit scorecard (`optbinning/scorecard/scorecard.py:177`): binning
  * process -> WoE transform -> linear estimator -> per-bin points with
  * pdo/odds or min/max scaling. Spark-native: the estimator is
  * `spark.ml` LogisticRegression/LinearRegression over the assembled WoE
  * vector (one extra narrow projection), and scoring is a generated
  * points-CASE column per variable summed row-wise — single stage, no
  * shuffle, no model object needed at score time.
  */
object Scorecard {

  final case class ScalingConfig(
      method: Option[String] = None,            // "pdo_odds" | "min_max"
      pdo: Double = 20, odds: Double = 50, scorecardPoints: Double = 600,
      min: Double = 300, max: Double = 850,
      reverseScorecard: Boolean = false,
      interceptBased: Boolean = false,
      rounding: Boolean = false)

  final case class PointsRow(variable: String, binId: Int, bin: String,
                             count: Double, eventRate: Double, woe: Double,
                             coefficient: Double, points: Double)

  def fit(df: DataFrame, variables: Seq[String], yCol: String,
          binningConfig: BinningConfig = BinningConfig(),
          selection: BinningProcess.Selection = BinningProcess.Selection(),
      scaling: ScalingConfig = ScalingConfig(),
      target: String = "binary",
      regParam: Double = 0.0,
      elasticNetParam: Double = 0.0): FittedScorecard = {

    val process = BinningProcess.fit(df, variables, yCol,
                                     targetType = "binary",
                                     config = binningConfig,
                                     selection = selection)
    val selected = process.selectedVariables.toSeq
    require(selected.nonEmpty, "no variables survive selection criteria")

    // WoE design matrix (one generated CASE per variable; single stage).
    // WoE is piecewise-constant in the bin index, so the matrix collapses
    // to one weighted row per (bin combination, label): the estimator
    // optimizes an identical weighted objective over <= prod(n_bins) rows
    // instead of scanning every input row per L-BFGS iteration. One
    // aggregate pass over the data, then driver-sized iterations — the
    // row count is bounded by the bin-combination count, not data scale.
    val xt = process.transform(df, metric = "woe", keepCols = Seq(yCol))
    val assembler = new VectorAssembler()
      .setInputCols(selected.toArray).setOutputCol("features")
    val nCombos = selected
      .map(v => process.fits(v).table.rows.length.toDouble)
      .product * 2
    val compact =
      if (nCombos <= 1e5)
        xt.groupBy(selected.map(col) :+ col(yCol): _*)
          .agg(count(lit(1)).cast("double").as("w"))
          .coalesce(1)
      else xt.withColumn("w", lit(1.0))
    val assembled = assembler.transform(compact)
      .select(col("features"), col(yCol).cast("double").as("label"),
              col("w"))
      .persist()

    // WoE mean + Cholesky whitening factor of inv(cov) over the SAME
    // compact aggregate (weights = multiplicities, so this equals the
    // reference's row-level np.cov/chol on the transformed matrix,
    // `counterfactual/problem_data.py:52-55`) — feeds the counterfactual
    // "closeness" (Mahalanobis) objective. None when degenerate.
    val woeStats: Option[(Array[Double], Array[Array[Double]])] =
      if (nCombos > 1e5) None
      else try {
        val rows = compact.collect()
        val p = selected.size
        val wTot = rows.map(_.getDouble(p + 1)).sum
        val mu = new Array[Double](p)
        rows.foreach { r =>
          val w = r.getDouble(p + 1)
          (0 until p).foreach(i => mu(i) += w * r.getDouble(i))
        }
        (0 until p).foreach(i => mu(i) /= wTot)
        val cov = breeze.linalg.DenseMatrix.zeros[Double](p, p)
        rows.foreach { r =>
          val w = r.getDouble(p + 1)
          val d = (0 until p).map(i => r.getDouble(i) - mu(i))
          for (i <- 0 until p; j <- 0 until p)
            cov(i, j) += w * d(i) * d(j)
        }
        cov :/= (wTot - 1.0)
        (0 until p).foreach(i => cov(i, i) += 1e-12)
        val f = breeze.linalg.cholesky(breeze.linalg.inv(cov))
        Some((mu, Array.tabulate(p, p)((i, j) => f(i, j))))
      } catch { case _: Exception => None }

    val (coefs, intercept) = try {
      target match {
        case "binary" =>
          // tol 1e-4 matches the reference estimator default
          // (sklearn LogisticRegression)
          val lr = new LogisticRegression()
            .setRegParam(regParam).setElasticNetParam(elasticNetParam)
            .setStandardization(false).setTol(1e-4).setWeightCol("w")
          val m = lr.fit(assembled)
          (m.coefficients.toArray, m.intercept)
        case "continuous" =>
          val lr = new LinearRegression()
            .setRegParam(regParam).setElasticNetParam(elasticNetParam)
            .setStandardization(false).setWeightCol("w")
          val m = lr.fit(assembled)
          (m.coefficients.toArray, m.intercept)
      }
    } finally assembled.unpersist()

    // points = woe * coef per bin (`scorecard.py:639-664`)
    val n = selected.size
    var rows: Seq[PointsRow] = selected.zipWithIndex.flatMap {
      case (v, i) =>
        val f = process.fits(v)
        val c = coefs(i)
        f.table.rows.zipWithIndex.map { case (r, binId) =>
          PointsRow(v, binId, r.bin, r.count, r.eventRate, r.woe, c,
                    r.woe * c)
        }
    }

    // scaling (`scorecard.py:121-156`)
    val sense = if (scaling.reverseScorecard) -1.0 else 1.0
    rows = scaling.method match {
      case Some("pdo_odds") =>
        val factor = scaling.pdo / math.log(2)
        val offset = scaling.scorecardPoints -
          factor * math.log(scaling.odds)
        rows.map(r => r.copy(points =
          -(sense * r.points + intercept / n) * factor + offset / n))
      case Some("min_max") =>
        val byVar = rows.groupBy(_.variable)
        val minP = byVar.values.map(_.map(_.points).min).sum
        val maxP = byVar.values.map(_.map(_.points).max).sum
        val smin = intercept + minP
        val smax = intercept + maxP
        val slope = sense * (scaling.min - scaling.max) / (smax - smin)
        val shift =
          if (scaling.reverseScorecard) scaling.min - slope * smin
          else scaling.max - slope * smin
        val basePoints = shift + slope * intercept
        rows.map(r => r.copy(points = basePoints / n + slope * r.points))
      case _ => rows
    }

    // intercept-based shift (`scorecard.py:159-174`)
    var interceptOut = 0.0
    if (scaling.interceptBased) {
      val mins = rows.groupBy(_.variable).map { case (v, rs) =>
        v -> rs.map(_.points).min
      }
      interceptOut = mins.values.sum
      rows = rows.map(r => r.copy(points = r.points - mins(r.variable)))
    }

    if (scaling.rounding) {
      rows =
        if (scaling.method.isDefined) roundMinMaxPreserving(rows)
        else rows.map(r => r.copy(points = math.rint(r.points)))
      interceptOut = math.rint(interceptOut)
    }

    new FittedScorecard(process, selected.toArray, coefs, intercept,
                        rows.toArray, interceptOut, scaling, woeStats)
  }

  /** Integer rounding preserving the exact total min/max score
    * (`scorecard/rounding.py:13-110`). The reference solves a CBC MIP:
    * minimize the L1 distortion sum |p - points| over integer p subject
    * to sum of per-variable minima == rint(total min) and sum of maxima
    * == rint(total max). Each optimal p is the floor or ceil of its real
    * value, so the exact optimum is: enumerate floor/ceil per bin within
    * each variable, keep the Pareto-minimal cost per attained
    * (min, max) pair, then a DP across variables over the (sum-of-mins,
    * sum-of-maxs) offsets. Falls back to nearest rounding if no
    * assignment hits the targets (cannot happen for min_max/pdo_odds
    * scaled tables, whose real sums are the targets).
    */
  private[graft] def roundMinMaxPreserving(
      rows: Seq[PointsRow]): Seq[PointsRow] = {
    val vars = rows.map(_.variable).distinct
    val byVar = vars.map(v => v -> rows.filter(_.variable == v)).toMap
    val minPoint = math.rint(vars.map(v => byVar(v).map(_.points).min).sum)
    val maxPoint = math.rint(vars.map(v => byVar(v).map(_.points).max).sum)

    // per variable: (min, max) -> (cost, per-bin points)
    val candsByVar: Seq[Map[(Long, Long), (Double, Array[Double])]] =
      vars.map { v =>
        val ps = byVar(v).map(_.points).toArray
        val nBins = ps.length
        require(nBins <= 20, s"rounding enumeration cap exceeded: $nBins")
        val best =
          scala.collection.mutable.HashMap
            .empty[(Long, Long), (Double, Array[Double])]
        (0 until (1 << nBins)).foreach { mask =>
          val p = new Array[Double](nBins)
          var cost = 0.0
          var i = 0
          while (i < nBins) {
            p(i) = if ((mask & (1 << i)) != 0) math.ceil(ps(i))
                   else math.floor(ps(i))
            cost += math.abs(p(i) - ps(i))
            i += 1
          }
          val key = (p.min.toLong, p.max.toLong)
          if (!best.contains(key) || cost < best(key)._1)
            best(key) = (cost, p)
        }
        best.toMap
      }

    // DP across variables on (sum of mins, sum of maxs)
    var states = Map((0L, 0L) -> (0.0, List.empty[Array[Double]]))
    candsByVar.foreach { cands =>
      val next =
        scala.collection.mutable.HashMap
          .empty[(Long, Long), (Double, List[Array[Double]])]
      states.foreach { case ((sm, sx), (cost, acc)) =>
        cands.foreach { case ((m, x), (c, p)) =>
          val key = (sm + m, sx + x)
          val tot = cost + c
          if (!next.contains(key) || tot < next(key)._1)
            next(key) = (tot, p :: acc)
        }
      }
      states = next.toMap
    }

    states.get((minPoint.toLong, maxPoint.toLong)) match {
      case Some((_, assignRev)) =>
        val assign = assignRev.reverse
        vars.zip(assign).flatMap { case (v, p) =>
          byVar(v).zipWithIndex.map { case (r, i) =>
            r.copy(points = p(i))
          }
        }
      case None => rows.map(r => r.copy(points = math.rint(r.points)))
    }
  }
}

final class FittedScorecard(
    val process: FittedBinningProcess,
    val selected: Array[String],
    val coefficients: Array[Double],
    val estimatorIntercept: Double,
    val pointsTable: Array[Scorecard.PointsRow],
    val baseIntercept: Double,
    val scaling: Scorecard.ScalingConfig,
    /** (mean, cholesky(inv(cov))) of the WoE design — Mahalanobis basis
      * for counterfactual closeness; None when unavailable. */
    val woeStats: Option[(Array[Double], Array[Array[Double]])] = None)
    extends Serializable {

  /** Per-variable points expression: the variable's transform CASE chain
    * with points as values (including special/missing rows). */
  private def pointsColumn(v: String): Column = {
    val f = process.fits(v)
    val byBin = pointsTable.filter(_.variable == v)
    // indices transform gives bin id; map id -> points via CASE
    val idxCol = f.transform(col(v), metric = "indices")
    byBin.foldLeft(lit(Double.NaN)) { (acc, r) =>
      when(idxCol === r.binId, lit(r.points)).otherwise(acc)
    }
  }

  /** Total score column (`scorecard.py:396-421`): sum of per-variable
    * points (+ intercept when intercept_based). Pure projection. */
  def scoreColumn(): Column =
    selected.map(pointsColumn).reduce(_ + _) + lit(baseIntercept)

  def score(df: DataFrame, keepCols: Seq[String] = Seq.empty): DataFrame =
    df.select(keepCols.map(col) :+ scoreColumn().as("score"): _*)

  /** Predicted class label via the probability threshold
    * (`scorecard.py:335-354` predict). */
  def predictColumn(threshold: Double = 0.5): Column =
    (predictProbaColumn() >= threshold).cast("double")

  /** Event probability via the logistic link on the linear predictor
    * (equivalent to sklearn predict_proba on WoE features). */
  def predictProbaColumn(): Column = {
    val linear = selected.zipWithIndex.map { case (v, i) =>
      process.fits(v).transform(col(v), metric = "woe") *
        lit(coefficients(i))
    }.reduce(_ + _) + lit(estimatorIntercept)
    lit(1.0) / (lit(1.0) + exp(-linear))
  }
}
