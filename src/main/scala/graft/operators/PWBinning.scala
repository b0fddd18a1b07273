package graft.operators

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.core.Prebinning

/** Piecewise-polynomial optimal binning
  * (`optbinning/binning/piecewise/binning.py:27`): optimal bins first,
  * then a continuous piecewise-linear event-rate curve fitted across the
  * bins. The reference delegates to the ropwr convex solver; per SURVEY
  * §7.4 the degree-1 continuous l2 objective has a closed form — a linear
  * spline (truncated power basis with knots at the optimal splits) whose
  * weighted least squares reduce to (k+2)-dim normal equations on the
  * value histogram (sufficient statistics of the row-level problem), so
  * no solver and no extra data pass are needed. Breeze (Spark classpath)
  * solves the tiny system.
  */
object PWBinning {

  final case class FittedPW(
      splits: Array[Double],
      coef: Array[Double],  // [alpha, beta, gamma_1..gamma_k]
      binning: FittedOptimalBinning,
      lb: Double, ub: Double) extends Serializable {

    /** Predicted event rate as a Column: alpha + beta x +
      * sum gamma_j max(0, x - s_j), clipped to [lb, ub]. */
    def predictColumn(xCol: Column): Column = {
      val x = xCol.cast(DoubleType)
      val linear = splits.indices.foldLeft(
        lit(coef(0)) + lit(coef(1)) * x) { (acc, j) =>
        acc + lit(coef(j + 2)) * greatest(lit(0.0), x - splits(j))
      }
      least(greatest(linear, lit(lb)), lit(ub))
    }

    /** WoE from the predicted event rate
      * (`transformations.py:19-39` applied pointwise). */
    def transformWoe(xCol: Column): Column = {
      val er = predictColumn(xCol)
      val tE = binning.table.tEvent
      val tNe = binning.table.tNonevent
      log((lit(1.0) / er - 1) * tE / tNe)
    }
  }

  def fit(df: DataFrame, xCol: String, yCol: String,
          config: BinningConfig = BinningConfig()): FittedPW = {
    val binning = OptimalBinning.fit(df, xCol, yCol, config)
    val splits = binning.splits

    // value histogram (sufficient statistics for the weighted LS); grid-
    // compressed beyond the bucket budget like the fit data plane
    val x = col(xCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    val clean = df.where(!x.isNull && !isnan(x))
      .select(x.as("x"), y.as("y"))
    val stats = clean.agg(approx_count_distinct(col("x")).as("ndv"),
                          min(col("x")).as("mn"),
                          max(col("x")).as("mx")).head
    val keyed =
      if (stats.getLong(0) <= config.histogramMaxBuckets) clean
      else Histograms.gridCompress(clean, "x", stats.getDouble(1),
                                   stats.getDouble(2),
                                   config.histogramMaxBuckets)
    val hist = keyed
      .groupBy("x")
      .agg(count(lit(1)).cast("double").as("n"), avg(col("y")).as("rate"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))

    val coef = splineLeastSquares(hist, splits)
    val rates = hist.map(_._3)
    FittedPW(splits, coef, binning,
             lb = math.max(rates.min, 1e-6),
             ub = math.min(rates.max, 1 - 1e-6))
  }

  /** Continuous-target piecewise binning
    * (`piecewise/continuous_binning.py:24`): optimal bins from
    * `ContinuousOptimalBinning`, then the same closed-form linear-spline
    * least squares on the per-value mean-y histogram. `lb`/`ub` are
    * optional user prediction bounds (unbounded by default — a continuous
    * target has no [0, 1] range).
    */
  final case class FittedContPW(
      splits: Array[Double],
      coef: Array[Double],
      binning: FittedContinuousBinning,
      lb: Option[Double], ub: Option[Double]) extends Serializable {

    def predictColumn(xCol: Column): Column = {
      val x = xCol.cast(DoubleType)
      val linear = splits.indices.foldLeft(
        lit(coef(0)) + lit(coef(1)) * x) { (acc, j) =>
        acc + lit(coef(j + 2)) * greatest(lit(0.0), x - splits(j))
      }
      val lo = lb.map(v => greatest(linear, lit(v))).getOrElse(linear)
      ub.map(v => least(lo, lit(v))).getOrElse(lo)
    }
  }

  def fitContinuous(df: DataFrame, xCol: String, yCol: String,
                    config: BinningConfig = BinningConfig(),
                    lb: Option[Double] = None,
                    ub: Option[Double] = None): FittedContPW = {
    val binning = ContinuousOptimalBinning.fit(df, xCol, yCol, config)
    val splits = binning.splits

    val x = col(xCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    val clean = df.where(!x.isNull && !isnan(x))
      .select(x.as("x"), y.as("y"))
    val stats = clean.agg(approx_count_distinct(col("x")).as("ndv"),
                          min(col("x")).as("mn"),
                          max(col("x")).as("mx")).head
    val keyed =
      if (stats.getLong(0) <= config.histogramMaxBuckets) clean
      else Histograms.gridCompress(clean, "x", stats.getDouble(1),
                                   stats.getDouble(2),
                                   config.histogramMaxBuckets)
    val hist = keyed
      .groupBy("x")
      .agg(count(lit(1)).cast("double").as("n"), avg(col("y")).as("rate"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))

    val coef = splineLeastSquares(hist, splits)
    FittedContPW(splits, coef, binning, lb, ub)
  }

  /** Weighted least squares of the truncated-power linear spline on a
    * (value, weight, target) histogram — shared by the binary and
    * continuous fits. */
  private def splineLeastSquares(hist: Array[(Double, Double, Double)],
                                 splits: Array[Double]): Array[Double] = {
    val k = splits.length
    val p = k + 2
    val xtx = DenseMatrix.zeros[Double](p, p)
    val xty = DenseVector.zeros[Double](p)
    hist.foreach { case (v, w, rate) =>
      val basis = new Array[Double](p)
      basis(0) = 1.0
      basis(1) = v
      var j = 0
      while (j < k) {
        basis(j + 2) = math.max(0.0, v - splits(j)); j += 1
      }
      var a = 0
      while (a < p) {
        var b = 0
        while (b < p) {
          xtx(a, b) += w * basis(a) * basis(b); b += 1
        }
        xty(a) += w * basis(a) * rate
        a += 1
      }
    }
    (0 until p).foreach(i => xtx(i, i) += 1e-9)
    (xtx \ xty).toArray
  }
}
