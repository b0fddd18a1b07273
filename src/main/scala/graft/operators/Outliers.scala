package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Outlier detectors (`optbinning/binning/outlier.py`), fit as small Spark
  * aggregates; `support` returns the outlier predicate as a Column so the
  * subsequent filter stays inside the scan's pushdown/codegen pipeline.
  */
object Outliers {

  final case class Bounds(lower: Double, upper: Double) {
    /** Outlier predicate (x outside [lower, upper]). */
    def support(x: Column): Column = x > upper || x < lower
    def keep(x: Column): Column = !(support(x))
  }

  /** Interquartile-range / credible-interval detector
    * (`outlier.py:69-127`). ETI uses exact percentiles (Spark `percentile`,
    * numpy-linear interpolation); HDI (shortest interval) needs order
    * statistics — computed via two exact percentile grids driver-side for
    * moderate n, or pass `approx=true` to use approx_percentile at scale.
    */
  def fitRange(df: DataFrame, xCol: String, intervalLength: Double = 0.5,
               k: Double = 1.5, method: String = "ETI",
               approx: Boolean = false): Bounds = {
    val x = col(xCol).cast(DoubleType)
    val (lb, ub) = method match {
      case "ETI" =>
        val lower = (1 - intervalLength) / 2
        val upper = (1 + intervalLength) / 2
        val r = df.select(
          (if (approx) percentile_approx(x, array(lit(lower), lit(upper)),
                                         lit(10000))
           else percentile(x, array(lit(lower), lit(upper)))).as("q"))
          .head.getSeq[Double](0)
        (r(0), r(1))
      case "HDI" =>
        // shortest interval containing interval_length of the mass:
        // scan candidate start ranks on an exact quantile ladder
        val n = df.count()
        val nIncluded = math.ceil(intervalLength * n).toLong
        val nCi = (n - nIncluded).toInt
        require(nCi < 100000, "HDI on very large inputs: sample first")
        val probsLo = (0 until nCi).map(i => i.toDouble / (n - 1))
        val probsHi = (0 until nCi).map(i => (i + nIncluded).toDouble / (n - 1))
        val r = df.select(
          percentile(x, array(probsLo.map(lit(_)): _*)).as("lo"),
          percentile(x, array(probsHi.map(lit(_)): _*)).as("hi")).head
        val lo = r.getSeq[Double](0); val hi = r.getSeq[Double](1)
        val j = (0 until nCi).minBy(i => hi(i) - lo(i))
        (lo(j), hi(j))
    }
    val iqr = ub - lb
    Bounds(lb - k * iqr, ub + k * iqr)
  }

  /** Modified Z-score detector (`outlier.py:149-162`): two median passes
    * (median, then MAD), predicate |0.6745 (x-med)/MAD| > threshold.
    * Exact `median` matches the reference but is a single-buffer global
    * aggregate; pass `approx=true` at very large scale to use the
    * mergeable quantile sketch instead.
    */
  def fitZScore(df: DataFrame, xCol: String, threshold: Double = 3.5,
                approx: Boolean = false): Column = {
    val x = col(xCol).cast(DoubleType)
    def med1(c: Column): Double = {
      val expr = if (approx) percentile_approx(c, lit(0.5), lit(10000))
                 else median(c)
      df.select(expr.cast(DoubleType)).head.getDouble(0)
    }
    val med = med1(x)
    val mad = med1(abs(x - lit(med)))
    abs(lit(0.6745) * (x - lit(med)) / lit(mad)) > threshold
  }

  /** Per-x-quantile-bin outlier removal on y (`outlier.py:187-227`):
    * x is cut into n_bins equal-frequency bins; a zscore/range detector
    * runs within each bin. One aggregate for the splits, one grouped
    * aggregate for the per-bin medians/quantiles, and the final predicate
    * is a generated CASE over bins — fully distributed.
    */
  def fitYQuantile(df: DataFrame, xCol: String, yCol: String,
                   detector: String = "zscore",
                   nBins: Int = 5): Column = {
    val x = col(xCol).cast(DoubleType)
    val y = col(yCol).cast(DoubleType)
    val probs = (0 to nBins).map(i => i.toDouble / nBins)
    val qs = df.select(
      percentile(x, array(probs.map(lit(_)): _*)).as("q"))
      .head.getSeq[Double](0)
    val splits = qs.distinct.sorted.drop(1).dropRight(1).toArray

    def binIdx(c: Column): Column =
      splits.indices.foldRight(lit(splits.length): Column) { (i, acc) =>
        when(c < splits(i), lit(i)).otherwise(acc)
      }

    val binned = df.select(x.as("x"), y.as("y"))
      .withColumn("bin", binIdx(col("x")))

    detector match {
      case "zscore" =>
        val meds = binned.groupBy("bin")
          .agg(median(col("y")).as("med")).collect()
          .map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val medCase = meds.foldLeft(lit(Double.NaN)) {
          case (acc, (b, m)) => when(binIdx(x) === b, lit(m)).otherwise(acc)
        }
        val mads = binned
          .withColumn("med", meds.foldLeft(lit(Double.NaN)) {
            case (acc, (b, m)) => when(col("bin") === b, lit(m)).otherwise(acc)
          })
          .groupBy("bin")
          .agg(median(abs(col("y") - col("med"))).as("mad")).collect()
          .map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val madCase = mads.foldLeft(lit(Double.NaN)) {
          case (acc, (b, m)) => when(binIdx(x) === b, lit(m)).otherwise(acc)
        }
        abs(lit(0.6745) * (y - medCase) / madCase) > 3.5
      case "range" =>
        val bounds = binned.groupBy("bin")
          .agg(percentile(col("y"), array(lit(0.25), lit(0.75))).as("q"))
          .collect()
          .map { r =>
            val q = r.getSeq[Double](1)
            val iqr = q(1) - q(0)
            r.getInt(0) -> (q(0) - 1.5 * iqr, q(1) + 1.5 * iqr)
          }.toMap
        bounds.foldLeft(lit(false)) { case (acc, (b, (lo, hi))) =>
          when(binIdx(x) === b, y > hi || y < lo).otherwise(acc)
        }
    }
  }
}
