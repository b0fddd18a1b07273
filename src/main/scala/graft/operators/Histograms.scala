package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Value-histogram compression for high-cardinality numeric columns.
  *
  * The fit data plane aggregates clean rows to a (value -> target stats)
  * histogram. When the approximate distinct count exceeds the budget, the
  * column is first collapsed onto a uniform [min, max] grid as a pure
  * column expression — zero extra scans and O(1) codegen, unlike a
  * quantile grid which costs a full percentile pass plus a
  * grid-sized literal in the generated code. The optimal-binning solve
  * only needs ~maxNPrebins split candidates out of `maxBuckets` grid
  * cells, so uniform resolution at 10k cells loses nothing material.
  */
object Histograms {

  /** Exact per-prebin aggregation for the user-splits path: the caller
    * aggregates with the provided bin-index CASE column (exact split
    * comparisons), and each resulting bin becomes one pseudo-histogram
    * bucket whose representative value lies strictly inside the bin, so
    * driver-side re-digitizing against any SUBSET of the splits (the
    * pure-bin refinement loop) reproduces exact counts.
    *
    * Returns (representative, n, payload) sorted by bin.
    */
  def exactPrebinBuckets[A](df: DataFrame, splits: Array[Double])(
      agg: org.apache.spark.sql.Column => Array[(Int, Long, A)])
      : Array[(Double, Long, A)] = {
    val idx = splits.indices.foldRight(
      lit(splits.length): org.apache.spark.sql.Column) { (i, acc) =>
      when(col("x") < splits(i), lit(i)).otherwise(acc)
    }
    def rep(i: Int): Double =
      if (i == 0) splits(0) - 1.0 else splits(i - 1)
    agg(idx).sortBy(_._1).map { case (b, n, a) => (rep(b), n, a) }
  }

  /** Replace column `xCol` with its uniform-grid representative (the
    * largest grid edge <= x). Same snapping as
    * `BinningProcess.fitNumericBatch` — the path the golden WoE parity
    * fixture validates. No Spark job is launched here; the caller feeds
    * min/max from its pass-1 stats aggregate.
    */
  def gridCompress(df: DataFrame, xCol: String, minX: Double, maxX: Double,
                   maxBuckets: Int): DataFrame = {
    val width = (maxX - minX) / maxBuckets
    if (width <= 0 || !java.lang.Double.isFinite(width)) df
    else df.withColumn(
      xCol, lit(minX) + floor((col(xCol) - minX) / width) * width)
  }
}
