package graft.operators

import org.apache.spark.ml.feature.Bucketizer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Value-histogram compression for high-cardinality numeric columns.
  *
  * The fit data plane aggregates clean rows to a (value -> target stats)
  * histogram. When the approximate distinct count exceeds the budget, the
  * column is first collapsed onto an approx-quantile grid; bucketing is an
  * ml `Bucketizer` (binary search per row, O(log grid)) — NOT a
  * linear-scan array filter, which at 100 TB would cost rows x gridSize
  * comparisons.
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

  /** Replace column `xCol` with its grid representative (the largest grid
    * edge <= x; rows below the first edge map to minX). One extra
    * aggregate pass computes the grid; the Bucketizer projection then
    * feeds the histogram groupBy with bounded key cardinality.
    */
  def gridCompress(df: DataFrame, xCol: String, minX: Double,
                   maxBuckets: Int): DataFrame = {
    val probs = array((1 until maxBuckets)
      .map(i => lit(i.toDouble / maxBuckets)): _*)
    val grid = df.select(
        percentile_approx(col(xCol), probs, lit(10000)).as("grid"))
      .head.getSeq[Double](0).toArray
    val edges = (minX +: grid).distinct.sorted
    val splits = edges :+ Double.PositiveInfinity
    val bucketizer = new Bucketizer()
      .setInputCol(xCol)
      .setOutputCol("__bucket")
      .setSplits(splits)
      .setHandleInvalid("keep")
    val edgesLit = lit(edges)
    bucketizer.transform(df)
      .withColumn(xCol,
        element_at(edgesLit, col("__bucket").cast("int") + 1))
      .drop("__bucket")
  }
}
