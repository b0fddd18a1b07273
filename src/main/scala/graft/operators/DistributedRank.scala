package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global ranking without a global sort.
  *
  * `rank() OVER (ORDER BY v)` on a 100 TB column is a single reducer —
  * the one window shape Spark cannot distribute. Both operators here
  * restore scale with the deterministic two-pass prefix discipline
  * (the [[Skyline]] / packing roll-up pattern):
  *
  *  1. bucket rows by exact floor division of the value — a
  *     DETERMINISTIC range partition, no sampled boundaries, so bucket
  *     order is value order and ties never straddle buckets;
  *  2. aggregate per-bucket row counts (map-side combined, n_buckets
  *     rows), prefix-sum them on one task over n_buckets rows — the
  *     only sequential step — and broadcast back;
  *  3. rank within each bucket with an ordinary partitioned window and
  *     add the bucket's prefix: `global = prefix(bucket) + in-bucket`.
  *
  * Pick bucketWidth so value-range / bucketWidth lands in the
  * thousands: prefix table stays tiny, per-bucket sorts stay bounded
  * by one bucket's data share.
  *
  * Reference anchor: rank/quantile normalization is the model-free
  * sibling of the reference's WoE transform (reference
  * optbinning/binning/transformations.py:230 maps values through
  * ordered bins); here the "bins" are exact global ranks.
  */
object DistributedRank {

  private def floorDiv(colName: String, w: Long): Column =
    expr(s"CASE WHEN $colName >= 0 THEN $colName div ${w}L " +
         s"ELSE -((-$colName + ${w - 1}L) div ${w}L) END")

  /** Shared prefix stage of the global-rank family: bucket rows by
    * exact floor division (`__b`), prefix-sum the per-bucket counts on
    * one task over n_buckets rows, and broadcast-join `__pfx`/`__n`
    * back — the caller adds its in-bucket window on top and drops the
    * scaffolding. ONE home for the discipline so the rank()/
    * row_number() entry points cannot drift apart. */
  private def withBucketPrefix(df: DataFrame, valueCol: String,
                               bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0; got $bucketWidth")
    val pts = df.where(col(valueCol).isNotNull)
      .withColumn("__b", floorDiv(valueCol, bucketWidth))
    val wPfx = graft.core.Windows.bounded(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = pts.groupBy("__b").agg(count(lit(1)).as("__bc"))
      .select(col("__b"),
              coalesce(sum("__bc").over(wPfx), lit(0L)).as("__pfx"),
              sum("__bc").over(graft.core.Windows.boundedAll
                .rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)).as("__n"))
    pts.join(broadcast(prefix), Seq("__b"))
  }

  /** Adds the exact global MIN-rank (1-based; ties share the lowest
    * rank, `rank()` semantics) of LONG column `valueCol`, plus the
    * total row count `__n` — the pair behind percentile/decile
    * feature transforms: `pct_ppm = ((rank-1)*1e6) div (n-1)`.
    */
  def withGlobalRank(df: DataFrame, valueCol: String, bucketWidth: Long,
                     rankCol: String = "rank"): DataFrame = {
    val wIn = Window.partitionBy("__b").orderBy(valueCol)
    withBucketPrefix(df, valueCol, bucketWidth)
      .withColumn(rankCol, col("__pfx") + rank().over(wIn))
      .drop("__b", "__pfx")
  }

  /** Adds the exact global ROW NUMBER (1-based) under the total order
    * `(valueCol, tieCol)` — both LONG, `tieCol` unique — plus the row
    * count `__n`: [[withBucketPrefix]] with the unique tie column
    * extending the in-bucket ordering so every row gets a distinct
    * position. The pair drives exact quantile scoring
    * (`score = ((rn-1)*q) div n + 1` splits into q near-equal bands).
    */
  def withGlobalRowNumber(df: DataFrame, valueCol: String, tieCol: String,
                          bucketWidth: Long,
                          outCol: String): DataFrame = {
    val wIn = Window.partitionBy("__b").orderBy(col(valueCol), col(tieCol))
    withBucketPrefix(df, valueCol, bucketWidth)
      .withColumn(outCol, col("__pfx") + row_number().over(wIn))
      .drop("__b", "__pfx")
  }

  /** Adds TWICE the average rank (1-based) of `valueCol` within each
    * `groupCols` group as `outCol` — doubling keeps tied-average
    * ranks (the `x.5` halves) exact in integer arithmetic:
    * `2·avgrank = 2·count(<) + count(=) + 1`. The building block of
    * [[groupedSpearman]].
    */
  def withGroupDoubledRank(df: DataFrame, groupCols: Seq[String],
                           valueCol: String, bucketWidth: Long,
                           outCol: String): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0; got $bucketWidth")
    val g = groupCols.map(col)
    val pts = df.where(col(valueCol).isNotNull)
      .withColumn("__b", floorDiv(valueCol, bucketWidth))
    // per-(group, bucket) counts; prefix over LOWER buckets within the
    // group — groups × buckets rows, windowed per group (tiny)
    val wPfx = Window.partitionBy(groupCols.map(col): _*).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = pts.groupBy(g :+ col("__b"): _*)
      .agg(count(lit(1)).as("__bc"))
      .select(g :+ col("__b") :+
              coalesce(sum("__bc").over(wPfx), lit(0L)).as("__pfx"): _*)
    val wIn = Window.partitionBy(g :+ col("__b"): _*).orderBy(valueCol)
    val wEq = Window.partitionBy(g :+ col("__b") :+ col(valueCol): _*)
    pts.join(broadcast(prefix), groupCols :+ "__b")
      .withColumn("__lt", col("__pfx") + rank().over(wIn) - 1)
      .withColumn("__eq", count(lit(1)).over(wEq))
      .withColumn(outCol, lit(2) * col("__lt") + col("__eq") + 1)
      .drop("__b", "__pfx", "__lt", "__eq")
  }

  /** Exact Spearman rank correlation per group, in integers: emits
    * `(group, n, sum_d2_x4)` where `sum_d2_x4 = Σ (2·rx − 2·ry)²` over
    * average ranks — four times the classic `Σ d²`, kept doubled so
    * ties stay exact. The float coefficient is derivable downstream
    * (`rho = 1 − 6·(sum_d2_x4/4) / (n·(n²−1))`) but never enters this
    * operator or its replay — the integer-only-oracle discipline.
    *
    * Cost: two value-bucket shuffles of the row set (conceptually the
    * sort by x and the sort by y) plus one group aggregate; both rank
    * passes use the bounded-bucket windows above, never a whole-group
    * sort, so a 1B-row group holds.
    */
  def groupedSpearman(df: DataFrame, groupCol: String, xCol: String,
                      yCol: String, bucketWidthX: Long,
                      bucketWidthY: Long): DataFrame = {
    val base = df.where(col(xCol).isNotNull && col(yCol).isNotNull)
    val rx = withGroupDoubledRank(base, Seq(groupCol), xCol,
                                  bucketWidthX, "__rx2")
    val rxy = withGroupDoubledRank(rx, Seq(groupCol), yCol,
                                   bucketWidthY, "__ry2")
    rxy.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
           sum((col("__rx2") - col("__ry2")) *
               (col("__rx2") - col("__ry2"))).as("sum_d2_x4"))
  }

  /** Concentration (Gini) sums per group, in integers: emits
    * `(group, n, s = Σv, w2 = Σ 2·avgrank(v)·v)` over non-negative
    * integer values. The Gini coefficient is derivable downstream as
    * `G = (w2 − (n+1)·s) / (n·s)` — the classic
    * `(2·Σ i·v_(i) − (n+1)·Σv) / (n·Σv)` with the rank sum computed
    * on doubled AVERAGE ranks, which equals the sorted-order sum for
    * any tie-breaking permutation (within a tied block Σ i·v is
    * rank-assignment-invariant), so no per-row tiebreaker column is
    * needed and the surface stays integer-exact. The float
    * coefficient never enters the operator or its replay.
    *
    * Cost: one bucketed doubled-rank pass (bounded windows — never a
    * whole-group sort; a 1B-row group holds) plus one group
    * aggregate. Nulls and negative values are excluded (Gini is
    * defined over a non-negative distribution).
    */
  def groupedConcentration(df: DataFrame, groupCol: String,
                           valueCol: String,
                           bucketWidth: Long): DataFrame = {
    val base = df.where(col(valueCol).isNotNull && col(valueCol) >= 0)
    withGroupDoubledRank(base, Seq(groupCol), valueCol, bucketWidth,
                         "__r2")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
           sum(col(valueCol)).as("s"),
           sum(col("__r2") * col(valueCol)).as("w2"))
  }
}
