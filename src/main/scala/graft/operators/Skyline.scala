package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed 2-D Pareto skyline (dominance frontier).
  *
  * A row is on the skyline iff no other row is at least as good on
  * both axes and strictly better on one — here "good" means a SMALLER
  * `minimizeCol` and a LARGER `maximizeCol` (e.g. cheapest parts per
  * size class: price down, size up). Exact-duplicate optima all
  * survive (neither dominates the other).
  *
  * The naive formulation is a quadratic NOT-EXISTS self-join; the
  * classic single-node trick is a sort by (min asc, max desc) with a
  * running max — but a global sort is a single reducer. This
  * implementation keeps the running-max idea and distributes it with
  * the same two-pass prefix discipline as the packing roll-up:
  *
  *  1. rows bucket by `floorDiv(minimizeCol, bucketWidth)` — a
  *     DETERMINISTIC range partition (no sampled boundaries), so
  *     every row in bucket b-1 has a strictly smaller minimize value
  *     than every row in bucket b;
  *  2. a per-bucket `max(maximizeCol)` aggregate (n_buckets rows,
  *     map-side combined) gets a prefix-max over strictly lower
  *     buckets on a single task — the ONLY single-task step, over
  *     n_buckets rows, not n — and broadcasts back;
  *  3. one window per bucket, ordered by the minimize value, computes
  *     with two frames over ONE sort: the running max over strictly
  *     cheaper rows (RANGE … 1 PRECEDING) and the max at the same
  *     price (RANGE CURRENT ROW). A row survives iff no strictly
  *     cheaper row (in-bucket or in the broadcast prefix) ties-or-
  *     beats its maximize value, and no same-price row strictly
  *     beats it.
  *
  * At 100 TB the shuffle carries only (min, max, id) triples, the
  * per-bucket sort is bounded by bucketWidth's data share, and the
  * prefix table is n_buckets rows — pick bucketWidth so value-range /
  * bucketWidth ≈ a few thousand.
  *
  * Reference anchor: dominance pruning plays the same role as
  * optbinning's per-bin Pareto trend filtering (reference
  * optbinning/binning/auto_monotonic.py:29 picks trend change points
  * by dominated-segment elimination); here it is a first-class
  * relational operator.
  */
object Skyline {

  /** Exact floor division over the named column (`div`, not `/`: the
    * latter is double division, inexact past 2^53; and bare `div`
    * truncates toward zero, which would break bucket monotonicity for
    * negative values). */
  private def floorDiv(colName: String, w: Long): Column =
    expr(s"CASE WHEN $colName >= 0 THEN $colName div ${w}L " +
         s"ELSE -((-$colName + ${w - 1}L) div ${w}L) END")

  /** @param df          input frame
    * @param minimizeCol long/int column to minimize
    * @param maximizeCol long/int column to maximize
    * @param idCols      passthrough identity columns
    * @param bucketWidth minimize-axis width of one range bucket
    */
  def skyline2d(df: DataFrame, minimizeCol: String, maximizeCol: String,
                idCols: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0; got $bucketWidth")
    val pts = df
      .where(col(minimizeCol).isNotNull && col(maximizeCol).isNotNull)
      .select((idCols.map(col) :+
               col(minimizeCol).cast("long").as("__mn") :+
               col(maximizeCol).cast("long").as("__mx")): _*)
      .withColumn("__b", floorDiv("__mn", bucketWidth))
    // pass 1: per-bucket best maximize value -> prefix over LOWER buckets.
    // The unpartitioned window runs on ONE task over n_buckets rows — the
    // deliberate tiny sequential step of the two-pass prefix pattern.
    val wPfx = graft.core.Windows.bounded(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = pts.groupBy("__b").agg(max("__mx").as("__bmax"))
      .select(col("__b"), max("__bmax").over(wPfx).as("__pfx"))
    // pass 2: one in-bucket sort serves both frames
    val byMin = Window.partitionBy("__b").orderBy("__mn")
    val wLt = byMin.rangeBetween(Window.unboundedPreceding, -1)
    val wEq = byMin.rangeBetween(Window.currentRow, Window.currentRow)
    pts
      .join(broadcast(prefix), Seq("__b"))
      .withColumn("__lt", greatest(
        coalesce(max("__mx").over(wLt), lit(Long.MinValue)),
        coalesce(col("__pfx"), lit(Long.MinValue))))
      .withColumn("__eq", max("__mx").over(wEq))
      .where(col("__lt") < col("__mx") && col("__eq") === col("__mx"))
      .select((idCols.map(col) :+
               col("__mn").as(minimizeCol) :+
               col("__mx").as(maximizeCol)): _*)
  }
}
