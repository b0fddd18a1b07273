package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — points against half-open time intervals
  * `[start, end)` — without ever giving the optimizer an inequality
  * join to mis-plan: Spark turns a bare `ts >= start AND ts < end`
  * condition into a broadcast nested loop (or a cartesian product
  * when neither side broadcasts), which is quadratic at corpus scale.
  *
  * Bucketing shape: intervals EXPLODE to the fixed-width time buckets
  * they overlap (a generator in the scan — per-row arithmetic, no
  * shuffle), points compute their single containing bucket, and the
  * two sides equi-join on `(keys..., bucket)` with the exact
  * containment predicate as a post-filter. A point lives in exactly
  * ONE bucket, so every (point, interval) match surfaces exactly once
  * — no dedup pass. Join output and shuffle are bounded by
  * bucket-local density, never |points| x |intervals|.
  *
  * `bucketSeconds` tunes the explosion: an interval produces
  * `ceil(length / bucket)` rows, so pick the bucket near the median
  * interval length (explosion factor ~2) — far smaller buckets blow
  * up the interval side, far larger ones degrade bucket selectivity
  * toward the quadratic join this operator exists to avoid.
  *
  * Null handling: null-ts points and null-bound intervals drop (inner
  * join semantics; a containment test against null is never true).
  */
object RangeJoin {

  /** @param points    rows with an event-time column `tsCol`
    * @param intervals rows with `[startCol, endCol)` timestamp bounds
    * @param keyCols   equi-key columns present on BOTH sides (empty
    *                  for global intervals)
    * Output: every point row joined with every containing interval's
    * columns (interval columns keep their names; collisions with
    * point columns are the caller's to rename).
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   tsCol: String, startCol: String, endCol: String,
                   bucketSeconds: Long,
                   keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketSeconds > 0,
      s"bucketSeconds must be positive; got $bucketSeconds")
    val bUs = bucketSeconds * 1000000L
    val p = points
      .where(col(tsCol).isNotNull)
      .withColumn("__bucket",
                  floor(unix_micros(col(tsCol)) / lit(bUs)).cast("long"))
    val i = intervals
      .where(col(startCol).isNotNull && col(endCol).isNotNull &&
             col(startCol) < col(endCol))
      .withColumn("__bucket", explode(sequence(
        floor(unix_micros(col(startCol)) / lit(bUs)).cast("long"),
        floor((unix_micros(col(endCol)) - 1) / lit(bUs)).cast("long"))))
    p.join(i, keyCols :+ "__bucket")
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
