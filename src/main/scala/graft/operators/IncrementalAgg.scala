package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern:
  * keep a grouped rollup (`count` + integer sums) current by applying
  * CDC deltas to the AGGREGATE, never rescanning the base detail.
  * At 100 TB the base table is the thing you cannot afford to re-read;
  * the rollup is keys × counters and the delta batch is the day's
  * churn, so maintenance cost is O(rollup + delta), independent of
  * base size. An update row arrives as its delete + insert halves
  * (the CDC convention; [[Temporal.snapshotDiff]] classifies them).
  *
  * Groups whose maintained count reaches zero drop out, exactly as a
  * recompute would drop them. All counters are longs — the engine's
  * integer-exact oracle discipline means the maintained rollup is
  * bit-identical to the full recompute, which is what the driver
  * query proves.
  */
object IncrementalAgg {

  /** Build the rollup: keys, `n`, and one `sum_<c>` per sum column. */
  def rollup(detail: DataFrame, keyCols: Seq[String],
             sumCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "rollup needs at least one key column")
    val aggs = count(lit(1)).as("n") +:
      sumCols.map(c => sum(col(c).cast("long")).as(s"sum_$c"))
    detail.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Apply a CDC delta to a rollup produced by [[rollup]] over the
    * same keys/sums: `inserts` and `deletes` are DETAIL rows. One
    * union of three bounded aggregates, one final merge aggregate. */
  def applyDelta(base: DataFrame, inserts: DataFrame, deletes: DataFrame,
                 keyCols: Seq[String], sumCols: Seq[String]): DataFrame = {
    val insAgg = rollup(inserts, keyCols, sumCols)
    val delAgg = {
      val a = rollup(deletes, keyCols, sumCols)
      val negated = (col("n") * -1).as("n") +:
        sumCols.map(c => (col(s"sum_$c") * -1).as(s"sum_$c"))
      a.select(keyCols.map(col) ++ negated: _*)
    }
    val merged = base.unionByName(insAgg).unionByName(delAgg)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("n")).as("n"),
           sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
    merged.where(col("n") > 0)
  }
}
