package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{FreqAgg, TopKAgg}

/** Grouped ranking operators built on the bounded-state
  * [[graft.functions.TopKAgg]] aggregate rather than window ranks —
  * see that file's scaladoc for why window-per-group dies on skewed
  * groups at corpus scale.
  */
object Ranking {

  /** Exact top-k rows per group by (metricCol desc, idCol asc):
    * one aggregate with O(k) per-group state (map-side combined),
    * then a bounded explode. Output: group cols + `rank` (1-based) +
    * idCol + metricCol, one row per kept item. Rows with a null
    * metric or id are ignored, matching the SQL-window replay's
    * explicit NOT NULL filter. `idCol` must identify rows uniquely:
    * the aggregate holds an exact (metric, id) duplicate once (set
    * semantics), while the row_number oracle would rank both copies —
    * feed row-unique ids or pre-aggregate duplicates first. */
  def topkPerGroup(df: DataFrame, groupCols: Seq[String],
                   metricCol: String, idCol: String, k: Int): DataFrame = {
    val g = groupCols.map(col)
    df.groupBy(g: _*)
      .agg(TopKAgg.topkLongs(col(metricCol).cast("long"),
                             col(idCol).cast("long"), k).as("__top"))
      .select(g :+ posexplode(col("__top")): _*)
      .select(g ++ Seq((col("pos") + 1).as("rank"),
                       col("col.id").as(idCol),
                       col("col.key").as(metricCol)): _*)
  }

  /** EXACT θ-heavy-hitters per group (keys with frequency strictly
    * above `1/thetaDen` of the group), via the sketch-routes /
    * exact-verifies pattern: a Misra-Gries pass
    * ([[graft.functions.FreqAgg]], capacity ≥ thetaDen so the
    * candidate set provably contains every qualifying key) bounds the
    * exact pass to ≤ capacity keys per group; a semi-join on the
    * exploded candidates then counts ONLY candidate rows exactly and
    * keeps `count·thetaDen > groupTotal`. The result is hash-exact —
    * the sketch never appears in the output, only in which rows the
    * exact count had to touch.
    *
    * Plan shape at 100 TB: pass 1 is one map-side-combined aggregate
    * whose shuffle carries ≤ capacity (key, est) pairs per group per
    * map task; pass 2 re-scans the input but shuffles only rows whose
    * key is in the broadcast candidate set (≤ groups × capacity keys)
    * — the distinct-key explosion of a naive global count never
    * happens. Group totals ride along from pass 1 (no third scan).
    * Null keys are excluded throughout.
    */
  def heavyHitters(df: DataFrame, groupCols: Seq[String],
                   keyCol: String, thetaDen: Int,
                   capacity: Int): DataFrame = {
    require(thetaDen > 1, s"thetaDen must exceed 1; got $thetaDen")
    require(capacity >= thetaDen,
      s"capacity ($capacity) must be >= thetaDen ($thetaDen) for the " +
        "Misra-Gries superset guarantee (error <= n/(capacity+1))")
    val g = groupCols.map(col)
    val base = df.where(col(keyCol).isNotNull)
      .select(g :+ col(keyCol).cast("long").as("__key"): _*)
    val cand = base
      .groupBy(g: _*)
      .agg(FreqAgg.freqLongs(col("__key"), capacity).as("__cand"),
           count(lit(1)).as("__total"))
      .select(g ++ Seq(explode(col("__cand")).as("__c"),
                       col("__total")): _*)
      .select(g ++ Seq(col("__c.key").as("__key"), col("__total")): _*)
    base
      .join(broadcast(cand), groupCols :+ "__key")
      .groupBy(g :+ col("__key"): _*)
      .agg(count(lit(1)).as("n"), first(col("__total")).as("__total"))
      .where(col("n") * thetaDen > col("__total"))
      .select(g ++ Seq(col("__key").as(keyCol), col("n"),
                       col("__total").as("group_total")): _*)
  }
}
