package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKAgg

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
    * explicit NOT NULL filter. */
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
}
