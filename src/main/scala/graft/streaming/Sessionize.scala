package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the training-data-pipeline operator that
  * groups a user's event stream into sessions separated by inactivity
  * gaps. Works over any ordered axis (event time, or an insertion-ordered
  * id when timestamps are unavailable). Plan shape: ONE shuffle
  * (partitionBy user), two window passes (lag + running sum) inside it —
  * the classic gaps-and-islands formulation, fully distributed per user.
  * For event-time streaming use Spark's built-in
  * `session_window(ts, gap)` aggregation; this batch form matches it on
  * closed sessions.
  */
object Sessionize {

  /** Assign `session_id` (1-based per user): a new session starts when
    * the gap from the previous event exceeds `gap`. */
  def withSessionIds(df: DataFrame, userCol: String, orderCol: String,
                     gap: Double): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(orderCol)
    df.withColumn("__prev", lag(col(orderCol), 1).over(w))
      .withColumn("__new",
        (col("__prev").isNull ||
         col(orderCol) - col("__prev") > gap).cast("long"))
      .withColumn("session_id",
        sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev", "__new")
  }

  /** Per-session aggregates: events, span, value sum. */
  def sessionStats(df: DataFrame, userCol: String, orderCol: String,
                   valueCol: String, gap: Double): DataFrame =
    withSessionIds(df, userCol, orderCol, gap)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           (max(col(orderCol)) - min(col(orderCol))).as("span"),
           sum(col(valueCol)).as("value_sum"))
}
