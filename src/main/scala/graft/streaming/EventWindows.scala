package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregations with watermarking — the
  * `readStream -> withWatermark -> groupBy(window(...)) -> writeStream`
  * shape for the `events` stream (event_id, ts, user_id, event_type,
  * value). The reference has no event-time semantics (its streaming
  * model is order-insensitive sketches); these operators cover the
  * monitoring-over-time surface a production scoring pipeline needs
  * (PSI cohorts per window, event volumes, per-type value stats).
  * Works identically on batch DataFrames (window() is an ordinary
  * grouping expression) and streaming ones (watermark bounds state).
  */
object EventWindows {

  /** Tumbling-window event counts + value stats per event type.
    * On a streaming input, `watermarkDelay` drops events later than the
    * delay and lets Spark evict window state.
    */
  def typeStatsPerWindow(events: DataFrame, tsCol: String,
                         windowLength: String,
                         watermarkDelay: Option[String] = None)
      : DataFrame = {
    val src = watermarkDelay match {
      case Some(d) => events.withWatermark(tsCol, d)
      case None    => events
    }
    src.groupBy(window(col(tsCol), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value")).as("sum_value"),
           avg(col("value")).as("avg_value"))
      .select(col("window.start").as("window_start"),
              col("window.end").as("window_end"),
              col("event_type"), col("n_events"),
              col("sum_value"), col("avg_value"))
  }

  /** Sliding-window per-user activity (windowLength every slide). */
  def userActivity(events: DataFrame, tsCol: String, windowLength: String,
                   slide: String,
                   watermarkDelay: Option[String] = None): DataFrame = {
    val src = watermarkDelay match {
      case Some(d) => events.withWatermark(tsCol, d)
      case None    => events
    }
    src.groupBy(window(col(tsCol), windowLength, slide), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("user_id"),
              col("n_events"), col("sum_value"))
  }

  /** Score-distribution cohort per window: bins a score column inside
    * each event-time window — the per-window PSI input
    * (feed consecutive windows to `Monitoring.psiTable`). */
  def scoreCohortPerWindow(events: DataFrame, tsCol: String,
                           scoreCol: Column, splits: Array[Double],
                           windowLength: String,
                           watermarkDelay: Option[String] = None)
      : DataFrame = {
    val src = watermarkDelay match {
      case Some(d) => events.withWatermark(tsCol, d)
      case None    => events
    }
    val bin = splits.indices.foldRight(lit(splits.length): Column) {
      (i, acc) => when(scoreCol < splits(i), lit(i)).otherwise(acc)
    }
    // unscored (null/NaN) events have no cohort bin — same exclusion as
    // Monitoring.psi / StreamingDriftMonitor, so downstream PSI tracks
    // the score distribution, not the null rate
    src.where(scoreCol.isNotNull && !isnan(scoreCol))
      .groupBy(window(col(tsCol), windowLength), bin.as("bin"))
      .agg(count(lit(1)).as("count"))
      .select(col("window.start").as("window_start"), col("bin"),
              col("count"))
  }
}
