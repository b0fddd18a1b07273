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

  /** [[typeStatsPerWindow]] in its hash-oracle-able integer form:
    * values quantize to `floor(value * 1e6)` BIGINTs before the sum,
    * so per-window totals are aggregation-order independent and an
    * external SQL engine replays them bit-exactly — the same
    * integerize-before-sum discipline as the k-means fit. This is the
    * append-mode streaming surface: run it with
    * `outputMode("append")` and a watermark, and the sink receives
    * exactly the windows whose end has fallen to or below the
    * watermark (emission at equality included — pinned by test).
    */
  def typeCountsPerWindowQ(events: DataFrame, tsCol: String,
                           windowLength: String,
                           watermarkDelay: Option[String] = None)
      : DataFrame = {
    val src = watermarkDelay match {
      case Some(d) => events.withWatermark(tsCol, d)
      case None    => events
    }
    src.groupBy(window(col(tsCol), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(floor(col("value") * lit(1e6)).cast("long"))
             .as("value_q_sum"))
      .select(col("window.start").cast("long").as("window_start"),
              col("event_type"), col("n_events"), col("value_q_sum"))
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

  /** Per-key ordered rolling features over the event stream — the
    * classic time-series feature block (trailing sum, step delta) a
    * scoring pipeline derives per user before binning. The value is
    * quantized ONCE to `floor(value * 1e6)` BIGINT (`value_q`), so the
    * trailing sum and delta are exact integer arithmetic: no float
    * accumulation, bit-identical on any engine and any row order —
    * the integer-surface discipline of the k-means fit.
    *
    * Ordering is `(ts, id)` — the id column breaks timestamp ties
    * deterministically. Filter null timestamps upstream when an
    * external replay must agree: Spark windows order nulls FIRST,
    * most SQL engines default to nulls LAST, and a null ts shifts
    * every frame in its key's partition. Emits the input plus `value_q`,
    * `roll_sum_q` (trailing `lookback`+current rows, partial windows
    * included at the head) and `delta_q` (null on each key's first
    * row).
    *
    * Scale shape: ONE hash shuffle on the key + a per-key sort shared
    * by both window functions (one Window node, same spec). A mega-key
    * is one task's sort — same boundary as sessionization; bucket time
    * into the key if a single key's history outgrows a task.
    */
  def rollingFeatures(events: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, valueCol: String,
                      lookback: Int = 3): DataFrame = {
    require(lookback >= 1, s"lookback must be >= 1; got $lookback")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val qv = floor(col(valueCol) * lit(1e6)).cast("long")
    events
      .withColumn("value_q", qv)
      .withColumn("roll_sum_q",
        sum(col("value_q")).over(w.rowsBetween(-lookback, 0)))
      .withColumn("delta_q",
        col("value_q") - lag(col("value_q"), 1).over(w))
  }
}
