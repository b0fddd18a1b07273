package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal-table operators over keyed event streams: the
  * slowly-changing-dimension (SCD type 2) interval build that turns a
  * change log into validity intervals, and the first-order transition
  * (Markov) counts behind user-journey analysis. Both are one hash
  * shuffle on the key + window passes inside it — the gaps-and-islands
  * cost bound; a single key's full history is one task's sort, so
  * bucket time into the key if a key outgrows a task (the
  * [[AsofJoin]] contract).
  */
object Temporal {

  /** SCD2 interval build: each (key, ts, value...) change row becomes a
    * validity interval `[ts, next change ts)`; the key's latest row is
    * open-ended (`valid_to` null). Rows are ordered by `(ts, idCol)` —
    * the id breaks timestamp ties deterministically, and each tied
    * earlier row gets a zero-length interval closed by its tie-mate
    * (never dropped: auditability over elegance). Null-ts rows are
    * excluded (they carry no position on the validity axis).
    *
    * Feed the result to [[RangeJoin]] for point-in-time enrichment, or
    * query it directly — this is the batch backfill shape of a feature
    * store's history table.
    */
  def scd2Intervals(changes: DataFrame, keyCol: String, tsCol: String,
                    idCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    changes.where(col(tsCol).isNotNull)
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
  }

  /** First-order transition counts of `typeCol` per key: one row per
    * observed (prev_type, type) pair with its occurrence count across
    * all keys — the Markov-chain aggregate behind journey/funnel
    * diagnostics. Each key's first event has no predecessor and is not
    * counted as a transition. Ordering is `(ts, idCol)`; null-ts rows
    * are excluded.
    */
  def transitionCounts(events: DataFrame, keyCol: String, tsCol: String,
                       idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    events.where(col(tsCol).isNotNull)
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .where(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_type"), col(typeCol).as("type"))
      .agg(count(lit(1)).as("n"))
  }
}
