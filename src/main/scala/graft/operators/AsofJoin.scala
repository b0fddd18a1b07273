package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (AS-OF) join — the feature-store / backtest lookup
  * Spark has no native operator for: every probe row (key, ts) picks
  * the LATEST event row of the same key with event ts <= probe ts,
  * never a later one (no leakage). DuckDB's native `ASOF JOIN` is the
  * correctness oracle.
  *
  * Spark-first shape: NOT a join. Both sides union into one stream
  * tagged probe/event, ONE window partitioned by key and ordered by
  * `(ts, tag)` carries the last event's payload forward
  * (`last(_, ignoreNulls)` over an unbounded-preceding frame), and the
  * probe rows are filtered back out — one shuffle on the key, linear
  * state per partition, no per-probe binary search, no range
  * condition for the optimizer to mis-plan into a broadcast
  * nested-loop. At equal timestamps the event sorts BEFORE the probe
  * (tag order), giving the standard inclusive `<=` semantics.
  *
  * Scale shape: cost is one hash shuffle of (events + probes) on the
  * key and a per-key sort — the same bound as any windowed gap
  * analysis; AQE cannot split a mega-key window, so a single key
  * carrying billions of events is the caller's signal to bucket time
  * (e.g. join on (key, day) with a per-day seed carried from the
  * previous day).
  *
  * Probe rows with no preceding event keep NULL payloads (left-join
  * semantics). Event rows with null ts are dropped (they order
  * nowhere); probe rows with null ts pass through unmatched.
  */
object AsofJoin {

  /** @param probes   (key, ts) rows asking "state as of ts"
    * @param events   (key, ts, payload...) rows supplying state
    * @param keyCol   join key column name (both sides)
    * @param tsCol    event-time column name (both sides)
    * @param payloads event payload column names carried to the output;
    *                 each arrives as `asof_<name>` (NULL when no event
    *                 precedes the probe), plus `asof_ts` — the matched
    *                 event's timestamp.
    */
  def asofJoin(probes: DataFrame, events: DataFrame,
               keyCol: String, tsCol: String,
               payloads: Seq[String]): DataFrame = {
    require(payloads.nonEmpty, "payloads must name at least one column")
    val pCols = probes.columns
    // probes keep every original column; events contribute only
    // (key, ts, payloads). Tag 0 = event, 1 = probe: at equal ts the
    // event sorts first, so the probe sees it (inclusive <=).
    val eSide = events
      .where(col(tsCol).isNotNull)
      .select(col(keyCol).as("__k") +: col(tsCol).as("__ts") +:
              lit(0).as("__tag") +:
              col(tsCol).as("__ets") +:
              payloads.map(c => col(c).as(s"__p_$c")): _*)
    val pSide = probes
      .select(col(keyCol).as("__k") +: col(tsCol).as("__ts") +:
              lit(1).as("__tag") +:
              lit(null).cast(eSide.schema("__ets").dataType)
                .as("__ets") +:
              (payloads.map(c =>
                 lit(null).cast(eSide.schema(s"__p_$c").dataType)
                   .as(s"__p_$c")) ++
               pCols.map(c => probes(c).as(s"__o_$c"))): _*)
    val eSideAligned = eSide.select(
      pSide.columns.map(c =>
        if (eSide.columns.contains(c)) col(c)
        else lit(null).cast(pSide.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = eSideAligned.unionByName(pSide)
      .withColumn("asof_ts", last(col("__ets"), ignoreNulls = true)
        .over(w))
      .withColumns(payloads.map(c => s"asof_$c" -> last(
        col(s"__p_$c"), ignoreNulls = true).over(w)).toMap)
    carried.where(col("__tag") === 1)
      .select(pCols.map(c => col(s"__o_$c").as(c)) ++
              (col("asof_ts") +: payloads.map(c => col(s"asof_$c"))): _*)
  }
}
