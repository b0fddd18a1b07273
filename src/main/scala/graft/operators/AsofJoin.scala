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
  * `(ts, tag)` carries the last event's WHOLE row forward as one
  * struct (`last(_, ignoreNulls)` over an unbounded-preceding frame —
  * a single atomic carry, so a null payload value in the matched
  * event arrives as null rather than leaking an older event's stale
  * value), and the probe rows are filtered back out — one shuffle on
  * the key, linear state per partition, no per-probe binary search,
  * no range condition for the optimizer to mis-plan into a broadcast
  * nested loop. At equal timestamps the event sorts BEFORE the probe
  * (tag order), giving the standard inclusive `<=` semantics.
  *
  * Scale shape: cost is one hash shuffle of (events + probes) on the
  * key and a per-key sort — the same bound as any windowed gap
  * analysis; AQE cannot split a mega-key window, so a single key
  * carrying billions of events is the caller's signal to bucket time
  * (e.g. join on (key, day) with a per-day seed carried from the
  * previous day).
  *
  * Semantics edges (all matching SQL `ASOF LEFT JOIN ... ON
  * p.k = e.k AND p.ts >= e.ts`):
  *  - probes with no preceding event keep NULL `asof_*` columns;
  *  - event rows with a null ts or a NULL KEY drop (SQL equality
  *    never matches null keys); null-key and null-ts probes pass
  *    through unmatched;
  *  - multiple events tied on (key, ts) have no defined winner —
  *    SQL's ASOF is equally ambiguous there — so pre-aggregate the
  *    event side to unique (key, ts) when ties are possible (the
  *    driver query does); otherwise the pick is partition-order
  *    dependent.
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
    // probes keep every original column; events contribute ONE struct
    // (ts, payloads...) so the carry is atomic. Tag 0 = event, 1 =
    // probe: at equal ts the event sorts first (inclusive <=).
    val eSide = events
      .where(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
              lit(0).as("__tag"),
              struct(col(tsCol).as("ts") +:
                     payloads.map(c => col(c).as(c)): _*).as("__ev"))
    val pSide = probes
      .select(col(keyCol).as("__k") +: col(tsCol).as("__ts") +:
              lit(1).as("__tag") +:
              lit(null).cast(eSide.schema("__ev").dataType)
                .as("__ev") +:
              pCols.map(c => probes(c).as(s"__o_$c")): _*)
    val eSideAligned = eSide.select(
      pSide.columns.map(c =>
        if (eSide.columns.contains(c)) col(c)
        else lit(null).cast(pSide.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = eSideAligned.unionByName(pSide)
      .withColumn("__m", last(col("__ev"), ignoreNulls = true).over(w))
    carried.where(col("__tag") === 1)
      .select(pCols.map(c => col(s"__o_$c").as(c)) ++
              (col("__m").getField("ts").as("asof_ts") +:
               payloads.map(c =>
                 col("__m").getField(c).as(s"asof_$c"))): _*)
  }
}
