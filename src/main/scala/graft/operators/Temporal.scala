package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Retention cohort matrix: keys are cohorted by the epoch-period of
    * their FIRST event (`cohort = floorDiv(epoch_s(min ts), period)`),
    * and each (cohort, offset) cell counts the keys active again
    * `offset` periods after their cohort period (offset 0 = the cohort
    * size itself) — the classic week-over-week retention triangle, on
    * an integer-only surface (epoch floor-division period indices,
    * distinct-key counts).
    *
    * Plan shape: join-free — ONE per-key aggregate computes both the
    * cohort (min period) and the distinct active-period set in the
    * same pass (map-side partial merge; set size is bounded by the
    * number of periods in the data's time span, e.g. <=3653 for ten
    * years of days, never by row count), then an explode and one
    * final count bounded by cohorts x offsets. Each key contributes
    * each offset at most once by construction, so the final count is
    * a plain count, not a count-distinct — no Expand, no broadcast
    * dependency, and no key-side re-shuffle at any key cardinality.
    * Null-ts rows are excluded.
    */
  def retentionMatrix(events: DataFrame, keyCol: String, tsCol: String,
                      periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0,
      s"periodSeconds must be positive; got $periodSeconds")
    val per = expr(
      s"CAST(`${tsCol}` AS LONG) div ${periodSeconds}L")
    events.where(col(tsCol).isNotNull)
      .groupBy(col(keyCol).as("__k"))
      .agg(min(per).as("cohort"), collect_set(per).as("__ps"))
      .select(col("cohort"), explode(col("__ps")).as("__p"))
      .select(col("cohort"), (col("__p") - col("cohort")).as("offset"))
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("n_keys"))
  }

  /** Time-weighted totals over validity intervals (the consumer shape
    * of [[scd2Intervals]]): per key, `tw_sum = Σ value_q * duration`
    * and `dur_sum = Σ duration` in integer seconds, with open
    * intervals (null `valid_to`) clipped to `horizonEndSec` and
    * zero-length intervals contributing nothing. The time-weighted
    * average is `tw_sum / dur_sum` — derivable, never emitted (the
    * float-in-oracle discipline).
    *
    * One projection + one map-side-partial aggregate — no window, no
    * join: the interval rows already carry their own bounds.
    */
  def timeWeightedTotals(intervals: DataFrame, keyCol: String,
                         fromCol: String, toCol: String,
                         valueQCol: String,
                         horizonEndSec: Long): DataFrame = {
    val fromSec = col(fromCol).cast("long")
    val toSec = least(coalesce(col(toCol).cast("long"),
                               lit(horizonEndSec)),
                      lit(horizonEndSec))
    val dur = greatest(toSec - fromSec, lit(0L))
    intervals
      .where(fromSec < lit(horizonEndSec))
      .groupBy(col(keyCol))
      .agg(sum(col(valueQCol) * dur).as("tw_sum"),
           sum(dur).as("dur_sum"))
  }

  /** Calendar densification: per key, one row for EVERY period between
    * the key's first and last activity — zero-filled where no events
    * fell — so downstream rollups (dormancy, moving averages) see a
    * gap-free spine. Output: key, `period`, `n_events`.
    *
    * Join-free: one per-key aggregate builds (min, max, period→count
    * map) in a single pass — the map is bounded by the key's ACTIVE
    * period count, the spine by its span — then the spine explodes
    * from `sequence(min, max)` and reads the map. A key whose span
    * outgrows a task (decades of seconds-granularity periods) needs a
    * coarser period or a span cap by problem definition; the row
    * explosion IS the requested output.
    */
  def densify(events: DataFrame, keyCol: String, tsCol: String,
              periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0,
      s"periodSeconds must be positive; got $periodSeconds")
    val per = expr(s"CAST(`${tsCol}` AS LONG) div ${periodSeconds}L")
    events.where(col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), per.as("__p"))
      .groupBy("__k", "__p").agg(count(lit(1)).as("__n"))
      .groupBy("__k")
      .agg(min(col("__p")).as("__mn"), max(col("__p")).as("__mx"),
           map_from_entries(collect_list(struct(col("__p"), col("__n"))))
             .as("__m"))
      .select(col("__k"), col("__m"),
              explode(sequence(col("__mn"), col("__mx"))).as("period"))
      .select(col("__k").as(keyCol), col("period"),
              coalesce(element_at(col("__m"), col("period")), lit(0L))
                .as("n_events"))
  }

  /** Longest activity streak per key: the maximum run of CONSECUTIVE
    * periods (days, weeks — `periodSeconds`) in which the key had at
    * least one event. Gaps-and-islands on integer period indices:
    * island id = period - row_number over the key's distinct periods
    * (consecutive periods share it), streak = island size, result =
    * per-key max. Null-ts rows are excluded.
    *
    * Plan shape: the distinct (key, period) pairs aggregate map-side
    * first, then ONE hash shuffle on the key covers the row_number
    * window and both group-bys above it (same-key partitioning
    * reused); per-key window input is bounded by the time span's
    * period count, like [[retentionMatrix]]'s sets.
    */
  def activityStreaks(events: DataFrame, keyCol: String, tsCol: String,
                      periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0,
      s"periodSeconds must be positive; got $periodSeconds")
    val per = expr(s"CAST(`${tsCol}` AS LONG) div ${periodSeconds}L")
    val w = Window.partitionBy("__k").orderBy("__p")
    events.where(col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), per.as("__p"))
      .distinct()
      .withColumn("__island", col("__p") - row_number().over(w))
      .groupBy("__k", "__island")
      .agg(count(lit(1)).as("__len"))
      .groupBy(col("__k").as(keyCol))
      .agg(max(col("__len")).as("max_streak"))
  }

  /** Event throttle (debounce): drop events closer than `gapSeconds`
    * to the key's PREVIOUS event in the `(sec, idCol)` total order —
    * the burst-thinning filter in front of alerting or feature
    * pipelines. Lag-based semantics (gap measured to the previous raw
    * event, kept or not), which is windowable in one pass and
    * replayable in SQL; greedy anchor-to-last-KEPT debounce is a
    * different operator and needs a stateful scan. A key's first
    * event always survives; null-ts rows are excluded.
    *
    * One key shuffle + one in-partition sort (the gaps-and-islands
    * bound); all original columns pass through.
    */
  def throttle(events: DataFrame, keyCol: String, tsCol: String,
               idCol: String, gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0,
      s"gapSeconds must be positive; got $gapSeconds")
    val sec = col(tsCol).cast("long")
    val w = Window.partitionBy(keyCol).orderBy(sec, col(idCol))
    events.where(col(tsCol).isNotNull)
      .withColumn("__prev_sec", lag(sec, 1).over(w))
      .where(col("__prev_sec").isNull ||
             sec - col("__prev_sec") >= gapSeconds)
      .drop("__prev_sec")
  }

  /** Snapshot diff (CDC): compare two keyed snapshots of the same
    * table and emit one row per changed key — `change` is `'I'` (in
    * new only), `'D'` (in old only), or `'U'` (present in both with
    * any `compareCols` value differing, null-safely). Unchanged keys
    * are dropped — at 100 TB the diff output is proportional to the
    * churn, not the table. Keys must be unique within each snapshot
    * (the CDC precondition); output carries the key columns + change.
    *
    * Plan shape: one full-outer shuffle join on the key over scans
    * pruned to key + compare columns; AQE skew-split applies (it is a
    * join, not a window). The presence test rides a non-null literal
    * per side, so a snapshot whose compare columns are all null still
    * diffs correctly.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_old", lit(1))
      .toDF(keyCols.map("__ko_" + _) ++ compareCols.map("__o_" + _)
              :+ "__in_old": _*)
    val n = newDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__in_new", lit(1))
      .toDF(keyCols.map("__kn_" + _) ++ compareCols.map("__n_" + _)
              :+ "__in_new": _*)
    val joinCond = keyCols.map(k =>
      col("__ko_" + k) === col("__kn_" + k)).reduce(_ && _)
    val differs = compareCols
      .map(c => !(col("__o_" + c) <=> col("__n_" + c)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val change = when(col("__in_old").isNull, "I")
      .when(col("__in_new").isNull, "D")
      .when(differs, "U")
    o.join(n, joinCond, "full_outer")
      .withColumn("change", change)
      .where(col("change").isNotNull)
      .select(keyCols.map(k =>
        coalesce(col("__ko_" + k), col("__kn_" + k)).as(k))
          :+ col("change"): _*)
  }

  /** Interval-union coverage per key: total seconds covered by the
    * union of the key's half-open `[startSec, endSec)` intervals, with
    * the merged-interval count — the uptime/SLA aggregate. Overlapping
    * AND touching intervals merge (`[1,2) ∪ [2,3)` is one covered run
    * of 2; for pure length the distinction is immaterial, for
    * `n_merged` it makes adjacency one run, matching how an uptime
    * report reads). Gaps-and-islands: a new run starts where the start
    * exceeds the running max of all previous ends; per-run coverage is
    * `max(end) − min(start)`. Zero/negative-length inputs are dropped.
    *
    * Plan shape: one shuffle on the key, one in-partition sort (the
    * shared gaps-and-islands bound: a single key's history is one
    * task's sort — day-split into the key first via
    * [[peakConcurrency]]'s segment trick if a key outgrows a task),
    * then two bounded aggregates. Integer-only output.
    */
  def intervalUnion(df: DataFrame, keyCol: String, startSecCol: String,
                    endSecCol: String): DataFrame = {
    val iv = df
      .where(col(startSecCol).isNotNull && col(endSecCol).isNotNull &&
             col(endSecCol) > col(startSecCol))
      .select(col(keyCol).as("k"), col(startSecCol).cast("long").as("s"),
              col(endSecCol).cast("long").as("e"))
    val wPrev = Window.partitionBy("k").orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("k").orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv
      .withColumn("__pmax", max(col("e")).over(wPrev))
      .withColumn("__new",
        when(col("__pmax").isNull || col("s") > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__run", sum(col("__new")).over(wRun))
      .groupBy(col("k"), col("__run"))
      .agg((max("e") - min("s")).as("__cov"),
           count(lit(1)).as("__n"))
      .groupBy(col("k").as(keyCol))
      .agg(sum("__cov").as("covered_sec"),
           count(lit(1)).as("n_merged"),
           sum("__n").as("n_input"))
  }

  /** Peak interval concurrency per key: the sweep-line maximum of
    * simultaneously-open `[startSec, endSec)` intervals, reported per
    * (key, UTC day). The classic sweep is a global sort with a running
    * +1/-1 sum — a single reducer; this one restores scale by
    * day-splitting every interval first (a `sequence` generator, no
    * shuffle), so the running sum windows over (key, day) partitions
    * whose size is bounded by one key-day's traffic, never the whole
    * table. Multi-day intervals contribute a clipped segment to each
    * day they cross, so within-day concurrency is exact; a segment
    * that ends exactly where another begins does NOT overlap it
    * (half-open intervals: the `-1` sorts before the tied `+1`).
    *
    * Zero/negative-length intervals are dropped (a half-open `[t, t)`
    * is empty). Output: one row per (key, day) with its peak and the
    * number of interval-segments that day — integer-only.
    */
  /** MERGE INTO (lakehouse upsert): apply a changelog to a snapshot.
    * `changes` carries the snapshot's columns plus `opCol` (`"U"` =
    * insert-or-update, `"D"` = delete) and `orderCols` sequencing the
    * log. Multiple ops on one key compact to the latest (max
    * `orderCols`, later columns break ties) BEFORE application, so a
    * U followed by a D deletes and a D followed by a U resurrects —
    * Delta/Iceberg MERGE semantics without a table format.
    *
    * Plan shape: compaction is one `max_by`-style struct-max aggregate
    * on the key (map-side partial, O(1) state per key — no window
    * sort); application is a left-anti join of the snapshot against
    * the compacted keys plus a union of the surviving upserts. Both
    * sides shuffle on the SAME key columns, so at 100 TB the big
    * snapshot shuffles once; when the changelog is small Spark/AQE
    * broadcasts it and the snapshot never shuffles at all. Delete
    * ops whose key was never in the snapshot are no-ops (standard
    * MERGE `WHEN NOT MATCHED AND op='D' THEN skip`).
    */
  def mergeUpsert(snapshot: DataFrame, changes: DataFrame,
                  keyCols: Seq[String], opCol: String,
                  orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "mergeUpsert needs at least one key column")
    require(orderCols.nonEmpty,
      "mergeUpsert needs ordering columns to sequence the changelog")
    val payload = snapshot.columns.toSeq
    // struct-max compaction: (orderCols..., op, payload...) — the max
    // struct IS the latest op + its full row, one aggregate, no window
    val packed = struct(
      (orderCols.map(col) :+ col(opCol)) ++ payload.map(col): _*)
    val latest = changes
      .groupBy(keyCols.map(col): _*)
      .agg(max(packed).as("__last"))
    val upserts = latest
      .where(col(s"__last.$opCol") === "U")
      .select(payload.map(c => col(s"__last.$c").as(c)): _*)
    val touchedKeys = latest.select(keyCols.map(col): _*)
    snapshot
      .join(touchedKeys, keyCols, "left_anti")
      .unionByName(upserts)
  }

  /** Survival life table over key lifetimes: each key lives
    * `duration = lastPeriod - firstPeriod` periods (epoch
    * floor-division on `tsCol`); a key whose last activity precedes
    * the corpus-wide maximum period is an observed churn at its
    * duration, a key active in the final period is right-censored
    * (its true lifetime is only known to be >= duration). Output is
    * the classic life table — one row per distinct duration with
    * `n_risk` (keys whose lifetime reaches the duration), `n_events`
    * (observed churns at it), `n_censored` — the integer-exact input
    * to any Kaplan-Meier estimate, which is a per-row division away.
    *
    * Plan shape: one per-key min/max aggregate (map-side partial), a
    * scalar max broadcast for the censoring horizon, then a
    * per-duration count and a reversed running sum over the duration
    * axis — the window sorts at most one row per distinct duration
    * (<=3653 for ten years of days), never row count. Null-ts rows
    * are excluded.
    */
  def lifeTable(events: DataFrame, keyCol: String, tsCol: String,
                periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0,
      s"periodSeconds must be positive; got $periodSeconds")
    val per = expr(s"CAST(`${tsCol}` AS LONG) div ${periodSeconds}L")
    val spans = events.where(col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), per.as("p"))
      .groupBy("k")
      .agg(min("p").as("first_p"), max("p").as("last_p"))
    val horizon = spans.agg(max("last_p").as("max_p"))
    val marked = spans.crossJoin(broadcast(horizon))
      .select((col("last_p") - col("first_p")).as("duration"),
              (col("last_p") < col("max_p")).cast("long").as("churn"))
    val byDur = marked.groupBy("duration")
      .agg(sum("churn").as("n_events"),
           (count(lit(1)) - sum("churn")).as("n_censored"))
    // at-risk(d) = every key whose lifetime reaches d = suffix sum
    val wSuffix = graft.core.Windows.bounded(col("duration").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDur
      .withColumn("n_risk",
        sum(col("n_events") + col("n_censored")).over(wSuffix))
      .select(col("duration"), col("n_risk"),
              col("n_events"), col("n_censored"))
  }

  def peakConcurrency(df: DataFrame, keyCol: String, startSecCol: String,
                      endSecCol: String, idCol: String): DataFrame = {
    val day = 86400L
    val iv = df
      .where(col(startSecCol).isNotNull && col(endSecCol).isNotNull &&
             col(endSecCol) > col(startSecCol))
      .select(col(keyCol).as("k"), col(idCol).as("i"),
              col(startSecCol).cast("long").as("s"),
              col(endSecCol).cast("long").as("e"))
    // day-split: [s, e) -> one clipped segment per crossed day. The
    // end point is exclusive, so an interval ending ON midnight owns
    // no segment in the next day: day span uses e-1.
    val seg = iv
      .withColumn("d", explode(sequence(expr(s"s div ${day}L"),
                                        expr(s"(e - 1) div ${day}L"))))
      .select(col("k"), col("i"), col("d"),
              greatest(col("s"), col("d") * day).as("ss"),
              least(col("e"), (col("d") + 1) * day).as("se"))
    // sweep: -1 (delta) sorts before +1 at the same instant -> a
    // segment touching another end-to-start never counts as overlap
    val pts = seg.select(col("k"), col("d"), col("ss").as("t"),
                         lit(1).as("delta"), col("i"))
      .unionByName(seg.select(col("k"), col("d"), col("se").as("t"),
                              lit(-1).as("delta"), col("i")))
    val wSweep = Window.partitionBy("k", "d")
      .orderBy(col("t"), col("delta"), col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("__open", sum(col("delta")).over(wSweep))
      .groupBy(col("k").as(keyCol), col("d").as("day"))
      .agg(max("__open").cast("long").as("peak"),
           expr("CAST(count(1) div 2 AS BIGINT)").as("n_segments"))
  }

  /** Period-over-period deltas — the WoW/MoM trend report: per
    * (group, period) counts self-joined against the period
    * `lagPeriods` back BY VALUE (a row-offset window would silently
    * compare against the wrong week across gaps), with the integer
    * delta and a ppm rate (`delta*1e6 div prev`, truncated toward
    * zero exactly like the SQL replay's `//`). Two copies of the same
    * periods-sized aggregate join on (group, period) — the raw scan
    * happens once, everything after is calendar-bounded. `prev_n`,
    * `delta`, `delta_ppm` are null where no prior period exists.
    */
  def periodDeltas(events: DataFrame, tsCol: String, groupCol: String,
                   periodSeconds: Long, lagPeriods: Int): DataFrame = {
    require(periodSeconds > 0 && lagPeriods > 0, "positive period/lag")
    val per = events.where(col(tsCol).isNotNull)
      .groupBy(col(groupCol),
               expr(s"cast(cast($tsCol as timestamp) as long) " +
                    s"div ${periodSeconds}L").as("period"))
      .agg(count(lit(1)).as("n"))
    // NOT persisted (r13): both self-join sides read the identical
    // grouped-count subtree — exchange reuse dedupes to one scan (see
    // growthAccounting)
    val prev = per.select(col(groupCol),
                          (col("period") + lagPeriods).as("period"),
                          col("n").as("prev_n"))
    per.join(prev, Seq(groupCol, "period"), "left")
      .select(col(groupCol), col("period"), col("n"), col("prev_n"),
              (col("n") - col("prev_n")).as("delta"),
              when(col("prev_n") > 0,
                   expr("((n - prev_n) * 1000000L) div prev_n"))
                .as("delta_ppm"))
      .orderBy(groupCol, "period")
  }

  /** LOCF gap fill (last observation carried forward) — the
    * time-series imputation step: densify each key's period spine to
    * the CORPUS-WIDE [min, max] period range, then fill missing
    * periods with the key's latest earlier observation. The fill is a
    * `last_value(ignoreNulls)` window inside the key (one key shuffle,
    * spine rows ride along); periods before a key's first observation
    * stay null (nothing to carry). Output: `(key, period, n, filled)`
    * where `filled` is the carried/observed value and `n` is null on
    * spine rows — all integer.
    */
  def locfFill(events: DataFrame, keyCol: String, tsCol: String,
               periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0, "positive period")
    val per = events.where(col(tsCol).isNotNull)
      .groupBy(col(keyCol),
               expr(s"cast(cast($tsCol as timestamp) as long) " +
                    s"div ${periodSeconds}L").as("period"))
      .agg(count(lit(1)).as("n"))
    // NOT persisted (r13): spine bounds, keys and observations all
    // read the identical grouped-count subtree — exchange reuse
    // dedupes to one scan (see growthAccounting)
    val bounds = per.agg(min("period").as("__mn"), max("period").as("__mx"))
    val spine = per.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol),
              explode(sequence(col("__mn"), col("__mx"))).as("period"))
    val w = Window.partitionBy(keyCol).orderBy("period")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(per, Seq(keyCol.toString, "period"), "left")
      .withColumn("filled",
                  last(col("n"), ignoreNulls = true).over(w))
      .orderBy(keyCol, "period")
  }

  /** Growth accounting — the canonical DAU decomposition: every
    * (user, day) active pair is exactly one of NEW (first day ever),
    * RETAINED (also active the previous day), or RESURRECTED (seen
    * before, but not yesterday); CHURNED at day d counts users active
    * at d-1 and silent at d. Identities `new+retained+resurrected =
    * dau` and `churned(d) = dau(d-1) - retained(d)` hold row-exactly.
    *
    * Shape: one distinct over (user, day), a per-user min-day
    * aggregate joined back on user, a self-join on (user, day-1) for
    * the yesterday flag, then a days-sized rollup — every join is a
    * plain equi-join on already-aggregated rows. Output per observed
    * day: `day, dau, n_new, n_retained, n_resurrected, n_churned`.
    */
  def growthAccounting(events: DataFrame, keyCol: String,
                       tsCol: String): DataFrame = {
    val ud = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("u"),
              expr(s"cast(cast($tsCol as timestamp) as long) div 86400")
                .as("day"))
      .distinct()
    // NOT persisted (r13): all four readers consume `ud` through the
    // IDENTICAL scan+partial-agg+Exchange(u,day) subtree, which runtime
    // exchange reuse dedupes to one events scan within the single
    // action — the persist only added an InMemoryRelation build plus
    // cached-read tasks per reader (the seasonalAnomalies finding)
    val firstDay = ud.groupBy("u").agg(min("day").as("__first"))
    val yesterday = ud.select(col("u"), (col("day") + 1L).as("day"),
                              lit(1L).as("__yday"))
    val flagged = ud
      .join(firstDay, Seq("u"))
      .join(yesterday, Seq("u", "day"), "left")
      .select(col("day"),
              when(col("day") === col("__first"), 1L).otherwise(0L)
                .as("__new"),
              when(col("__yday").isNotNull, 1L).otherwise(0L)
                .as("__ret"))
    val perDay = flagged.groupBy("day")
      .agg(count(lit(1)).as("dau"), sum("__new").as("n_new"),
           sum("__ret").as("n_retained"),
           (count(lit(1)) - sum("__new") - sum("__ret"))
             .as("n_resurrected"))
    // churned(d) = active(d-1) minus retained-into-d; emitted on day d
    // for every observed day (0 when d-1 was unobserved)
    val prevDau = perDay.select((col("day") + 1L).as("day"),
                                col("dau").as("__prev_dau"))
    perDay
      .join(prevDau, Seq("day"), "left")
      .withColumn("n_churned",
        coalesce(col("__prev_dau"), lit(0L)) -
          when(col("__prev_dau").isNull, 0L).otherwise(col("n_retained")))
      .select(col("day"), col("dau"), col("n_new"), col("n_retained"),
              col("n_resurrected"), col("n_churned"))
      .orderBy("day")
  }

  /** Exact rolling 7-day actives — the DAU/WAU pair, computed WITHOUT
    * a distinct-over-window (not decomposable) via the coverage
    * explode: each distinct (user, day) covers days `[day, day+6]`,
    * so `wau7(d) = |distinct (user, cover=d)|`. The explode factor is
    * a constant 7; both distincts are ordinary grouped shuffles —
    * this is the scale-safe shape for any trailing-window distinct.
    * Output one row per OBSERVED day: `day` (epoch day), `dau`,
    * `wau7` (trailing, partial at the range start by definition).
    */
  def rollingActive(events: DataFrame, keyCol: String,
                    tsCol: String): DataFrame = {
    val ud = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("u"),
              expr(s"cast(cast($tsCol as timestamp) as long) div 86400")
                .as("day"))
      .distinct()
    // NOT persisted (r13): dau and wau read `ud` through the identical
    // distinct subtree — exchange reuse dedupes to one scan (see
    // growthAccounting)
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("u"), explode(sequence(col("day"), col("day") + 6))
                .as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau7"))
    dau.join(wau, Seq("day")) // inner: only observed days emit
      .orderBy("day")
  }

  /** Inter-arrival-gap profile — the traffic-modeling companion of
    * [[Sessionize]]: per-key consecutive event gaps in whole seconds
    * (total order `(ts, idCol)` inside the key, so simultaneous
    * events replay identically), reduced to one corpus row of gap
    * facts: `n_gaps`, `min_gap_s`, `max_gap_s`, `sum_gap_s`, and the
    * exact discrete median `p50_gap_s` (the ceil(n/2)-th smallest
    * stored gap via [[Histograms.groupedDiscreteQuantile]]'s bucketed
    * crossing — no whole-histogram sort). One key shuffle covers the
    * lag window; each key's history is one task's sort, the
    * gaps-and-islands bound.
    */
  def eventGapProfile(events: DataFrame, keyCol: String, tsCol: String,
                      idCol: String): DataFrame = {
    // NTZ parquet timestamps refuse a direct long cast — route via
    // TIMESTAMP (the retention-matrix convention)
    val sec = col(tsCol).cast("timestamp").cast("long")
    val w = Window.partitionBy(keyCol).orderBy(sec, col(idCol))
    val gaps = events
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__gap", sec - lag(sec, 1).over(w))
      .where(col("__gap").isNotNull)
      .select(col("__gap"))
    // NOT persisted (r13): the median crossing and the totals row both
    // consume the window output through the identical
    // scan+Exchange(key) subtree — exchange reuse dedupes the scan; the
    // lag window re-runs per branch but is cheap next to the cache
    // build it replaces (see growthAccounting)
    val p50 = Histograms
      .groupedDiscreteQuantile(gaps.withColumn("__g", lit(1)),
                               "__g", "__gap", 1, 2)
      .select(col("quantile").as("p50_gap_s"))
    // LEFT join, not cross: a gap-free corpus leaves the median table
    // EMPTY, and a cross join would erase the totals row with it
    gaps.agg(count(lit(1)).as("n_gaps"), min("__gap").as("min_gap_s"),
             max("__gap").as("max_gap_s"), sum("__gap").as("sum_gap_s"))
      .join(broadcast(p50), lit(true), "left")
  }

  /** Vintage curves: cumulative event rate by age for each
    * origination cohort — the credit-risk "vintage analysis" view
    * (does the 2024-03 cohort default faster at month 6 than the
    * 2024-01 cohort did?). Input is one row per exposure with its
    * cohort key, integer age at observation, and 0/1 event flag.
    *
    * ONE aggregate keyed on (cohort, age), then the cumulative sum
    * and cohort totals run on the (cohorts x ages)-bounded table with
    * windows PARTITIONED by cohort — never a window over raw rows.
    * Rates are truncated-ppm BIGINTs of non-negative integers (no
    * float division, no floor-vs-truncate ambiguity). Ages with zero
    * exposures emit no row (the curve is read as a step function);
    * callers needing a dense age spine can densify the bounded output.
    */
  def vintageCurves(facts: DataFrame, cohortCol: Column, ageCol: Column,
                    eventCol: Column): DataFrame = {
    val byCell = facts
      .groupBy(cohortCol.as("cohort"), ageCol.as("age"))
      .agg(count(lit(1)).as("n"),
           sum(eventCol.cast("long")).as("n_event"))
    val cum = Window.partitionBy("cohort").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("cohort")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byCell
      .withColumn("cum_event", sum("n_event").over(cum))
      .withColumn("n_cohort", sum("n").over(tot))
      .select(col("cohort"), col("age"), col("n"), col("n_event"),
              col("cum_event"), col("n_cohort"),
              expr("(1000000 * cum_event) div n_cohort").as("rate_ppm"))
      .orderBy("cohort", "age")
  }
}
