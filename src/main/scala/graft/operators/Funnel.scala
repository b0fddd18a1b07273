package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence conversion funnel over an event stream: for an
  * ordered list of step types (e.g. signup -> view -> click ->
  * purchase), a user converts through step i when they have a step-i
  * event STRICTLY AFTER their (earliest-completion) step-(i-1) event.
  * The per-user step time is the earliest such event — the canonical
  * greedy funnel, which maximizes the number of users reaching every
  * later step (any other witness choice for step i-1 only shrinks the
  * set of admissible step-i events).
  *
  * Plan shape: one filtered min-timestamp aggregate per step, chained
  * by an inner equi-join on the user key. Every aggregate is map-side
  * partial (a per-user min), every join is on the same user key — with
  * AQE the post-step-1 sides shrink monotonically (a funnel, by
  * definition) and auto-broadcast as soon as they fit, so at 100 TB the
  * cost is one shuffle of the per-step event subsets on user, never a
  * window over a user's full history and never a driver collect. Step
  * count is a query constant (funnel definitions are 3-7 steps), so the
  * join chain depth is bounded and Catalyst sees it whole.
  *
  * Strict `>` between consecutive steps matches the usual funnel
  * semantics (one event cannot witness two steps); events tied on
  * timestamp across different steps do NOT chain. Ties within one
  * step are harmless (min picks the time, not a row).
  *
  * Returns one row per user with `step_ts_1..k` (null once the user
  * drops out) — feed to [[funnelCounts]] for the classic funnel report.
  */
object Funnel {

  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events
      .where(col(typeCol) === steps.head && col(tsCol).isNotNull)
      .groupBy(col(userCol).as("user"))
      .agg(min(col(tsCol)).as("step_ts_1"))
    steps.zipWithIndex.tail.foldLeft(first) { case (acc, (step, i)) =>
      val prev = s"step_ts_$i"
      val cur = s"step_ts_${i + 1}"
      val nxt = events
        .where(col(typeCol) === step && col(tsCol).isNotNull)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
      acc.join(nxt, col("user") === col("__u") &&
                    col("__ts") > col(prev), "left")
        .groupBy((col("user") +: (1 to i).map(j => col(s"step_ts_$j")))
                   : _*)
        .agg(min(col("__ts")).as(cur))
    }
  }

  /** The funnel report: per step, how many users reached it and an
    * id checksum of who — integer-only, oracle-friendly.
    *
    * ONE pass over the (per-user) funnel times: every step's
    * (count, checksum) comes from a single global aggregate —
    * `count(step_ts_i)` counts non-null completions — and `stack`
    * melts the one aggregate row to the per-step report. A
    * union-of-filters would recompute the whole join chain per step
    * (k branches x k-stage chain = O(k^2) event scans).
    */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String]): DataFrame = {
    val times = funnelTimes(events, userCol, tsCol, typeCol, steps)
    val aggs = steps.indices.flatMap { i =>
      Seq(count(col(s"step_ts_${i + 1}")).as(s"__n_$i"),
          sum(when(col(s"step_ts_${i + 1}").isNotNull, col("user")))
            .as(s"__s_$i"))
    }
    val one = times.agg(aggs.head, aggs.tail: _*)
    val stackArgs = steps.indices.map { i =>
      s"${i + 1}, '${steps(i).replace("'", "''")}', __n_$i, __s_$i"
    }.mkString(", ")
    one.selectExpr(
      s"stack(${steps.size}, $stackArgs) AS " +
        "(step, step_type, n_users, sum_user)")
      .orderBy("step")
  }

  /** Last-touch attribution: each conversion event is credited to the
    * channel (event type) of the key's most recent touch event
    * STRICTLY before it and within `lookbackSeconds`; conversions with
    * no admissible touch credit `"direct"`. One row per conversion:
    * key cols + conversion id + `channel`.
    *
    * Integer-exact by construction: ordering is (epoch second, event
    * id) — a total order — and the window carries the touch's second
    * and type from the same last non-null row, so the SQL replay's
    * `last_value(... IGNORE NULLS)` picks identically.
    *
    * Plan shape: one shuffle on the key, one in-partition sort (the
    * gaps-and-islands bound shared with [[Temporal.transitionCounts]]);
    * rows not in `touchTypes + convType` are filtered before the
    * shuffle, so at 100 TB the window input is the touch+conversion
    * subset, not the full event stream.
    */
  def lastTouchAttribution(events: DataFrame, keyCol: String,
                           tsCol: String, idCol: String, typeCol: String,
                           touchTypes: Seq[String], convType: String,
                           lookbackSeconds: Long): DataFrame = {
    require(lookbackSeconds > 0,
      s"lookbackSeconds must be positive; got $lookbackSeconds")
    import org.apache.spark.sql.expressions.Window
    val sec = col(tsCol).cast("long")
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val w = Window.partitionBy(keyCol).orderBy(col("__sec"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .where(col(tsCol).isNotNull &&
             (isTouch || col(typeCol) === convType))
      // project to the four live columns BEFORE the key shuffle — the
      // window must not carry payload columns the output drops anyway
      .select(col(keyCol), col(idCol), col(typeCol), sec.as("__sec"))
      .select(col(keyCol), col(idCol), col(typeCol), col("__sec"),
              last(when(isTouch, col("__sec")), ignoreNulls = true)
                .over(w).as("__t_sec"),
              last(when(isTouch, col(typeCol)), ignoreNulls = true)
                .over(w).as("__t_type"))
      .where(col(typeCol) === convType)
      .select(col(keyCol), col(idCol),
              when(col("__t_sec").isNotNull &&
                   col("__sec") - col("__t_sec") <= lookbackSeconds,
                   col("__t_type")).otherwise("direct").as("channel"))
  }

  /** Top-k session paths: sessionize by inactivity gap, render each
    * session's first `maxSteps` event types as a `>`-joined path
    * string, and count sessions per path — the journey/Sankey
    * aggregate behind "what do users actually do" questions. Event
    * order inside a session is `(ts, idCol)` (the id breaks timestamp
    * ties deterministically); sessions longer than `maxSteps` keep
    * their prefix with a `>…` suffix so truncated paths never collide
    * with genuinely-short ones. Returned rows are the `k` most common
    * paths, ties broken by path string ascending.
    *
    * Plan shape: one shuffle on the key with two window passes inside
    * it (gap flags + in-session row numbers — same sort, Spark reuses
    * it), then the per-session path folds through a bounded
    * `sort_array(collect_list(...))` of at most `maxSteps` structs per
    * session, a path-count aggregate whose cardinality is the number
    * of DISTINCT paths (tiny), and a TakeOrdered top-k — no global
    * sort. Null-ts rows are excluded.
    */
  def topPaths(events: DataFrame, keyCol: String, tsCol: String,
               idCol: String, typeCol: String, gapSeconds: Long,
               maxSteps: Int, k: Int): DataFrame = {
    require(gapSeconds > 0 && maxSteps > 0 && k > 0,
      s"gapSeconds/maxSteps/k must be positive; " +
        s"got $gapSeconds/$maxSteps/$k")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(keyCol).orderBy(col("__sec"), col(idCol))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding,
                                Window.currentRow)
    val steps = events.where(col(tsCol).isNotNull)
      .select(col(keyCol), col(idCol), col(typeCol),
              col(tsCol).cast("long").as("__sec"))
      .withColumn("__new",
        when(col("__sec") - lag(col("__sec"), 1).over(wOrd)
               > gapSeconds, 1L).otherwise(
          when(lag(col("__sec"), 1).over(wOrd).isNull, 1L)
            .otherwise(0L)))
      .withColumn("__sess", sum(col("__new")).over(wRun))
      .withColumn("__step", row_number().over(
        Window.partitionBy(col(keyCol), col("__sess"))
          .orderBy(col("__sec"), col(idCol))))
    val paths = steps
      .groupBy(col(keyCol), col("__sess"))
      .agg(max(col("__step")).as("__len"),
           array_join(
             transform(
               sort_array(collect_list(
                 when(col("__step") <= maxSteps,
                      struct(col("__step"), col(typeCol).as("t"))))),
               s => s.getField("t")),
             ">").as("__prefix"))
      .select(concat(col("__prefix"),
                     when(col("__len") > maxSteps, lit(">…"))
                       .otherwise(lit(""))).as("path"))
    paths.groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Behavioral cohort bitmask census — the audience-segmentation
    * query ("users who purchased AND clicked but never viewed"): each
    * user folds into one bit per tracked event type (bit i set iff
    * the user has ≥1 event of `types(i)`; bit 0 = the LAST type), and
    * the output counts users per populated bitmask. ONE groupBy(user)
    * with max-flag aggregates (map-side combined) + one tiny rollup —
    * the shuffle carries a single row per user, no per-type joins, no
    * distinct explosion. All integer. Output: `cohort` (bitmask),
    * `n_users`, ordered by cohort; users with none of the tracked
    * types land in cohort 0.
    */
  def behaviorCohorts(events: DataFrame, keyCol: String,
                      typeCol: String, types: Seq[String]): DataFrame = {
    require(types.nonEmpty && types.size <= 62, "1..62 tracked types")
    val bits = types.zipWithIndex.map { case (t, i) =>
      max(when(col(typeCol) === t,
               lit(1L << (types.size - 1 - i))).otherwise(0L))
        .as(s"__b$i")
    }
    events.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(bits.head, bits.tail: _*)
      .select(types.indices.map(i => col(s"__b$i"))
                .reduce(_ + _).as("cohort"))
      .groupBy("cohort")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort")
  }
}
