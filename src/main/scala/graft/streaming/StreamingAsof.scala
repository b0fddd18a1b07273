package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming point-in-time (AS-OF) enrichment — the stateful-stream
  * counterpart of [[graft.operators.AsofJoin]] and the online shape of
  * a feature-store lookup: one keyed event stream carries both STATE
  * events (e.g. purchases, price updates, feature refreshes) and PROBE
  * events (e.g. views, scoring requests); every probe is emitted
  * enriched with the latest state event at-or-before its timestamp,
  * never a later one (no leakage).
  *
  * Per micro-batch, a user's events process in `(ts, state-first, id)`
  * order — at equal timestamps the state event wins, giving the same
  * inclusive `<=` semantics as the batch operator and SQL ASOF — and
  * the group state holds ONE record: the latest state event seen. On a
  * time-ordered replay (staged files in event-time order, the same
  * discipline as every stream oracle here) the emitted enrichment
  * equals the batch as-of join exactly. Out-of-order ARRIVAL inside a
  * batch is handled by the sort; a state event arriving a batch late
  * (behind a probe it should have matched) cannot retroactively fix
  * that probe — the trade every streaming enrichment makes, bounded by
  * the source's watermark.
  *
  * Scale shape: state is one fixed-size record per key (16 bytes of
  * payload — never the history); the keyed-state shuffle is the only
  * shuffle; emission is append-mode. The event-time timeout evicts
  * keys quiet past `stateTtl`, so 100 TB-day streams hold state for
  * concurrently-active keys only.
  */
object StreamingAsof {

  /** Latest state event: epoch ms + quantized value. */
  final case class LatestState(ts_ms: Long, value_q: Long)

  /** An enriched probe: the probe's key/time plus the matched state
    * event's time and 1e-6-quantized value (-1/null-free sentinels
    * keep the surface integer-only; `matched` disambiguates). */
  final case class EnrichedProbe(user_id: Long, probe_ms: Long,
                                 matched: Boolean, asof_ms: Long,
                                 asof_value_q: Long)

  /** Enrich `probes` (rows of `events` with `typeCol === probeType`)
    * with the latest `stateType` event at-or-before them, per
    * `keyCol`. `events` must be a streaming relation with event-time
    * column `tsCol`; rows of other types are ignored.
    */
  def enrich(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, valueCol: String,
             stateType: String, probeType: String,
             watermarkDelay: String,
             stateTtlMs: Long = 30L * 86400000L)
      : Dataset[EnrichedProbe] = {
    require(stateTtlMs > 0, s"stateTtlMs must be positive; got $stateTtlMs")
    val spark = events.sparkSession
    import spark.implicits._
    val ttl = stateTtlMs
    events
      .withWatermark(tsCol, watermarkDelay)
      // tsCol passes through UN-cast (StreamingSessionize discipline:
      // a cast strips the watermark metadata the timeout needs)
      .where(col(typeCol).isin(stateType, probeType))
      .select(col(keyCol).cast("long").as("user_id"),
              col(tsCol).as("ts"),
              (col(typeCol) === stateType).as("is_state"),
              floor(col(valueCol) * lit(1e6)).cast("long").as("vq"))
      .as[(Long, Timestamp, Boolean, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, Timestamp, Boolean, Long)],
         st: GroupState[LatestState]) =>
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            // (ts, state-first): the 4th element is unused for order —
            // ties WITHIN one (key, ts, type) have no defined winner,
            // exactly like SQL ASOF; pre-aggregate upstream if needed
            val evs = it.toArray.sortBy(e => (e._2.getTime, !e._3))
            var cur = st.getOption.orNull
            val out = List.newBuilder[EnrichedProbe]
            evs.foreach { case (_, ts, isState, vq) =>
              val ms = ts.getTime
              if (isState) {
                if (cur == null || ms >= cur.ts_ms)
                  cur = LatestState(ms, vq)
              } else {
                if (cur == null)
                  out += EnrichedProbe(user, ms, matched = false, -1L,
                                       -1L)
                else
                  out += EnrichedProbe(user, ms, matched = true,
                                       cur.ts_ms, cur.value_q)
              }
            }
            if (cur != null) {
              st.update(cur)
              st.setTimeoutTimestamp(
                math.max(cur.ts_ms + ttl,
                         st.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }
}
