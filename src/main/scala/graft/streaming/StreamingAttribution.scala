package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming last-touch attribution — the online shape of
  * [[graft.operators.Funnel.lastTouchAttribution]]: one keyed event
  * stream carries touch events (channels) and conversion events; every
  * conversion emits immediately, credited to the key's latest touch
  * STRICTLY before it (by the same `(sec, id)` total order as the
  * batch operator) and within the lookback, else `"direct"`.
  *
  * Group state holds ONE record — the latest touch's second, id and
  * channel — never the history; the event-time timeout evicts keys
  * quiet past the lookback (a touch older than the lookback can only
  * ever yield `"direct"`, which a missing state also yields, so
  * eviction at `lookbackSeconds` past the watermark is EXACT, the
  * [[StreamingSessionize]] discipline). On a time-ordered replay the
  * emitted channels equal the batch operator row-for-row.
  */
object StreamingAttribution {

  final case class LastTouch(sec: Long, id: Long, channel: String)

  final case class Attributed(user_id: Long, event_id: Long,
                              channel: String)

  def attribute(events: DataFrame, keyCol: String, tsCol: String,
                idCol: String, typeCol: String,
                touchTypes: Seq[String], convType: String,
                lookbackSeconds: Long,
                watermarkDelay: String): Dataset[Attributed] = {
    require(lookbackSeconds > 0,
      s"lookbackSeconds must be positive; got $lookbackSeconds")
    val spark = events.sparkSession
    import spark.implicits._
    val touchSet = touchTypes.toSet
    val lookback = lookbackSeconds
    events
      .withWatermark(tsCol, watermarkDelay)
      .where(col(tsCol).isNotNull &&
             col(typeCol).isin(touchTypes :+ convType: _*))
      .select(col(keyCol).cast("long").as("user_id"),
              col(tsCol).as("ts"),
              col(idCol).cast("long").as("event_id"),
              col(typeCol).as("event_type"))
      .as[(Long, Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, Timestamp, Long, String)],
         st: GroupState[LastTouch]) =>
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            // same (sec, id) total order as the batch operator; a
            // touch and conversion tied on BOTH sec and id cannot
            // exist (ids are unique), so the order is unambiguous
            val evs = it.toArray.sortBy(e => (e._2.getTime / 1000L,
                                              e._3))
            var cur = st.getOption.orNull
            val out = List.newBuilder[Attributed]
            evs.foreach { case (_, ts, id, tpe) =>
              val sec = ts.getTime / 1000L
              if (tpe == convType) {
                // strictly-before by (sec, id), matching the batch
                // window: a late-delivered conversion behind the
                // stored touch must NOT credit it
                val ch =
                  if (cur != null && sec - cur.sec <= lookback &&
                      (cur.sec < sec || (cur.sec == sec && cur.id < id)))
                    cur.channel
                  else "direct"
                out += Attributed(user, id, ch)
              }
              // a type in BOTH sets acts as conversion first, touch
              // second — the batch operator's strict-before window
              // likewise lets such an event credit only LATER ones
              if (touchSet.contains(tpe)) {
                if (cur == null || cur.sec < sec ||
                    (cur.sec == sec && cur.id < id))
                  cur = LastTouch(sec, id, tpe)
              }
            }
            if (cur != null) {
              st.update(cur)
              st.setTimeoutTimestamp(
                math.max((cur.sec + lookback + 1L) * 1000L,
                         st.getCurrentWatermarkMs() + 1L))
            }
            out.result().iterator
          }
      }
  }
}
