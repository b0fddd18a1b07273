package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Stateful gap sessionization for Structured Streaming — the
  * `flatMapGroupsWithState` counterpart of [[Sessionize]]: per-user
  * custom state holds the one OPEN session; an arriving event either
  * extends it or closes it (gap exceeded — the closed session is
  * emitted immediately), and the event-time timeout closes a session
  * whose user simply went quiet once the watermark passes
  * `last event + gap` (`FlatMapGroupsWithStateExec` fires timeouts
  * strictly below the eviction watermark).
  *
  * Semantics match [[Sessionize.sessionStats]] on CLOSED sessions when
  * events arrive per-user in event-time order (stage replays should
  * feed time-ordered files); out-of-order events within the gap still
  * merge correctly (the open session extends backwards), but an event
  * older than `gap` behind the open session starts — and immediately
  * strands — a spurious session, the same trade every
  * watermark-bounded sessionizer makes.
  *
  * Scale shape: state is ONE fixed-size record per active user (four
  * numbers — not the events), keyed state partitioning is the only
  * shuffle, and emission is append-mode so downstream sinks never see
  * updates. 100 TB-day event streams hold state proportional to
  * concurrently-active users only; the timeout GUARANTEES quiet users'
  * state is evicted at watermark pace.
  */
object StreamingSessionize {

  /** One open session per user: span endpoints in epoch ms, event
    * count, value sum. */
  final case class OpenSession(start: Long, last: Long, n: Long,
                               vsum: Double)

  /** An emitted (closed) session. */
  final case class ClosedSession(user_id: Long, start_ms: Long,
                                 end_ms: Long, n_events: Long,
                                 value_sum: Double)

  /** Sessionize a streaming DataFrame. `events` must be a streaming
    * relation with an event-time column `tsCol`; emits one row per
    * CLOSED session (append mode). `gapSeconds` is the inactivity gap,
    * `watermarkDelay` the lateness bound (e.g. "10 minutes").
    */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               valueCol: String, gapSeconds: Long,
               watermarkDelay: String): Dataset[ClosedSession] = {
    require(gapSeconds > 0, s"gapSeconds must be positive; got $gapSeconds")
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    events
      .withWatermark(tsCol, watermarkDelay)
      // tsCol passes through UN-cast: a cast builds a new expression
      // and silently strips the watermark metadata the event-time
      // timeout requires
      .select(col(userCol).cast("long").as("user_id"),
              col(tsCol).as("ts"),
              col(valueCol).cast("double").as("value"))
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[(Long, Timestamp, Double)],
         st: GroupState[OpenSession]) =>
          if (st.hasTimedOut) {
            val s = st.get
            st.remove()
            Iterator.single(close(user, s))
          } else {
            val evs = it.map { case (_, ts, v) => (ts.getTime, v) }
              .toArray.sortBy(_._1)
            var out = List.empty[ClosedSession]
            var cur = st.getOption.orNull
            evs.foreach { case (ms, v) =>
              if (cur == null)
                cur = OpenSession(ms, ms, 1L, v)
              else if (ms - cur.last > gapMs) {
                out ::= close(user, cur)
                cur = OpenSession(ms, ms, 1L, v)
              } else if (cur.start - ms > gapMs)
                // a stray event more than one gap BEFORE the open
                // session (possible when watermarkDelay > gap): its own
                // immediately-closed session, never merged — merging
                // would emit a session violating the gap invariant
                out ::= close(user, OpenSession(ms, ms, 1L, v))
              else
                cur = OpenSession(math.min(cur.start, ms),
                                  math.max(cur.last, ms),
                                  cur.n + 1, cur.vsum + v)
            }
            if (cur != null) {
              st.update(cur)
              // in-order feeds always have last + gap above the
              // watermark; the clamp only matters for a pathological
              // late stray, whose session then times out next batch
              st.setTimeoutTimestamp(
                math.max(cur.last + gapMs,
                         st.getCurrentWatermarkMs() + 1L))
            }
            out.reverseIterator
          }
      }
  }

  private def close(user: Long, s: OpenSession): ClosedSession =
    ClosedSession(user, s.start, s.last, s.n, s.vsum)

  /** Fully-qualified RocksDB state-store provider — the scale option
    * for keyed state that outgrows executor heap: the default
    * HDFS-backed store keeps every key's state AND a full versioned
    * copy per maintained snapshot ON-HEAP, while RocksDB holds state
    * off-heap/on-disk with bounded block-cache memory. At millions of
    * concurrently-open sessions per executor the heap store becomes
    * the OOM risk, not the CPU. */
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"

  /** Run `body` (typically `...writeStream...start()`) with the given
    * state-store provider bound, restoring the previous conf after.
    * The provider binds at CHECKPOINT CREATION — restarting an
    * existing checkpoint with a different provider is rejected by
    * Spark, so scope this around the first `start()`.
    */
  def withStateStoreProvider[T](spark: org.apache.spark.sql.SparkSession,
                                provider: String)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, provider)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}
