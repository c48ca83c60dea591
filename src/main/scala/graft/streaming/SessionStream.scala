package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A raw event on the stream; `ts` is epoch-nanos (the `events` table's
  * native int64, see operators.Events).
  */
case class SessionEvent(event_id: Long, ts: Long, user_id: Long)

/** Internal: the same event with the derived event-time column the
  * watermark rides on.
  */
case class TimedSessionEvent(event_id: Long, ts: Long, user_id: Long,
    event_time: java.sql.Timestamp)

/** A CLOSED session — emitted when a later event exceeds the gap, or when
  * the event-time watermark passes last-activity + gap (timeout).
  */
case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
    duration_s: Long)

/** O(1) per-user state: only the open session's aggregate, never the
  * event history.
  */
case class OpenSession(session_idx: Long, start_s: Long, last_s: Long,
    n_events: Long)

/** Streaming gap-based sessionization — the streaming face of
  * `Events.sessionize` (same 4 h gap, same floor-second arithmetic, same
  * (ts, event_id) in-batch ordering), expressed as managed keyed state:
  *
  * - State is one [[OpenSession]] per user (constant size), partitioned
  *   by user_id and checkpointed by the engine — a 100 TB/day stream
  *   holds |active users| state rows, not events.
  * - Sessions close in two ways, both deterministic in event time: a
  *   later event beyond the gap (emitted in that batch), or the
  *   event-time WATERMARK passing last-activity + gap
  *   (`GroupStateTimeout.EventTimeTimeout` — the idle-user flush that a
  *   pure batch job gets for free by seeing the whole day at once).
  * - In-order delivery matches the batch operator session-for-session;
  *   the only divergence window is the still-open tail session, which
  *   the stream holds back until its timeout proves no more events can
  *   extend it.
  */
object SessionStream {

  /** Same gap as the batch operator. */
  val GapS = 14400L

  private def closed(user: Long, st: OpenSession): SessionOut =
    SessionOut(user, st.session_idx, st.n_events, st.last_s - st.start_s)

  def fold(user: Long, events: Iterator[TimedSessionEvent],
      state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
    if (state.hasTimedOut) {
      // watermark passed last_s + gap: no in-order event can extend the
      // open session any more — flush it. The state is NOT removed: a
      // closed-marker row (n_events = 0) keeps the per-user session
      // counter so a later session continues the batch operator's
      // numbering instead of restarting at 1. No further timeout is set —
      // the marker is inert until the user's next event.
      state.getOption.foreach { st =>
        if (st.n_events > 0L) out += closed(user, st)
        state.update(OpenSession(st.session_idx, 0L, 0L, 0L))
      }
    } else {
      var st = state.getOption.orNull
      events.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
        val s = Math.floorDiv(e.ts, 1000000000L)
        if (st == null) st = OpenSession(1L, s, s, 1L)
        else if (st.n_events == 0L) // closed marker: only the counter is live
          st = OpenSession(st.session_idx + 1L, s, s, 1L)
        else if (s - st.last_s > GapS) {
          out += closed(user, st)
          st = OpenSession(st.session_idx + 1L, s, s, 1L)
        } else st = OpenSession(st.session_idx, st.start_s, s, st.n_events + 1L)
      }
      if (st != null) {
        state.update(st)
        if (st.n_events > 0L)
          // timeout in event time: the first instant the gap rule could
          // close the session
          state.setTimeoutTimestamp((st.last_s + GapS + 1L) * 1000L)
      }
    }
    out.iterator
  }

  def apply(events: Dataset[SessionEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", expr("timestamp_micros(ts div 1000)"))
      .as[TimedSessionEvent]
      .withWatermark("event_time", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }
}
