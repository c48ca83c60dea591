package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A raw event on the stream; `ts` is epoch-nanos (the `events` table's
  * native int64). `error` events open incidents.
  */
case class IncidentEvent(event_id: Long, ts: Long, user_id: Long,
    event_type: String)

/** Internal: the same event with the derived event-time column the
  * watermark rides on.
  */
case class TimedIncidentEvent(event_id: Long, ts: Long, user_id: Long,
    event_type: String, event_time: java.sql.Timestamp)

/** Internal: one delivery of an event to a bucket group. Every event is
  * delivered to its own 600 s bucket and the previous one (the only two
  * buckets whose incidents its window membership can touch); the probe
  * flag — "this row also OPENS an incident" — rides only the own-bucket
  * delivery.
  */
case class RoutedIncidentEvent(bkt: Long, ts_s: Long, user_id: Long,
    event_id: Long, probe: Boolean, event_time: java.sql.Timestamp)

/** Buffered state of one bucket: the events whose windows can intersect
  * the bucket's incidents (two buckets' worth of stream — bounded by
  * temporal DENSITY, never corpus size) and the bucket's own incidents.
  */
case class IncidentBucketState(events: Seq[BufferedEvent],
    probes: Seq[BufferedProbe])

case class BufferedEvent(ts_s: Long, user_id: Long, event_id: Long)
case class BufferedProbe(t0_s: Long, inc_id: Long)

/** One closed incident window: events inside `[t0, t0+600)` and the exact
  * distinct users touched.
  */
case class IncidentOut(inc_id: Long, t0_s: Long, n_events: Long,
    n_users: Long)

/** Continuous incident-window monitor — the streaming face of
  * [[graft.operators.Events.intervalJoin]]: every `error` event opens a
  * 10-minute incident window; when the event-time watermark proves a
  * window can no longer grow, its exact (n_events, n_users) row emits.
  *
  * Decomposition carried over from the batch sweep-line: NO (event ×
  * incident) pair is ever materialized. Events route to exactly TWO
  * 600 s bucket groups (their own and the previous — the only buckets
  * whose incident windows can contain them), so shuffled rows stay
  * 2·events + incidents. A bucket's state buffers its two buckets'
  * worth of raw stream; at flush the per-second ±delta sweep and the
  * per-user coverage-island union (the exact windowed COUNT DISTINCT)
  * run IN MEMORY over that density-bounded buffer — O(buf log buf + W),
  * never O(probes × events).
  *
  * Lifecycle: a bucket `b`'s last incident window ends strictly before
  * `(b+2)·600` s, so the group flushes on the event-time timeout at that
  * instant and its state is REMOVED — steady-state memory is the active
  * buckets near the watermark, regardless of stream length. Replay
  * safety: at-least-once redelivery dedups by event/incident id at flush
  * (an id can reach the same bucket group only once per logical event).
  *
  * LATE DATA: the watermark delay defaults to 0 seconds — the
  * drained-equals-batch contract, where each micro-batch is
  * time-ordered relative to the next. Under that default any event
  * arriving in a LATER micro-batch than one carrying a higher event
  * time is dropped by the watermark and its incident undercounts. A
  * production deployment with cross-batch disorder should pass a
  * `delay` ("10 minutes") sized to its source's lateness bound; the
  * state/timeout machinery is delay-agnostic (buckets just close
  * later).
  */
object IntervalStream {

  /** Same window as the batch operator. */
  val W: Long = graft.operators.Events.IncidentWindowS

  /** Exact per-incident aggregates of one closed bucket, by the batch
    * operator's own decomposition run locally: per-second event deltas in
    * incident-start space + per-user merged coverage islands, prefix-
    * summed across the bucket's t0 range.
    */
  private[streaming] def flush(bkt: Long,
      st: IncidentBucketState): Seq[IncidentOut] = {
    val probes = st.probes.distinctBy(_.inc_id)
    if (probes.isEmpty) return Seq.empty
    val events = st.events.distinctBy(_.event_id)
    val lo = bkt * W // bucket's t0 range: [lo, lo + W)
    val w = W.toInt
    val de = new Array[Long](w + 1)
    val du = new Array[Long](w + 1)
    def addInterval(d: Array[Long], a: Long, b: Long): Unit = {
      // clamp [a, b] (inclusive t0 interval) into [lo, lo + W)
      val a0 = math.max(a - lo, 0L)
      val b0 = math.min(b - lo, W - 1L)
      if (a0 <= b0) { d(a0.toInt) += 1L; d(b0.toInt + 1) -= 1L }
    }
    // event at second s counts for incidents with t0 ∈ [s−(W−1), s]
    events.foreach(e => addInterval(de, e.ts_s - (W - 1), e.ts_s))
    // exact distinct users: union each user's per-event t0 intervals into
    // disjoint islands, each island a clean ±1
    events.groupBy(_.user_id).foreach { case (_, evs) =>
      val ss = evs.map(_.ts_s).sorted
      var a = ss.head - (W - 1)
      var b = ss.head
      ss.tail.foreach { s =>
        if (s - (W - 1) > b + 1) { addInterval(du, a, b); a = s - (W - 1) }
        b = s
      }
      addInterval(du, a, b)
    }
    var i = 1
    while (i <= w) { de(i) += de(i - 1); du(i) += du(i - 1); i += 1 }
    probes.map { p =>
      val off = (p.t0_s - lo).toInt
      IncidentOut(p.inc_id, p.t0_s, de(off), du(off))
    }.sortBy(_.inc_id)
  }

  private[streaming] def fold(bkt: Long, rows: Iterator[RoutedIncidentEvent],
      state: GroupState[IncidentBucketState]): Iterator[IncidentOut] = {
    if (state.hasTimedOut) {
      val st = state.get
      state.remove()
      flush(bkt, st).iterator
    } else {
      val st = state.getOption.getOrElse(IncidentBucketState(Nil, Nil))
      val evs = Seq.newBuilder[BufferedEvent]
      val prs = Seq.newBuilder[BufferedProbe]
      evs ++= st.events
      prs ++= st.probes
      rows.foreach { r =>
        evs += BufferedEvent(r.ts_s, r.user_id, r.event_id)
        if (r.probe) prs += BufferedProbe(r.ts_s, r.event_id)
      }
      val next = IncidentBucketState(evs.result(), prs.result())
      // the bucket's last window ends before (b+2)·W — flush then. If the
      // watermark already passed (a fully-late bucket), flush immediately:
      // an event-time timeout in the past would be rejected.
      val closeMs = (bkt + 2) * W * 1000L
      if (state.getCurrentWatermarkMs() >= closeMs) {
        state.remove()
        flush(bkt, next).iterator
      } else {
        state.update(next)
        state.setTimeoutTimestamp(closeMs)
        Iterator.empty
      }
    }
  }

  /** @param delay watermark delay (`withWatermark` duration string) —
    *   the source's cross-micro-batch lateness bound; "0 seconds"
    *   implements the drained-equals-batch contract for time-sorted
    *   feeds and DROPS cross-batch out-of-order events (class doc).
    */
  def apply(events: Dataset[IncidentEvent],
      delay: String = "0 seconds"): Dataset[IncidentOut] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", expr("timestamp_micros(ts div 1000)"))
      .as[TimedIncidentEvent]
      .flatMap { e =>
        val s = Math.floorDiv(e.ts, 1000000000L)
        val b = Math.floorDiv(s, W)
        Seq(
          RoutedIncidentEvent(b, s, e.user_id, e.event_id,
            e.event_type == "error", e.event_time),
          RoutedIncidentEvent(b - 1, s, e.user_id, e.event_id,
            probe = false, e.event_time))
      }
      // the watermark rides the ROUTED rows: a typed flatMap re-serializes
      // its output, so tagging must happen on the column that actually
      // reaches flatMapGroupsWithState
      .withWatermark("event_time", delay)
      .groupByKey(_.bkt)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }
}
