package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A raw event on the conversion stream; `ts` is epoch-nanos (the
  * `events` table's native int64, see operators.Events).
  */
case class ConvertEvent(event_id: Long, ts: Long, user_id: Long,
    event_type: String)

/** O(1) per-user state: the earliest signup instant seen so far and
  * whether the user already converted. `s0 = Long.MaxValue` means "no
  * signup yet" — purchases before any signup don't convert (the batch
  * operator's `ts >= s0` rule).
  */
case class ConvertState(s0: Long, converted: Boolean)

/** One conversion — emitted exactly once per user, on the first purchase
  * at-or-after their first signup.
  */
case class ConvertOut(user_id: Long, s0: Long, p0: Long, ttc_s: Long)

/** Streaming TIME-TO-CONVERT — the streaming face of `Events.ttc`
  * (signup → first purchase at-or-after it), the simplest real CEP
  * pattern (match event B after event A, per key) as managed keyed
  * state:
  *
  * - State is one [[ConvertState]] per user — two longs, constant size;
  *   a 100 TB/day stream holds |users| state rows, never events.
  * - Emission is exactly-once per user by construction: the `converted`
  *   flag makes replays and late duplicate purchases inert.
  * - In event-time-order delivery the drained stream equals the batch
  *   operator pair-for-pair (spec-pinned): when a purchase arrives, every
  *   earlier signup has already arrived, so the running min signup IS the
  *   batch's global `min(signup)` restricted to instants ≤ that purchase
  *   — the same pairing `Events.ttc`'s conditional `min` computes. The
  *   documented divergence window (the CurateStream contract): a signup
  *   arriving out-of-order BELOW the one a purchase already matched
  *   would have re-paired the batch verdict; the stream's emitted pair
  *   stands.
  * - No watermark/timeout: never-converted users simply hold state and
  *   emit nothing — the batch rollup's bucket −1 is a corpus-level
  *   census the consumer derives by anti-joining emitted conversions.
  */
object ConvertStream {

  def fold(user: Long, events: Iterator[ConvertEvent],
      state: GroupState[ConvertState]): Iterator[ConvertOut] = {
    var st = state.getOption.getOrElse(ConvertState(Long.MaxValue, false))
    val out = scala.collection.mutable.ArrayBuffer[ConvertOut]()
    events.toSeq.sortBy(e => (e.ts, e.event_id)).foreach { e =>
      val s = Math.floorDiv(e.ts, 1000000000L)
      if (!st.converted) {
        if (e.event_type == "signup" && s < st.s0)
          st = ConvertState(s, converted = false)
        else if (e.event_type == "purchase" && st.s0 != Long.MaxValue && s >= st.s0) {
          out += ConvertOut(user, st.s0, s, s - st.s0)
          st = ConvertState(st.s0, converted = true)
        }
      }
    }
    state.update(st)
    out.iterator
  }

  def apply(events: Dataset[ConvertEvent]): Dataset[ConvertOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }
}
