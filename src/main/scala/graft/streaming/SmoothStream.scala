package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One stream row: an hourly event-rate observation for one type (the
  * output of an upstream watermarked window count — the stream analog of
  * the batch operator's hour-fold).
  */
final case class HourRate(event_type: String, hour: Long, n_events: Long)

/** Per-type recurrence state: the last folded hour and the running
  * smoothed value in tenths. Constant size forever — EWMA's whole appeal
  * as a streaming statistic.
  */
final case class SmoothState(lastHour: Long, s10: Long)

/** One smoothed observation, emitted as its hour folds in. */
final case class SmoothedRate(event_type: String, hour: Long, n_events: Long,
    ewma10: Long, is_burst: Boolean)

/** Streaming EWMA — the continuous face of
  * [[graft.operators.Events.smooth]]: per event type the recurrence
  * s_1 = 10·x_1, s_t = (30·x_t + 7·s_{t-1}) div 10 lives in
  * `flatMapGroupsWithState` state (two longs per type, constant
  * forever), every micro-batch folds its hours IN ORDER, and each hour
  * emits exactly one smoothed row — identical to the batch fold because
  * the integer recurrence is the same arithmetic.
  *
  * Replay safety: an EWMA fold is NOT idempotent (re-folding an hour
  * would re-weight it), so the state's `lastHour` is a monotone gate —
  * rows at or below it are dropped, making at-least-once redelivery
  * exactly-once in effect, the same contract as the LSH ingest id-gate.
  * A genuinely LATE hour (arriving after a later hour already folded)
  * is dropped by the same gate: the upstream watermarked window agg is
  * responsible for emitting each hour once, closed, in order.
  */
object SmoothStream {

  def smoothed(rates: Dataset[HourRate]): Dataset[SmoothedRate] = {
    import rates.sparkSession.implicits._
    rates.groupByKey(_.event_type)
      .flatMapGroupsWithState[SmoothState, SmoothedRate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[HourRate], state: GroupState[SmoothState]) =>
          var last = if (state.exists) state.get.lastHour else Long.MinValue
          var s = if (state.exists) state.get.s10 else -1L
          val out = Vector.newBuilder[SmoothedRate]
          rows.toVector.sortBy(_.hour).foreach { r =>
            if (r.hour > last) {
              val s1 = if (s < 0L) 10L * r.n_events
                       else (30L * r.n_events + 7L * s) / 10L
              val burst = s >= 0L && 100L * r.n_events > 15L * s
              out += SmoothedRate(key, r.hour, r.n_events, s1, burst)
              last = r.hour
              s = s1
            }
          }
          state.update(SmoothState(last, s))
          out.result().iterator
      }
  }

  /** The output mode the driver must pass to `writeStream`. */
  val Mode: OutputMode = OutputMode.Append()
}
