package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-type Holt state: last folded hour, level and trend in tenths, and
  * the fold count (distinguishing the l₁ initialization). Constant size
  * forever — the same streaming appeal as [[SmoothStream]]'s EWMA.
  */
final case class HoltState(lastHour: Long, l10: Long, b10: Long, n: Long)

/** One trend observation: level, trend and the one-step-ahead forecast
  * the PREVIOUS state had made for this hour (error = |10·x − forecast|).
  */
final case class TrendRate(event_type: String, hour: Long, n_events: Long,
    level10: Long, trend10: Long, forecast10: Long, abs_err: Long)

/** Streaming Holt linear-trend smoothing — the continuous face of
  * [[graft.operators.Events.holt]]: the two-component recurrence
  * l_t = (30·x_t + 7·(l+b)) div 10, b_t = (3·(l_t−l) + 7·b) div 10 lives
  * in `flatMapGroupsWithState` (four longs per type), every micro-batch
  * folds its hours in order, and each hour emits its level/trend plus the
  * forecast the prior state had made for it — the live anomaly signal.
  *
  * Replay safety is the [[SmoothStream]] contract verbatim: the fold is
  * not idempotent, so `lastHour` is a monotone gate — redelivered or late
  * hours are dropped, making at-least-once delivery exactly-once in
  * effect.
  */
object HoltStream {

  def trends(rates: Dataset[HourRate]): Dataset[TrendRate] = {
    import rates.sparkSession.implicits._
    rates.groupByKey(_.event_type)
      .flatMapGroupsWithState[HoltState, TrendRate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[HourRate], state: GroupState[HoltState]) =>
          var st = if (state.exists) state.get
                   else HoltState(Long.MinValue, 0L, 0L, 0L)
          val out = Vector.newBuilder[TrendRate]
          rows.toVector.sortBy(_.hour).foreach { r =>
            if (r.hour > st.lastHour) {
              if (st.n == 0L) {
                st = HoltState(r.hour, 10L * r.n_events, 0L, 1L)
                out += TrendRate(key, r.hour, r.n_events, st.l10, 0L, st.l10, 0L)
              } else {
                val f = st.l10 + st.b10
                val err = math.abs(10L * r.n_events - f)
                val l1 = (30L * r.n_events + 7L * f) / 10L
                val b1 = (3L * (l1 - st.l10) + 7L * st.b10) / 10L
                st = HoltState(r.hour, l1, b1, st.n + 1L)
                out += TrendRate(key, r.hour, r.n_events, l1, b1, l1 + b1, err)
              }
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** The output mode the driver must pass to `writeStream`. */
  val Mode: OutputMode = OutputMode.Append()
}
