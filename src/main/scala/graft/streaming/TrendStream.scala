package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One retained observation of a type's trailing-window state. */
final case class HourPoint(hour: Long, y: Long)

/** Per-type rolling-regression state: the monotone hour gate plus the
  * trailing ≤24 observed hours — CONSTANT size forever, the whole appeal
  * of a windowed statistic on a stream.
  */
final case class TrendState(lastHour: Long, window: Seq[HourPoint])

/** One trend observation, emitted as its hour folds in. */
final case class TrendOut(event_type: String, hour: Long, y: Long, n: Long,
    slope_ppm: Option[Long])

/** Streaming rolling-OLS trend — the continuous face of
  * [[graft.operators.Events.trend]]: per event type, each folded hour
  * emits the OLS slope of the trailing 24 OBSERVED hourly counts in
  * exact integer ppm — the identical BIGINT moment arithmetic as the
  * batch window, so drained-stream equals batch row for row.
  *
  * State is the ≤24-point trailing window plus a monotone hour gate
  * (the SmoothStream contract): rows at or below the folded frontier
  * are dropped, so at-least-once redelivery is exactly-once in effect,
  * and a genuinely late hour is the upstream watermarked hour-fold's
  * responsibility — same division of labor as every recurrence face.
  */
object TrendStream {

  /** Same trailing width as the batch operator's window frame. */
  val WindowN = 24

  def trends(rates: Dataset[HourRate]): Dataset[TrendOut] = {
    import rates.sparkSession.implicits._
    rates.groupByKey(_.event_type)
      .flatMapGroupsWithState[TrendState, TrendOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[HourRate], state: GroupState[TrendState]) =>
          var st = state.getOption.getOrElse(TrendState(Long.MinValue, Vector.empty))
          val out = Vector.newBuilder[TrendOut]
          rows.toVector.sortBy(_.hour).foreach { r =>
            if (r.hour > st.lastHour) {
              val win = (st.window :+ HourPoint(r.hour, r.n_events))
                .takeRight(WindowN)
              val n = win.size.toLong
              val sx = win.map(_.hour).sum
              val sy = win.map(_.y).sum
              val sxy = win.map(p => p.hour * p.y).sum
              val sxx = win.map(p => p.hour * p.hour).sum
              val den = n * sxx - sx * sx
              val slope =
                if (den == 0L) None
                else Some((1000000L * (n * sxy - sx * sy)) / den)
              out += TrendOut(key, r.hour, r.n_events, n, slope)
              st = TrendState(r.hour, win)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** The output mode the driver must pass to `writeStream`. */
  val Mode: OutputMode = OutputMode.Append()
}
