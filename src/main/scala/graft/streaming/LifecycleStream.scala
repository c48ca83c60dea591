package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One (user, week) activity observation. */
final case class UserWeek(user_id: Long, week: Long)

/** Carried between micro-batches: the user's latest classified week. */
final case class LifeState(lastWeek: Long)

/** One lifecycle transition: the user's state for that active week. */
final case class LifeEvent(week: Long, user_id: Long, state: String)

/** Streaming GROWTH ACCOUNTING — the continuous face of
  * [[graft.operators.Events.lifecycle]]: as activity arrives, each user's
  * newly-seen weeks emit their lifecycle transition (`new` on first
  * appearance, `retained` on week+1, `resurrected` after a gap). The
  * weekly ledger is then one bounded aggregation over the emitted
  * transitions, with churn derived by the SAME frame identity the batch
  * operator uses (`churned(w) = active(w−1) − retained(w)`), so the two
  * faces share their one subtle rule instead of re-deriving it.
  *
  * State is ONE long per user forever (the latest classified week) —
  * the same per-key constant-state contract as [[SessionStream]].
  *
  * Replay contract (at-least-once safety): a week ≤ the stored last week
  * emits nothing and moves nothing, so redelivering a whole micro-batch
  * is a no-op and the transition set is exactly-once by construction.
  * The boundary this buys (the [[CurateStream]] precedent, spec-pinned):
  * a user's week arriving AFTER a later week was already classified is
  * dropped — the batch operator, seeing all history at once, would count
  * it. In-order per-user ingest (the normal event-time feed) is the
  * parity precondition.
  */
object LifecycleStream {

  def transitions(activity: Dataset[UserWeek]): Dataset[LifeEvent] = {
    import activity.sparkSession.implicits._
    activity.groupByKey(_.user_id)
      .flatMapGroupsWithState[LifeState, LifeEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserWeek], state: GroupState[LifeState]) =>
          val weeks = rows.map(_.week).toArray.distinct.sorted
          var last = if (state.exists) state.get.lastWeek else Long.MinValue
          val out = Seq.newBuilder[LifeEvent]
          weeks.foreach { w =>
            if (w > last) {
              val st =
                if (last == Long.MinValue) "new"
                else if (w == last + 1) "retained"
                else "resurrected"
              out += LifeEvent(w, uid, st)
              last = w
            }
          }
          state.update(LifeState(last))
          out.result().iterator
      }
  }

  /** flatMapGroupsWithState(Append) requires an Append sink. */
  val Mode: OutputMode = OutputMode.Append()
}
