package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}

/** One stream event: the (group, value) pair being distinct-counted. */
final case class SketchEvent(event_type: String, user_id: Long)

/** The per-group register file carried between micro-batches. */
final case class HllRegs(regs: Array[Long])

/** A per-group estimate emitted after each micro-batch that touched it. */
final case class HllEstimate(event_type: String, hll_est: Long, n_nonzero: Int)

/** Streaming HyperLogLog — the continuous face of
  * [[graft.operators.Sketches.sketchHll]]: per event type, a 64-register
  * file lives in `mapGroupsWithState` state and every micro-batch folds
  * its rows in with the SAME register update the batch plan performs
  * (shared kernel, so stream and batch cannot disagree), then emits the
  * current estimate.
  *
  * This is exactly why HLL belongs in a stream: the state is 64 longs
  * per group FOREVER — a streaming count-distinct over raw user ids
  * would grow state with the user population, and a watermark would
  * forget users instead of bounding memory. The register max is a
  * commutative monoid, so at-least-once batch replay after recovery
  * re-folds to the identical registers (idempotent by construction).
  */
object SketchStream {

  def estimates(events: Dataset[SketchEvent]): Dataset[HllEstimate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .mapGroupsWithState[HllRegs, HllEstimate](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[SketchEvent], state: GroupState[HllRegs]) =>
          val regs =
            if (state.exists) state.get.regs
            else Array.fill(64)(0L)
          rows.foreach(e => Sketches.hllUpdate(regs, e.user_id))
          state.update(HllRegs(regs))
          HllEstimate(key, Sketches.hllEstimate(regs), regs.count(_ != 0L))
      }
  }

  /** The output mode stateful map-groups requires. */
  val Mode: OutputMode = OutputMode.Update()
}
