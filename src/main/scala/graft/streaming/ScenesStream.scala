package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One stream row: a sampled frame's 64-bit perceptual hash (the
  * scan-side `ahash64` output of the frame-sampling stage).
  */
final case class FrameHash(doc_id: Long, off: Long, phash: Long)

/** Per-payload cut-detection state: the last folded frame. Two longs
  * forever, like the EWMA state.
  */
final case class SceneState(lastOff: Long, lastHash: Long)

/** One scored frame, emitted as it folds in. */
final case class SceneCut(doc_id: Long, off: Long, hamming: Int,
    is_cut: Boolean)

/** Streaming scene-cut detection — the continuous face of
  * [[graft.operators.Multimodal.mmScenes]]: per payload the last frame's
  * hash lives in `flatMapGroupsWithState` state, every micro-batch folds
  * its frames IN OFFSET ORDER, and each frame emits its Hamming distance
  * to the previous one (cut past the mm_dedup near-dup radius, > 16).
  * First frame of a payload reports −1, no cut — identical to the batch
  * operator because the comparison is the same integer arithmetic.
  *
  * Replay safety: the Hamming chain is order-sensitive, so `lastOff` is
  * a monotone gate — frames at or below the frontier are dropped,
  * making at-least-once redelivery exactly-once in effect (the
  * [[SmoothStream]] contract; the upstream frame sampler emits each
  * offset once, in order).
  */
object ScenesStream {

  def cuts(frames: Dataset[FrameHash]): Dataset[SceneCut] = {
    import frames.sparkSession.implicits._
    frames.groupByKey(_.doc_id)
      .flatMapGroupsWithState[SceneState, SceneCut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[FrameHash], state: GroupState[SceneState]) =>
          var last = if (state.exists) state.get.lastOff else Long.MinValue
          var ph = if (state.exists) state.get.lastHash else 0L
          var first = !state.exists
          val out = Vector.newBuilder[SceneCut]
          rows.toVector.sortBy(_.off).foreach { f =>
            if (f.off > last) {
              val h = if (first) -1
                      else java.lang.Long.bitCount(f.phash ^ ph)
              out += SceneCut(key, f.off, h, h > 16)
              last = f.off
              ph = f.phash
              first = false
            }
          }
          state.update(SceneState(last, ph))
          out.result().iterator
      }
  }

  /** The output mode the driver must pass to `writeStream`. */
  val Mode: OutputMode = OutputMode.Append()
}
