package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One observed minute batch of the replication sequence. */
final case class MinuteSeq(seq: Long)

/** Carried between micro-batches: the highest sequence seen so far. */
final case class GapState(last: Long)

/** A missing closed range of the minutely sequence. */
final case class SeqGap(gap_start: Long, gap_end: Long, gap_len: Long)

/** Streaming replication-gap monitor — the continuous face of
  * [[graft.operators.Replication.replGap]]: as minutely sequence numbers
  * arrive, emit every missing closed range the moment the first batch
  * BEYOND it lands. The replication stream is one global sequence
  * (State.java's single `sequenceNumber` cursor in the reference), so the
  * state is one long per stream forever — keyed by a unit key exactly like
  * the batch operator's bounded global window, and minute-scale volume
  * makes the single group a non-issue at any corpus size.
  *
  * Replay contract (at-least-once safety): the state is the MAX sequence
  * seen, and a batch's sequences ≤ that max emit nothing and move nothing —
  * so redelivering a whole micro-batch after recovery is a no-op and the
  * emitted gap set is exactly-once by construction. The boundary this buys
  * is the same one the batch operator has: a minute arriving LATER than a
  * gap report that spans it is ignored (the gap was real at detection
  * time); a monitor wanting corrections would key gaps by range and emit
  * retractions, which Append mode deliberately rules out.
  */
object GapStream {

  def gaps(minutes: Dataset[MinuteSeq]): Dataset[SeqGap] = {
    import minutes.sparkSession.implicits._
    minutes.groupByKey(_ => 0)
      .flatMapGroupsWithState[GapState, SeqGap](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[MinuteSeq], state: GroupState[GapState]) =>
          val seqs = rows.map(_.seq).toArray.distinct.sorted
          var last = if (state.exists) state.get.last else Long.MinValue
          val out = Seq.newBuilder[SeqGap]
          seqs.foreach { q =>
            if (last != Long.MinValue && q > last + 1)
              out += SeqGap(last + 1, q - 1, q - last - 1)
            if (q > last) last = q
          }
          state.update(GapState(last))
          out.result().iterator
      }
  }

  /** flatMapGroupsWithState(Append) requires an Append sink. */
  val Mode: OutputMode = OutputMode.Append()
}
