package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Events
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming sessionization: gap-closed sessions emit in-batch, idle
  * sessions flush on the event-time watermark, and the drained stream
  * matches the batch operator session-for-session.
  */
class SessionStreamSpec extends SparkSpec {

  test("gap closes a session in-batch; timeout flushes the idle tail") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1000000000L

    val input = MemoryStream[SessionEvent]
    val q = SessionStream(input.toDS()).writeStream
      .format("memory").queryName("sess_basic")
      .outputMode("append").start()

    // user 1: two events 10 s apart, then one 5 h later (gap-close),
    // user 2: one event (stays open)
    input.addData(
      SessionEvent(1L, 1000L * ns, 1L),
      SessionEvent(2L, 1010L * ns, 1L),
      SessionEvent(3L, (1010L + 18000L) * ns, 1L),
      SessionEvent(4L, 2000L * ns, 2L))
    q.processAllAvailable()
    // user 1's first session gap-closes; user 2's single event is flushed
    // by timeout in a follow-up micro-batch (user 1's late event advanced
    // the watermark past user 2's last + gap)
    val b1 = spark.table("sess_basic").as[SessionOut].collect()
      .sortBy(s => (s.user_id, s.session_idx))
    assert(b1.toSeq === Seq(SessionOut(1L, 1L, 2L, 10L), SessionOut(2L, 1L, 1L, 0L)))

    // advance the watermark far past every open session's timeout via a
    // fresh user's event; the NEXT batch fires the timeouts
    input.addData(SessionEvent(9L, 10000000L * ns, 99L))
    q.processAllAvailable()
    input.addData(SessionEvent(10L, 10000001L * ns, 99L))
    q.processAllAvailable()
    q.stop()

    val all = spark.table("sess_basic").as[SessionOut].collect()
      .filter(_.user_id != 99L).sortBy(s => (s.user_id, s.session_idx))
    assert(all.toSeq === Seq(
      SessionOut(1L, 1L, 2L, 10L),
      SessionOut(1L, 2L, 1L, 0L),   // flushed by timeout
      SessionOut(2L, 1L, 1L, 0L)))  // flushed by timeout
  }

  test("drained stream matches Events.sessionize on the sf0.001 events") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val raw = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id").collect()
      .map(r => SessionEvent(r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(e => (e.ts, e.event_id))

    val input = MemoryStream[SessionEvent]
    val q = SessionStream(input.toDS()).writeStream
      .format("memory").queryName("sess_parity")
      .outputMode("append").start()

    // feed in event-time order across several micro-batches (in-order
    // delivery is the parity precondition; out-of-order is the batch
    // operator's domain)
    raw.grouped(raw.length / 3 + 1).foreach { batch =>
      input.addData(batch.toSeq); q.processAllAvailable()
    }
    // watermark advancer: far-future events for a sentinel user flush
    // every real user's open tail session
    val last = raw.last.ts
    input.addData(SessionEvent(-1L, last + 100000L * 1000000000L, -1L))
    q.processAllAvailable()
    input.addData(SessionEvent(-2L, last + 100001L * 1000000000L, -1L))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_parity").as[SessionOut].collect()
      .filter(_.user_id >= 0L)
      .map(s => (s.user_id, s.session_idx) -> ((s.n_events, s.duration_s))).toMap
    val batch = Events.sessionize(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("duration_s")))).toMap
    assert(streamed === batch,
      s"stream/batch diverge: ${streamed.size} vs ${batch.size} sessions")
  }
}
