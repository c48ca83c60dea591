package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Events
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Continuous incident-window monitor: buckets flush exactly when the
  * watermark proves their windows closed, redelivery dedups by id, and
  * the drained stream reproduces the batch sweep-line incident table.
  */
class IntervalStreamSpec extends SparkSpec {

  private val ns = 1000000000L
  private val W = IntervalStream.W // 600 s

  test("window membership, exact distinct users, timeout flush") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[IncidentEvent]
    val q = IntervalStream(input.toDS()).writeStream
      .format("memory").queryName("iv_basic")
      .outputMode("append").start()

    // incident at t0=1000 (error id 10): window [1000, 1600) holds ids
    // 10, 11, 12 (two events by user 1 → n_users 2); id 13 at 1600 is
    // OUTSIDE (half-open window); id 14 predates t0
    input.addData(
      IncidentEvent(14L, 999L * ns, 7L, "view"),
      IncidentEvent(10L, 1000L * ns, 1L, "error"),
      IncidentEvent(11L, 1200L * ns, 1L, "click"),
      IncidentEvent(12L, 1599L * ns, 2L, "view"),
      IncidentEvent(13L, 1600L * ns, 3L, "view"))
    q.processAllAvailable()
    assert(spark.table("iv_basic").isEmpty,
      "no bucket's close instant is proven yet — nothing may emit")

    // advance the watermark far past the bucket's close; the NEXT batch
    // fires the timeout
    input.addData(IncidentEvent(99L, 100000L * ns, 99L, "view"))
    q.processAllAvailable()
    input.addData(IncidentEvent(98L, 100001L * ns, 99L, "view"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("iv_basic").as[IncidentOut].collect()
      .filter(_.inc_id == 10L)
    assert(got.toSeq === Seq(IncidentOut(10L, 1000L, 3L, 2L)))
  }

  test("at-least-once redelivery stays exactly-once at flush") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[IncidentEvent]
    val q = IntervalStream(input.toDS()).writeStream
      .format("memory").queryName("iv_replay")
      .outputMode("append").start()
    val batch = Seq(
      IncidentEvent(1L, 100L * ns, 1L, "error"),
      IncidentEvent(2L, 150L * ns, 2L, "view"))
    input.addData(batch)
    q.processAllAvailable()
    input.addData(batch) // redelivery before the bucket closes
    q.processAllAvailable()
    input.addData(IncidentEvent(9L, 100000L * ns, 9L, "view"))
    q.processAllAvailable()
    input.addData(IncidentEvent(8L, 100001L * ns, 9L, "view"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("iv_replay").as[IncidentOut].collect()
      .filter(_.inc_id == 1L)
    assert(got.toSeq === Seq(IncidentOut(1L, 100L, 2L, 2L)),
      "duplicated deliveries must not inflate counts or emit twice")
  }

  test("watermark delay bounds cross-batch lateness: delayed feed kept") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // one event arrives a micro-batch AFTER a higher-event-time row: with
    // the default 0-second delay the watermark has already passed it and
    // the incident undercounts (documented drop); with a delay covering
    // the disorder the count is exact
    def run(name: String, delay: String): Seq[IncidentOut] = {
      val input = MemoryStream[IncidentEvent]
      val q = IntervalStream(input.toDS(), delay).writeStream
        .format("memory").queryName(name)
        .outputMode("append").start()
      input.addData(
        IncidentEvent(10L, 1000L * ns, 1L, "error"),
        IncidentEvent(11L, 1400L * ns, 2L, "click"))
      q.processAllAvailable()
      // LATE: event-time 1200 < the 1400 already seen
      input.addData(IncidentEvent(12L, 1200L * ns, 3L, "view"))
      q.processAllAvailable()
      input.addData(IncidentEvent(99L, 100000L * ns, 99L, "view"))
      q.processAllAvailable()
      input.addData(IncidentEvent(98L, 100001L * ns, 99L, "view"))
      q.processAllAvailable()
      q.stop()
      spark.table(name).as[IncidentOut].collect().filter(_.inc_id == 10L).toSeq
    }
    assert(run("iv_late0", "0 seconds") === Seq(IncidentOut(10L, 1000L, 2L, 2L)),
      "0-second delay drops the cross-batch late event (the documented contract)")
    assert(run("iv_late10", "10 minutes") === Seq(IncidentOut(10L, 1000L, 3L, 3L)),
      "a delay covering the disorder keeps the late event")
  }

  test("drained stream reproduces the batch sweep-line incident table") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val raw = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type").collect()
      .map(r => IncidentEvent(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .sortBy(e => (e.ts, e.event_id))

    val input = MemoryStream[IncidentEvent]
    val q = IntervalStream(input.toDS()).writeStream
      .format("memory").queryName("iv_parity")
      .outputMode("append").start()
    raw.grouped(raw.length / 4 + 1).foreach { b =>
      input.addData(b.toSeq)
      q.processAllAvailable()
    }
    // close every remaining bucket: two far-future ticks (the first
    // advances the watermark, the second fires the timeouts)
    val far = raw.last.ts / ns + 10L * W
    input.addData(IncidentEvent(-1L, far * ns, -1L, "view"))
    q.processAllAvailable()
    input.addData(IncidentEvent(-2L, (far + 1L) * ns, -1L, "view"))
    q.processAllAvailable()
    q.stop()

    val want = Events.intervalJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = spark.table("iv_parity").as[IncidentOut].collect()
      .filter(_.inc_id >= 0L)
      .sortBy(o => (-o.n_events, o.inc_id)).take(want.size)
      .map(o => (o.inc_id, o.n_events, o.n_users)).toSeq
    assert(got.nonEmpty)
    assert(got === want,
      "drained incidents (top-k, batch tie order) must equal the batch operator")
  }
}
