package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class LifecycleStreamSpec extends SparkSpec {

  /** Batch ledger rows (week, active, new, retained, resurrected, churned). */
  private def batchLedger(): Array[(Long, Long, Long, Long, Long)] =
    graft.operators.Events.lifecycle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)

  private def userWeeks(): Array[UserWeek] =
    graft.Tables.events(spark, sfDir)
      .selectExpr("user_id", "(ts div 1000) div 604800000000 AS week")
      .distinct().orderBy("week", "user_id").collect()
      .map(r => UserWeek(r.getLong(0), r.getLong(1)))

  test("drained transitions reproduce the batch weekly ledger exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // week-ordered ingest (the parity precondition), split mid-stream
    val uw = userWeeks()
    val (a, b) = uw.splitAt(uw.length / 2)
    val input = MemoryStream[UserWeek]
    val q = LifecycleStream.transitions(input.toDS())
      .writeStream.format("memory").queryName("life_stream")
      .outputMode(LifecycleStream.Mode).start()
    input.addData(a.toSeq); q.processAllAvailable()
    input.addData(b.toSeq); q.processAllAvailable()
    q.stop()
    val ledger = spark.table("life_stream")
      .groupBy("week").pivot("state", Seq("new", "retained", "resurrected"))
      .count().na.fill(0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val batch = batchLedger()
    assert(ledger.length === batch.length)
    for (((w, nw, rt, rs), (bw, bActive, bNew, bRet, bRes)) <- ledger.zip(batch)) {
      assert(w === bw)
      assert(nw === bNew, s"week $w new")
      assert(rt === bRet, s"week $w retained")
      assert(rs === bRes, s"week $w resurrected")
      assert(nw + rt + rs === bActive, s"week $w states partition actives")
    }
  }

  test("redelivered micro-batch is a no-op (exactly-once transitions)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = Seq(UserWeek(1, 10), UserWeek(1, 11), UserWeek(2, 10))
    val input = MemoryStream[UserWeek]
    val q = LifecycleStream.transitions(input.toDS())
      .writeStream.format("memory").queryName("life_replay")
      .outputMode(LifecycleStream.Mode).start()
    input.addData(data); q.processAllAvailable()
    val n1 = spark.table("life_replay").count()
    input.addData(data); q.processAllAvailable() // at-least-once redelivery
    q.stop()
    assert(n1 === 3L)
    assert(spark.table("life_replay").count() === n1,
      "replay must emit nothing new")
  }

  test("out-of-order boundary is pinned: a late earlier week is dropped, not reclassified") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[UserWeek]
    val q = LifecycleStream.transitions(input.toDS())
      .writeStream.format("memory").queryName("life_ooo")
      .outputMode(LifecycleStream.Mode).start()
    input.addData(Seq(UserWeek(7, 20))); q.processAllAvailable()
    input.addData(Seq(UserWeek(7, 18))); q.processAllAvailable() // late
    q.stop()
    val rows = spark.table("life_ooo").collect()
      .map(r => (r.getLong(0), r.getString(2)))
    assert(rows.toSeq === Seq((20L, "new")),
      "the late week 18 must not emit or disturb state — the documented " +
        "divergence from batch, which would classify 18 as the 'new' week")
  }
}
