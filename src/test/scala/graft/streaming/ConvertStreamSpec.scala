package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming time-to-convert: exactly-once emission per user, the
  * before-signup purchase rule, and drained-stream == batch pairing.
  */
class ConvertStreamSpec extends SparkSpec {

  test("converts once, ignores pre-signup purchases and later duplicates") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ns = 1000000000L

    val input = MemoryStream[ConvertEvent]
    val q = ConvertStream(input.toDS()).writeStream
      .format("memory").queryName("conv_basic")
      .outputMode("append").start()

    input.addData(
      ConvertEvent(1L, 100L * ns, 1L, "purchase"), // before any signup: inert
      ConvertEvent(2L, 200L * ns, 1L, "signup"),
      ConvertEvent(3L, 260L * ns, 1L, "purchase"), // converts: ttc = 60
      ConvertEvent(4L, 300L * ns, 1L, "purchase"), // already converted: inert
      ConvertEvent(5L, 500L * ns, 2L, "signup"))   // never converts: no emit
    q.processAllAvailable()
    input.addData(
      ConvertEvent(6L, 900L * ns, 2L, "purchase")) // converts next batch
    q.processAllAvailable()
    q.stop()

    val got = spark.table("conv_basic").as[ConvertOut].collect()
      .sortBy(_.user_id)
    assert(got.toSeq === Seq(
      ConvertOut(1L, 200L, 260L, 60L),
      ConvertOut(2L, 500L, 900L, 400L)))
  }

  test("drained in-order stream equals the batch pairing on real events") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .as[ConvertEvent].collect().sortBy(e => (e.ts, e.event_id))

    val input = MemoryStream[ConvertEvent]
    val q = ConvertStream(input.toDS()).writeStream
      .format("memory").queryName("conv_drain")
      .outputMode("append").start()
    // two batches to exercise cross-batch state handoff
    val (a, b) = ev.splitAt(ev.length / 2)
    input.addData(a.toIndexedSeq); q.processAllAvailable()
    input.addData(b.toIndexedSeq); q.processAllAvailable()
    q.stop()

    val got = spark.table("conv_drain").as[ConvertOut].collect()
      .map(c => (c.user_id, c.s0, c.p0, c.ttc_s)).sortBy(_._1)

    // batch pairing: the same conditional-min fold Events.ttc performs
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val want = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("ts_s"))
      .withColumn("s0",
        min(when(col("event_type") === "signup", col("ts_s"))).over(w))
      .filter(col("s0").isNotNull)
      .groupBy("user_id")
      .agg(min("s0").as("s0"),
        min(when(col("event_type") === "purchase" && col("ts_s") >= col("s0"),
          col("ts_s"))).as("p0"))
      .filter(col("p0").isNotNull)
      .select(col("user_id"), col("s0"), col("p0"), (col("p0") - col("s0")).as("ttc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

    assert(got.toSeq === want.toSeq)
  }
}
