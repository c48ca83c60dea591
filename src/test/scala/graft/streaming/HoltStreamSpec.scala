package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class HoltStreamSpec extends SparkSpec {

  private def hourly(): Array[HourRate] =
    graft.Tables.events(spark, sfDir)
      .selectExpr("event_type", "ts div 3600000000000 AS hour")
      .groupBy("event_type", "hour").count()
      .orderBy("event_type", "hour").collect()
      .map(r => HourRate(r.getString(0), r.getLong(1), r.getLong(2)))

  test("drained stream state equals the batch operator's final level/trend") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = hourly()
    val (first, second) = all.splitAt(all.length / 2)

    val input = MemoryStream[HourRate]
    val q = HoltStream.trends(input.toDS())
      .writeStream.format("memory").queryName("holt_stream")
      .outputMode(HoltStream.Mode).start()
    input.addData(first.toSeq)
    q.processAllAvailable()
    input.addData(second.toSeq)
    q.processAllAvailable()
    q.stop()

    // last emitted row per type carries the final (level, trend)
    val rows = spark.table("holt_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    val streamed = rows.groupBy(_._1).map { case (t, rs) =>
      val last = rs.maxBy(_._2); t -> (last._3, last._4)
    }
    val batch = graft.operators.Events.holt(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(streamed === batch,
      "stream fold must land on the batch recurrence's final state")
    // every hour emitted exactly once
    assert(rows.length === hourly().length)
  }

  test("monotone hour gate: redelivery and late hours are dropped") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = Seq(HourRate("t", 1L, 5L), HourRate("t", 2L, 7L))
    val input = MemoryStream[HourRate]
    val q = HoltStream.trends(input.toDS())
      .writeStream.format("memory").queryName("holt_replay")
      .outputMode(HoltStream.Mode).start()
    input.addData(data)
    q.processAllAvailable()
    input.addData(data)                    // at-least-once redelivery
    input.addData(Seq(HourRate("t", 1L, 99L))) // genuinely late hour
    q.processAllAvailable()
    q.stop()
    assert(spark.table("holt_replay").count() === 2L,
      "replayed and late hours must fold nothing")
  }
}
