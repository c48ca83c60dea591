package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class TimedEdit(ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

class WindowedStatsSpec extends SparkSpec {

  private def t(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling windows emit closed windows in append mode") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TimedEdit]
    val q = WindowedStats(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_stats")
      .outputMode("append").start()

    // two windows of data: [10:00,10:10) and [10:10,10:20)
    input.addData(
      TimedEdit(t(1), 1, "click", 1.0), TimedEdit(t(2), 2, "click", 2.0),
      TimedEdit(t(11), 1, "view", 5.0))
    q.processAllAvailable()
    // advance watermark far past both windows → both close and emit
    input.addData(TimedEdit(t(40), 3, "click", 1.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_stats")
      .orderBy("win_start", "event_type").collect()
    val byWin = rows.map(r => (r.getTimestamp(0).toString.substring(11, 16),
      r.getString(2), r.getLong(3), r.getAs[Double]("sum_value")))
    assert(byWin.toSeq === Seq(
      ("10:00", "click", 2L, 3.0),
      ("10:10", "view", 1L, 5.0)))
  }

  test("late data within the lateness bound still lands in its window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[TimedEdit]
    val q = WindowedStats(input.toDF(), "10 minutes", "15 minutes")
      .writeStream.format("memory").queryName("win_late")
      .outputMode("append").start()

    input.addData(TimedEdit(t(1), 1, "click", 1.0), TimedEdit(t(12), 2, "click", 1.0))
    q.processAllAvailable()
    input.addData(TimedEdit(t(3), 3, "click", 7.0)) // late but within 15m bound
    q.processAllAvailable()
    input.addData(TimedEdit(t(59), 4, "click", 1.0)) // push watermark → close all
    q.processAllAvailable()
    q.stop()

    val first = spark.table("win_late")
      .filter(col("win_start") === t(0)).collect()
    assert(first.length === 1)
    assert(first.head.getLong(3) === 2L)                   // includes the late row
    assert(first.head.getAs[Double]("sum_value") === 8.0)
  }
}
