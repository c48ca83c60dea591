package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SmoothStreamSpec extends SparkSpec {

  /** The corpus' hourly rates, the stream's input rows. */
  private def hourlyRates(): Array[HourRate] =
    graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .collect()
      .map(r => HourRate(r.getString(0), r.getLong(1), r.getLong(2)))

  test("drained stream equals the batch evt_smooth row for row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = hourlyRates()
    // split at a global hour boundary so batch 2 never carries an hour
    // below a type's already-folded frontier
    val hours = all.map(_.hour).sorted
    val cut = hours(hours.length / 2)
    val (first, second) = all.partition(_.hour <= cut)

    val input = MemoryStream[HourRate]
    val q = SmoothStream.smoothed(input.toDS())
      .writeStream.format("memory").queryName("smooth_stream")
      .outputMode(SmoothStream.Mode).start()
    input.addData(first.toSeq)
    q.processAllAvailable()
    input.addData(second.toSeq)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("smooth_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(t => (t._1, t._2))
    val want = graft.operators.Events.smooth(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(t => (t._1, t._2))
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq,
      "streaming EWMA must replay the batch recurrence exactly")
  }

  test("the hour gate makes at-least-once redelivery exactly-once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = Seq(HourRate("t", 1L, 10L), HourRate("t", 2L, 40L))
    val input = MemoryStream[HourRate]
    val q = SmoothStream.smoothed(input.toDS())
      .writeStream.format("memory").queryName("smooth_replay")
      .outputMode(SmoothStream.Mode).start()
    input.addData(data)
    q.processAllAvailable()
    input.addData(data) // redelivery: both hours at or below the frontier
    input.addData(Seq(HourRate("t", 3L, 5L)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("smooth_replay").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    // exactly one row per hour; the recurrence is the hand fold:
    // s1=100, s2=(1200+700)/10=190, s3=(150+1330)/10=148
    assert(rows.toSeq === Seq(
      (1L, 10L, 100L, false),
      (2L, 40L, 190L, true), // 100*40 > 15*100
      (3L, 5L, 148L, false)))
  }
}
