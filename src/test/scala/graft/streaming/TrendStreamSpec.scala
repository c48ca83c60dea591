package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming rolling-OLS trend: the drained stream must match the batch
  * evt_trend row for row, and the hour gate must absorb redelivery.
  */
class TrendStreamSpec extends SparkSpec {

  private def hourlyRates(): Array[HourRate] =
    graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("ts div 3600000000000").as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .collect()
      .map(r => HourRate(r.getString(0), r.getLong(1), r.getLong(2)))

  test("drained stream equals the batch evt_trend row for row") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = hourlyRates()
    val hours = all.map(_.hour).sorted
    val cut = hours(hours.length / 2)
    val (first, second) = all.partition(_.hour <= cut)

    val input = MemoryStream[HourRate]
    val q = TrendStream.trends(input.toDS())
      .writeStream.format("memory").queryName("trend_stream")
      .outputMode(TrendStream.Mode).start()
    input.addData(first.toSeq)
    q.processAllAvailable()
    input.addData(second.toSeq)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("trend_stream").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .sortBy(t => (t._1, t._2))
    val want = graft.operators.Events.trend(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .sortBy(t => (t._1, t._2))
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq,
      "streaming rolling OLS must equal the batch window exactly")
  }

  test("the hour gate makes at-least-once redelivery exactly-once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = Seq(HourRate("t", 100L, 4L), HourRate("t", 101L, 8L))
    val input = MemoryStream[HourRate]
    val q = TrendStream.trends(input.toDS())
      .writeStream.format("memory").queryName("trend_replay")
      .outputMode(TrendStream.Mode).start()
    input.addData(data)
    q.processAllAvailable()
    input.addData(data) // redelivery at/below the frontier — no effect
    input.addData(Seq(HourRate("t", 102L, 6L)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("trend_replay").collect()
      .map(r => (r.getLong(1), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).sortBy(_._1)
    // n=1 → null slope; n=2 over (100,4),(101,8): slope 4 → 4e6 ppm;
    // n=3 over y=(4,8,6): slope = 1e6·(3·1820−303·18)/(3·30605−303²) = 1e6
    assert(rows.toSeq === Seq(
      (100L, 1L, None),
      (101L, 2L, Some(4000000L)),
      (102L, 3L, Some(1000000L))))
  }
}
