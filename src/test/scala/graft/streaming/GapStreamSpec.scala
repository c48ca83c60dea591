package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class GapStreamSpec extends SparkSpec {

  private def batchGaps(): Array[(Long, Long, Long)] =
    graft.operators.Replication.replGap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  private def observedMinutes(): Array[Long] =
    graft.Tables.events(spark, sfDir)
      .selectExpr("(ts div 1000) div 60000000 AS seq")
      .distinct().orderBy("seq").collect().map(_.getLong(0))

  test("drained stream emits exactly the batch operator's gap set") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val minutes = observedMinutes()
    val (first, second) = minutes.splitAt(minutes.length / 2)

    val input = MemoryStream[MinuteSeq]
    val q = GapStream.gaps(input.toDS())
      .writeStream.format("memory").queryName("gap_stream")
      .outputMode(GapStream.Mode).start()
    input.addData(first.map(MinuteSeq(_)).toSeq)
    q.processAllAvailable()
    input.addData(second.map(MinuteSeq(_)).toSeq)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("gap_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(streamed.toSeq === batchGaps().toSeq,
      "in-order ingest must reproduce the batch gap set exactly")
  }

  test("redelivered micro-batch is a no-op (exactly-once gap emission)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = Seq(1L, 2L, 5L, 9L).map(MinuteSeq(_))
    val input = MemoryStream[MinuteSeq]
    val q = GapStream.gaps(input.toDS())
      .writeStream.format("memory").queryName("gap_replay")
      .outputMode(GapStream.Mode).start()
    input.addData(data)
    q.processAllAvailable()
    val afterFirst = spark.table("gap_replay").count()
    input.addData(data) // at-least-once redelivery
    q.processAllAvailable()
    q.stop()
    assert(afterFirst === 2L, "gaps 3-4 and 6-8 expected")
    assert(spark.table("gap_replay").count() === afterFirst,
      "replaying the same sequences must emit nothing new")
  }

  test("out-of-order arrival within a micro-batch still walks in sequence order") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[MinuteSeq]
    val q = GapStream.gaps(input.toDS())
      .writeStream.format("memory").queryName("gap_ooo")
      .outputMode(GapStream.Mode).start()
    input.addData(Seq(7L, 1L, 4L, 1L).map(MinuteSeq(_)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("gap_ooo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.toSeq === Seq((2L, 3L, 2L), (5L, 6L, 2L)))
  }
}
