package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SketchStreamSpec extends SparkSpec {

  test("streaming HLL converges to the batch operator's estimates") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all: Array[SketchEvent] = graft.Tables.events(spark, sfDir)
      .select("event_type", "user_id").collect()
      .map(r => SketchEvent(r.getString(0), r.getLong(1)))
    val (first, second) = all.splitAt(all.length / 2)

    val input = MemoryStream[SketchEvent]
    val q = SketchStream.estimates(input.toDS())
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode(SketchStream.Mode).start()
    input.addData(first.toSeq)
    q.processAllAvailable()
    val midCount = spark.table("hll_stream").count()
    input.addData(second.toSeq)
    q.processAllAvailable()
    q.stop()

    // rows after the first snapshot are the final per-type estimates
    val rows = spark.table("hll_stream").collect()
    val finalRows = rows.drop(midCount.toInt)
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    val batch = graft.operators.Sketches.sketchHll(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("hll_est")).toMap
    assert(finalRows.nonEmpty)
    assert(finalRows.view.mapValues(_._1).toMap === batch,
      "after both batches the stream must hold the batch registers")

    // register counts only grow: mid-stream snapshot per type has
    // n_nonzero <= final
    val mid = rows.take(midCount.toInt)
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    mid.foreach { case (t, n) =>
      assert(n <= finalRows(t)._2, s"register count shrank for $t")
    }
  }

  test("state re-fold is idempotent: replaying a batch leaves registers unchanged") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = (1L to 200L).map(u => SketchEvent("t", u))
    val input = MemoryStream[SketchEvent]
    val q = SketchStream.estimates(input.toDS())
      .writeStream.format("memory").queryName("hll_replay")
      .outputMode(SketchStream.Mode).start()
    input.addData(data)
    q.processAllAvailable()
    input.addData(data) // at-least-once redelivery of the same rows
    q.processAllAvailable()
    q.stop()
    val ests = spark.table("hll_replay").collect().map(_.getLong(1))
    assert(ests.length === 2)
    assert(ests(0) === ests(1), "replay must not move the estimate")
  }
}
