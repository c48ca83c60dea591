package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Exactly-once file output across restarts: the parquet sink + checkpoint
  * pair must survive a stop/restart without duplicating or dropping
  * windows — the operational core of a continuously-updating contribution
  * pipeline (the reference's replication loop restarts from its stored
  * sequence number; Structured Streaming restarts from the checkpoint).
  */
class CheckpointRecoverySpec extends SparkSpec {

  private def t(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed agg to parquet sink recovers from checkpoint without dupes") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-sink-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString

    val input = MemoryStream[TimedEdit]
    def start() = WindowedStats(input.toDF(), "10 minutes", "5 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    // batch 1: fill window [10:00,10:10), then advance watermark past it
    val q1 = start()
    input.addData(TimedEdit(t(1), 1, "click", 1.0), TimedEdit(t(2), 2, "click", 2.0))
    q1.processAllAvailable()
    input.addData(TimedEdit(t(21), 3, "view", 1.0))
    q1.processAllAvailable()
    q1.stop()

    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst === 1, "first closed window should be emitted once")

    // restart from checkpoint: close the [10:20,10:30) window
    val q2 = start()
    input.addData(TimedEdit(t(45), 4, "click", 1.0))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out)
      .orderBy("win_start", "event_type").collect()
    val wins = rows.map(r => (r.getTimestamp(0).toString.substring(11, 16),
      r.getString(2), r.getLong(3)))
    assert(wins.toSeq === Seq(
      ("10:00", "click", 2L),  // from before the restart — exactly once
      ("10:20", "view", 1L)))  // closed after recovery
  }
}
