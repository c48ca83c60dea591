package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Replication
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

class ReplicationStreamSpec extends SparkSpec {

  test("streaming upsert converges to the batch latest-state result") {
    import spark.implicits._
    val streamDir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = ReplicationStream.start(spark, streamDir.toString, "repl_state")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("repl_state")
      .groupBy("osm_id")
      .agg(max("last_ts").as("last_ts")) // memory/update sink keeps all micro-batch emissions
      .orderBy("osm_id")
      .as[(Long, Long)].collect().toSeq

    val batch = Tables.events(spark, sfDir)
      .withColumn("ts_us", expr("ts div 1000"))
      .groupBy(col("user_id").as("osm_id"))
      .agg(max("ts_us").as("last_ts"))
      .orderBy("osm_id")
      .as[(Long, Long)].collect().toSeq

    assert(streamed == batch)
  }

  test("updateState applies latest-wins with edit counting") {
    val edits = Iterator(
      EditEvent(1, 100L, 7L, "click", 1.0),
      EditEvent(2, 200L, 7L, "error", 2.0),
      EditEvent(3, 150L, 7L, "view", 3.0)) // out-of-order straggler
    val state = new TestGroupState[EntityState]
    val st = ReplicationStream.updateState(7L, edits, state)
    assert(st.n_edits == 3)
    assert(st.last_ts == 200L)
    assert(st.status == "deleted") // newest edit is the deletion
  }
}

/** Minimal in-memory GroupState for unit-testing state functions. */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  private var value: Option[S] = None
  private var removed = false
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(newValue: S): Unit = { value = Some(newValue); removed = false }
  override def remove(): Unit = { value = None; removed = true }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
