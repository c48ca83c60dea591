package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** One edit from the replication stream (the minutely-diff record analog). */
case class EditEvent(event_id: Long, ts_us: Long, user_id: Long,
                     event_type: String, value: Double)

/** Current state of one entity after applying all edits seen so far —
  * what the reference keeps in RocksDB (ohsome-replication-update's
  * element state store).
  */
case class EntityState(osm_id: Long, last_ts: Long, last_event_id: Long,
                       n_edits: Long, status: String)

/** Structured-Streaming replication: continuously apply the edit stream to
  * per-entity state — the streaming equivalent of `Replication.replMerge`.
  *
  * The reference polls minutely diff files and mutates RocksDB
  * (ohsome-replication-update); here the state lives in Spark's managed
  * stream state (checkpointed, partitioned by entity id across executors),
  * updated via `mapGroupsWithState` — arbitrary-scale state with no
  * single-node KV bottleneck.
  */
object ReplicationStream {

  def updateState(id: Long, edits: Iterator[EditEvent],
                  state: GroupState[EntityState]): EntityState = {
    val prev = state.getOption.getOrElse(EntityState(id, Long.MinValue, -1L, 0L, "new"))
    var st = prev
    edits.foreach { e =>
      // latest-wins on (ts, event_id), counting every applied edit
      val newer = e.ts_us > st.last_ts ||
        (e.ts_us == st.last_ts && e.event_id > st.last_event_id)
      st = EntityState(
        osm_id = id,
        last_ts = if (newer) e.ts_us else st.last_ts,
        last_event_id = if (newer) e.event_id else st.last_event_id,
        n_edits = st.n_edits + 1,
        status = if (newer) {
          if (e.event_type == "error") "deleted" else "latest"
        } else st.status)
    }
    state.update(st)
    st
  }

  /** Wire a streaming Dataset of edits into the stateful upsert. */
  def apply(edits: Dataset[EditEvent]): Dataset[EntityState] = {
    import edits.sparkSession.implicits._
    edits.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateState)
  }

  /** Convenience runner: parquet events dir → in-memory sink table `name`. */
  def start(spark: SparkSession, eventsDir: String, name: String): StreamingQuery = {
    import spark.implicits._
    // events.ts is parquet timestamp[us] (TIMESTAMP_NTZ); with the session
    // zone pinned to UTC the cast below makes ts_us the same epoch-µs the
    // batch operators derive via Tables.events' nanos normalization.
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP_NTZ, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(eventsDir)
      .select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
      .as[EditEvent]
    apply(stream).writeStream
      .format("memory")
      .queryName(name)
      .outputMode(OutputMode.Update())
      .start()
  }
}
