package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Event-time windowed statistics over the edit stream with a watermark —
  * the minutely-replication monitoring surface (edits/changesets per
  * window) expressed as a standard Structured Streaming windowed
  * aggregation.
  *
  * Watermark semantics: a window closes (and emits, in append mode) once
  * the watermark — max observed event time minus the allowed lateness —
  * passes its end; later stragglers inside the lateness bound still update
  * state, older ones are dropped. State size is bounded by
  * (windows in flight × groups), independent of stream length.
  */
object WindowedStats {

  /** @param edits     streaming Dataset with an event-time column `ts`
    *                  (timestamp), `user_id`, `event_type`, `value`
    * @param window_   tumbling window width, e.g. "1 hour"
    * @param lateness  allowed event lateness, e.g. "10 minutes"
    */
  def apply(edits: DataFrame, window_ : String, lateness: String): DataFrame =
    edits
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_edits"),
        approx_count_distinct("user_id").as("n_users"),
        sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n_edits"), col("n_users"), col("sum_value"))
}
