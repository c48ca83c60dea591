package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession config for Verify / Bench / tests.
  *
  * - UTC session timezone: timestamp-NTZ ↔ epoch conversions must agree
  *   with the DuckDB oracle.
  * - `nanosAsLong`: the `events` table carries TIMESTAMP(NANOS) which Spark
  *   cannot represent; reading it as epoch-nanos BIGINT is lossless and
  *   matches DuckDB's `epoch_ns()` exactly.
  * - AQE handles runtime coalescing and skew joins at cluster scale; local
  *   shuffle partitions are sized to cores (set by the caller).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: String): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.driver.host", "localhost")
}
