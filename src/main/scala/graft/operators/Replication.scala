package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Replication engine — the ohsome-replication(-update) analog.
  *
  * The reference keeps a RocksDB mirror of current element state and applies
  * minutely diffs (create/modify/delete) to emit updated contributions. In
  * Spark the same operation is a latest-wins upsert: union the base snapshot
  * with the diff batch and keep the newest version per entity — no local KV
  * store needed because the shuffle IS the distributed index.
  *
  * Scale: both sides partition by entity id; with the base stored bucketed
  * by entity id the upsert is a single co-partitioned window, and AQE
  * handles diff-batch skew.
  */
object Replication {

  /** Epoch-micros cut: events ≤ cut form the base snapshot, events > cut
    * are the incoming replication diff (2024-01-20T00:00:00Z).
    */
  val CutUs: Long = 1705708800000000L

  /** Apply a diff batch onto a snapshot: latest-wins upsert per entity. */
  def replMerge(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000"))
    val latestPerUser = Window.partitionBy("user_id").orderBy(desc("ts_us"), desc("event_id"))
    // Base snapshot: latest state as of the cut.
    val base = e.filter(col("ts_us") <= CutUs)
      .withColumn("rk", row_number().over(latestPerUser))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"),
        lit("base").as("src"))
    // Diff batch: replication updates after the cut.
    val diff = e.filter(col("ts_us") > CutUs)
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"),
        lit("update").as("src"))
    // Latest-wins upsert (updates are strictly newer than base rows).
    base.unionByName(diff)
      .withColumn("rk", row_number().over(latestPerUser))
      .filter(col("rk") === 1)
      .select(col("user_id").as("osm_id"), col("ts_us").as("last_ts"),
        col("event_type"), col("src"))
      .orderBy("osm_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "repl_merge" -> (replMerge _))

  val oracles: Map[String, String] = Map(
    "repl_merge" ->
      """WITH e AS (SELECT *, epoch_us(ts) AS ts_us FROM events),
        |base AS (
        |  SELECT user_id, ts_us, event_id, event_type, 'base' AS src
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rk
        |        FROM e WHERE ts_us <= 1705708800000000) t
        |  WHERE rk = 1),
        |diff AS (
        |  SELECT user_id, ts_us, event_id, event_type, 'update' AS src
        |  FROM e WHERE ts_us > 1705708800000000),
        |unioned AS (SELECT * FROM base UNION ALL SELECT * FROM diff)
        |SELECT user_id AS osm_id, ts_us AS last_ts, event_type, src
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts_us DESC, event_id DESC) AS rk
        |      FROM unioned) t
        |WHERE rk = 1 ORDER BY osm_id""".stripMargin)
}
