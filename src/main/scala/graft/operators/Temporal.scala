package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checked temporal queries over [[AsofJoin]].
  *
  * The operator itself (union + ordered window, one shuffle, no range
  * explosion) is spec-verified in TemporalSpec; this query puts the same
  * code path under the DuckDB oracle (`ASOF LEFT JOIN`), so engine parity
  * of the `<=`-latest semantics is checked end-to-end, nulls included.
  */
object Temporal {

  /** As-of enrichment: each click event picks up the latest purchase of
    * the same user at or before the click — the "which reference row was
    * in force at this timestamp" lookup (reference analog: enriching a
    * contribution with the changeset/boundary state at its edit time).
    * Clicks with no prior purchase keep NULL purchase columns.
    */
  def q13Asof(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("cents", round(col("value") * 100).cast("bigint"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts_us").as("click_us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("p_ts"),
        col("event_id").as("p_id"), col("cents").as("p_cents"),
        col("ts_us").as("p_us"))
    AsofJoin.asof(clicks, purchases, "user_id", "click_us", "p_ts",
      Seq("p_id", "p_cents", "p_us"))
      .select("user_id", "click_id", "click_us", "p_id", "p_cents", "p_us")
      .orderBy("click_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_asof" -> (q13Asof _))

  val oracles: Map[String, String] = Map(
    "q13_asof" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
        |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |c AS (SELECT user_id, event_id AS click_id, ts_us AS click_us
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS p_id, cents AS p_cents, ts_us AS p_us
        |      FROM e WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_id, c.click_us, p.p_id, p.p_cents, p.p_us
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND p.p_us <= c.click_us
        |ORDER BY click_id""".stripMargin)
}
