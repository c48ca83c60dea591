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
  }

  /** Tolerance for the nearest as-of match: 6 hours in µs. */
  val NearTolUs = 21600000000L

  /** NEAREST-tolerance as-of join ([[AsofJoin.asofNearest]] under the
    * oracle): each click matches its nearest purchase in EITHER
    * direction, ties to the earlier row, and matches farther than 6 h
    * are dropped — pandas `merge_asof(direction='nearest', tolerance=…)`
    * semantics, the lookup `q13_asof`'s "latest before" gets wrong
    * whenever a fresher later reference exists. One union + one keyed
    * window sort computes both direction carries (two frames, same
    * exchange); the oracle composes DuckDB's two directional ASOF joins
    * with the same tie/tolerance rule.
    */
  def q34AsofNear(s: SparkSession, dir: String): DataFrame = {
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
    AsofJoin.asofNearest(clicks, purchases, "user_id", "click_us", "p_ts",
      Seq("p_id", "p_cents", "p_us"), NearTolUs)
      .select("user_id", "click_id", "click_us", "p_id", "p_cents", "p_us",
        "delta_us")
  }

  /** Minor-version numbering under the oracle: way versions and member
    * node edits are derived deterministically from the events table
    * (clicks = a way's major versions, views = node edits, refs =
    * modular-arithmetic membership), then [[MinorVersions.compute]] runs
    * the real interval join + renumbering. The oracle replays the whole
    * derivation in SQL, so the interval-membership semantics (edit
    * strictly inside the version's validity window, minor counter reset
    * per major version) are engine-parity-checked — previously this
    * operator was spec-only.
    */
  def minorVersions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000"))
    // spreadIfSmall on the window key (r15): the version chain + refs
    // derivation behind Exchange(way_id) was AQE-coalesced to ONE task
    // (0.7 s serial in a 32-core session, ProfileKey r15); the window
    // needs the way_id exchange anyway, so pin its width — no-op at
    // cluster scale
    val ways = Tables.spreadIfSmall(s, dir, "events",
        e.filter(col("event_type") === "click")
          .select(col("user_id").as("way_id"), col("ts_us").as("valid_from"),
            col("event_id")),
        Seq("way_id"))
      .withColumn("osm_version", row_number().over(
        Window.partitionBy("way_id").orderBy("valid_from", "event_id")))
      .withColumn("refs", array(col("way_id") % 100,
        (col("way_id") + 37) % 100, col("event_id") % 100))
      .select("way_id", "osm_version", "valid_from", "refs")
    val nodeEdits = e.filter(col("event_type") === "view")
      .select((col("event_id") % 100).as("node_id"), col("ts_us").as("ts"))
    MinorVersions.compute(ways, nodeEdits)
      .select(col("way_id"), col("osm_version"), col("ts"),
        col("trigger").as("trig"), col("osm_minor_version"))
  }

  /** Changeset-granularity minors (the reference-faithful grouping —
    * [[MinorVersions.computeChangesets]]): the same synthetic
    * way/node-edit frames as `minor_versions` plus a coarse changeset id
    * (`event_id % 7`), so same-changeset runs genuinely collapse and
    * edits sharing the major's changeset genuinely fold away.
    */
  def minorVersionsCs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000"))
    // spreadIfSmall on the window key — same serial-window fix as
    // [[minorVersions]] (r15)
    val ways = Tables.spreadIfSmall(s, dir, "events",
        e.filter(col("event_type") === "click")
          .select(col("user_id").as("way_id"), col("ts_us").as("valid_from"),
            col("event_id")),
        Seq("way_id"))
      .withColumn("osm_version", row_number().over(
        Window.partitionBy("way_id").orderBy("valid_from", "event_id")))
      .withColumn("changeset", col("event_id") % 7)
      .withColumn("refs", array(col("way_id") % 100,
        (col("way_id") + 37) % 100, col("event_id") % 100))
      .select("way_id", "osm_version", "valid_from", "changeset", "refs")
    val nodeEdits = e.filter(col("event_type") === "view")
      .select((col("event_id") % 100).as("node_id"), col("ts_us").as("ts"),
        (col("event_id") % 7).as("changeset"))
    MinorVersions.computeChangesets(ways, nodeEdits)
      .select(col("way_id"), col("osm_version"), col("ts"),
        col("changeset").as("cs"), col("n_edits"), col("osm_minor_version"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_asof" -> (q13Asof _),
    "q34_asof_near" -> (q34AsofNear _),
    "minor_versions" -> (minorVersions _),
    "minor_versions_cs" -> (minorVersionsCs _))

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
        |ORDER BY click_id""".stripMargin,
    "q34_asof_near" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
         |             CAST(round(value * 100) AS BIGINT) AS cents FROM events),
         |c AS (SELECT user_id, event_id AS click_id, ts_us AS click_us
         |      FROM e WHERE event_type = 'click'),
         |p AS (SELECT user_id, event_id AS p_id, cents AS p_cents, ts_us AS p_us
         |      FROM e WHERE event_type = 'purchase'),
         |prev AS (SELECT c.user_id, c.click_id, c.click_us,
         |    p.p_id AS b_id, p.p_cents AS b_cents, p.p_us AS b_us
         |  FROM c ASOF LEFT JOIN p
         |    ON c.user_id = p.user_id AND p.p_us <= c.click_us),
         |nxt AS (SELECT c.click_id, p.p_id AS n_id, p.p_cents AS n_cents,
         |    p.p_us AS n_us
         |  FROM c ASOF LEFT JOIN p
         |    ON c.user_id = p.user_id AND p.p_us > c.click_us),
         |j AS (SELECT prev.*, n_id, n_cents, n_us
         |  FROM prev JOIN nxt USING (click_id)),
         |pick AS (SELECT user_id, click_id, click_us,
         |    CASE WHEN b_us IS NOT NULL
         |           AND (n_us IS NULL OR click_us - b_us <= n_us - click_us)
         |         THEN 0 WHEN n_us IS NOT NULL THEN 1 END AS side,
         |    b_id, b_cents, b_us, n_id, n_cents, n_us FROM j),
         |sel AS (SELECT user_id, click_id, click_us,
         |    CASE side WHEN 0 THEN b_id WHEN 1 THEN n_id END AS p_id,
         |    CASE side WHEN 0 THEN b_cents WHEN 1 THEN n_cents END AS p_cents,
         |    CASE side WHEN 0 THEN b_us WHEN 1 THEN n_us END AS p_us
         |  FROM pick)
         |SELECT user_id, click_id, click_us,
         |  CASE WHEN abs(click_us - p_us) <= $NearTolUs THEN p_id END AS p_id,
         |  CASE WHEN abs(click_us - p_us) <= $NearTolUs THEN p_cents END AS p_cents,
         |  CASE WHEN abs(click_us - p_us) <= $NearTolUs THEN p_us END AS p_us,
         |  CASE WHEN abs(click_us - p_us) <= $NearTolUs
         |       THEN abs(click_us - p_us) END AS delta_us
         |FROM sel ORDER BY click_id""".stripMargin,
    "minor_versions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |ways AS (
        |  SELECT user_id AS way_id, ts_us AS valid_from, event_id,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS INT) AS osm_version
        |  FROM e WHERE event_type = 'click'),
        |vers AS (
        |  SELECT way_id, osm_version, valid_from,
        |    lead(valid_from) OVER (PARTITION BY way_id ORDER BY osm_version) AS valid_to,
        |    [way_id % 100, (way_id + 37) % 100, event_id % 100] AS refs
        |  FROM ways),
        |nodes AS (SELECT event_id % 100 AS node_id, ts_us AS ts
        |          FROM e WHERE event_type = 'view'),
        |member_edits AS (
        |  SELECT v.way_id, v.osm_version, n.ts, 'MINOR_GEOMETRY' AS trig
        |  FROM (SELECT way_id, osm_version, valid_from, valid_to, unnest(refs) AS node_id
        |        FROM vers) v
        |  JOIN nodes n ON n.node_id = v.node_id
        |  WHERE n.ts > v.valid_from AND (v.valid_to IS NULL OR n.ts < v.valid_to)),
        |major AS (SELECT way_id, osm_version, valid_from AS ts, 'MAJOR' AS trig FROM vers),
        |un AS (SELECT * FROM major UNION ALL SELECT * FROM member_edits)
        |SELECT way_id, osm_version, ts, trig,
        |  CAST(row_number() OVER (PARTITION BY way_id, osm_version ORDER BY ts, trig) - 1 AS INT) AS osm_minor_version
        |FROM un ORDER BY way_id, osm_version, osm_minor_version""".stripMargin,
    "minor_versions_cs" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events),
        |ways AS (
        |  SELECT user_id AS way_id, ts_us AS valid_from, event_id,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS INT) AS osm_version
        |  FROM e WHERE event_type = 'click'),
        |vers AS (
        |  SELECT way_id, osm_version, valid_from,
        |    lead(valid_from) OVER (PARTITION BY way_id ORDER BY osm_version) AS valid_to,
        |    event_id % 7 AS major_cs,
        |    [way_id % 100, (way_id + 37) % 100, event_id % 100] AS refs
        |  FROM ways),
        |nodes AS (SELECT event_id % 100 AS node_id, ts_us AS ts, event_id % 7 AS edit_cs
        |          FROM e WHERE event_type = 'view'),
        |member_edits AS (
        |  -- collapsed per (ts, cs): the window order below is then TOTAL,
        |  -- so brk and grp (two separate window sorts) cannot disagree on
        |  -- tied rows
        |  SELECT v.way_id, v.osm_version, n.ts, n.edit_cs, count(*) AS cnt
        |  FROM (SELECT way_id, osm_version, valid_from, valid_to, major_cs, unnest(refs) AS node_id
        |        FROM vers) v
        |  JOIN nodes n ON n.node_id = v.node_id
        |  WHERE n.ts > v.valid_from AND (v.valid_to IS NULL OR n.ts < v.valid_to)
        |    AND n.edit_cs <> v.major_cs
        |  GROUP BY v.way_id, v.osm_version, n.ts, n.edit_cs),
        |runs AS (
        |  SELECT way_id, osm_version, ts, edit_cs, cnt,
        |    CASE WHEN lag(edit_cs) OVER w IS NULL
        |         OR lag(edit_cs) OVER w <> edit_cs THEN 1 ELSE 0 END AS brk
        |  FROM member_edits
        |  WINDOW w AS (PARTITION BY way_id, osm_version ORDER BY ts, edit_cs)),
        |grps AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY way_id, osm_version ORDER BY ts, edit_cs
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM runs),
        |g AS (
        |  SELECT way_id, osm_version, max(ts) AS ts, min(edit_cs) AS cs,
        |    sum(cnt) AS n_edits, grp
        |  FROM grps GROUP BY way_id, osm_version, grp),
        |major AS (SELECT way_id, osm_version, valid_from AS ts, major_cs AS cs,
        |    CAST(0 AS BIGINT) AS n_edits, CAST(0 AS BIGINT) AS grp FROM vers),
        |un AS (SELECT * FROM major UNION ALL SELECT * FROM g)
        |SELECT way_id, osm_version, ts, CAST(cs AS BIGINT) AS cs,
        |  CAST(n_edits AS BIGINT) AS n_edits,
        |  CAST(row_number() OVER (PARTITION BY way_id, osm_version ORDER BY grp) - 1 AS INT) AS osm_minor_version
        |FROM un ORDER BY way_id, osm_version, osm_minor_version""".stripMargin)
}
