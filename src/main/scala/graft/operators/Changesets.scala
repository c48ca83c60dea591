package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changesets engine — the osm-changesets / ohsome-changesets analog.
  *
  * The reference ingests changeset metadata (created_at, closed_at,
  * num_changes, editor, hashtags) and joins it onto contributions
  * (ChangesetDb.java, docs/CLI.md "Join Changeset Tags"). Here changesets
  * are *derived* by sessionizing the edit stream (gap-based, the standard
  * session-window operator), and hashtag extraction follows
  * ChangesetHashtags.java:20-34 exactly: strip URLs, match the hashtag
  * pattern, drop '#', keep length >= 2, drop all-digit tags, distinct,
  * sorted.
  *
  * Scale: sessionization is a window over the same entity-keyed shuffle the
  * history engine uses; the changeset→contribution join is a self-join on
  * (user_id, cs_seq) that stays co-partitioned — no extra fact shuffle.
  */
object Changesets {

  /** Session gap: edits by one user within 6h belong to one changeset. */
  val GapUs: Long = 6L * 3600 * 1000000

  private val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")

  /** Per-user session sequence numbers (gaps-and-islands) over any frame
    * with `user_id`/`ts_us`/`event_id`.
    */
  private def sessionize(e: DataFrame): DataFrame =
    e.withColumn("gap_flag",
      when(col("ts_us") - lag("ts_us", 1).over(byUser) > GapUs || lag("ts_us", 1).over(byUser).isNull, 1)
        .otherwise(0))
      .withColumn("cs_seq", sum("gap_flag").over(
        Window.partitionBy("user_id").orderBy("ts_us", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

  /** Events with a per-user session sequence number. */
  private def sessionized(s: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000")))

  /** Build changesets: session windows → created_at/closed_at/num_changes. */
  def csBuild(s: SparkSession, dir: String): DataFrame =
    sessionized(s, dir)
      .groupBy("user_id", "cs_seq")
      .agg(min("ts_us").as("created_at"),
        max("ts_us").as("closed_at"),
        count(lit(1)).as("num_changes"),
        // fixed-point cents: exact, order-independent, and stringifies
        // identically in the driver's Spark-vs-DuckDB compare (DECIMAL
        // output columns do not — round-1 gate failure)
        sum(round(col("value") * 100).cast("bigint")).as("sum_value"))

  /** Reference hashtag pattern (ChangesetHashtags.java:19) — the regex IS
    * the spec, shared verbatim; on ASCII input the Java and RE2 (oracle)
    * variants agree.
    */
  private[operators] val HashtagPattern =
    "#[^\\u2000-\\u206F\\u2E00-\\u2E7F\\v\\h\\\\'!\"#$%()*,./:;<=>?@\\[\\]^`{|}~]+"

  /** Raw `#tag` matches of ONE changeset-tag field, with the iD-editor
    * URL strip applied per field BEFORE extraction (ChangesetHashtags
    * .java:26-29 maps each field through replaceAll separately — a URL at
    * one field's edge must never swallow the other field's text). A null
    * field yields an empty list, matching the reference's nonNull filter.
    */
  private def hashtagMatches(field: Column): Column =
    regexp_extract_all(
      regexp_replace(coalesce(field, lit("")), "http\\S*", ""),
      lit(HashtagPattern), lit(0))

  /** Hashtag extraction — reference semantics (ChangesetHashtags.java:20-34):
    * tags come from BOTH the dedicated `hashtags` changeset tag AND the
    * free-text `comment` tag (ChangesetHashtags.java:22
    * `Stream.of("hashtags", "comment")`), each URL-stripped separately,
    * with the union distinct-sorted. Both fields are synthesized
    * deterministically from `documents` — the comment from '#'-marked
    * text words behind a URL prefix, and (for every third doc) a
    * `hashtags` tag carrying a campaign tag, an all-digits tag (must be
    * filtered) and a tag that ALSO appears in the comment (must fold in
    * the distinct) — so the dual-source rule, the per-field URL strip and
    * every filter rule are load-bearing; inputs are ASCII so the Java and
    * RE2 hashtag patterns agree.
    */
  def csHashtags(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .withColumn("comment",
        concat(lit("see http://example.org/x#frag #missingmaps "),
          regexp_replace(col("text"), " (s)", " #$1")))
      .withColumn("ht_field",
        when(col("doc_id") % 3 === 0,
          concat(lit("#campaign"), col("doc_id") % 7,
            lit(" #12345 #missingmaps see http://osm.org/c#x"))))
      .withColumn("raw_tags",
        concat(hashtagMatches(col("ht_field")), hashtagMatches(col("comment"))))
      .withColumn("hashtags", array_join(array_sort(array_distinct(
        filter(transform(col("raw_tags"), t => substring(t, 2, 1000000)),
          t => length(t) >= 2 && !t.rlike("^[0-9]+$")))), ","))
      .select(col("doc_id"), col("hashtags"))
  }

  /** Changeset bounding boxes + the `geom geometry(polygon, 4326)` column
    * (docs/CLI.md changesets schema; OSMChangesets.java:75-87): per session
    * window, the extent of its LOCATED edits (only click/view/purchase
    * events carry a coordinate here — deterministic integer degrees from
    * the event id, same derivation as `geo_wkb`), the reference's
    * missing-extent guard (a changeset with no located edit has NULL
    * corners and a NULL geom — the empty-changeset case the reference
    * guards with null/NaN), the synthesized discussion count
    * (comments_count, Changeset.java:17 — stood in by the session's
    * `error` events), and the "touched region X" predicate `in_q`: bbox
    * intersects the literal query box [-20,60]×[0,45] (null extent →
    * false, matching a spatial index that never returns geometry-less
    * rows).
    *
    * Scale: the same single user-keyed window shuffle every changeset key
    * rides; bbox corners fold map-side (min/max partials), the WKB encode
    * is a codegen kernel on the session-scale aggregate, and the box
    * predicate is scan-side on that aggregate — nothing corpus-scale
    * happens after the one shuffle.
    */
  /** Per-session changeset frame with the located-edit extent (integer
    * degrees as doubles; null corners when no located edit) — shared by
    * [[csBbox]] and [[csRegionJoin]].
    */
  private def sessionBbox(s: SparkSession, dir: String): DataFrame = {
    val locatable = col("event_type").isin("click", "view", "purchase")
    sessionized(s, dir)
      .withColumn("lon", when(locatable, col("event_id") * 31 % 360 - 180))
      .withColumn("lat", when(locatable, col("event_id") * 17 % 180 - 90))
      .groupBy("user_id", "cs_seq")
      .agg(
        min("lon").cast("double").as("min_lon"),
        min("lat").cast("double").as("min_lat"),
        max("lon").cast("double").as("max_lon"),
        max("lat").cast("double").as("max_lat"),
        count(lit(1)).as("num_changes"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("comments_count"))
  }

  def csBbox(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    sessionBbox(s, dir)
      .withColumn("geom", call_function("wkb_box",
        col("min_lon"), col("min_lat"), col("max_lon"), col("max_lat")))
      .withColumn("in_q", coalesce(
        col("min_lon") <= 60 && col("max_lon") >= -20 &&
          col("min_lat") <= 45 && col("max_lat") >= 0, lit(false)))
  }

  /** "Changesets that touched region X" as a JOIN (`cs_region_join`) —
    * the query the reference's changesets-DB `geom` column exists for,
    * against a region TABLE (nation-derived 72°×36° boxes, the
    * `geo_country_join` grid): per region, the count of intersecting
    * changesets and their total edit volume. Geometry-less changesets
    * never match (the reference's spatial index semantics).
    *
    * Scale shape: the region grid is REGULAR, so box-overlap becomes an
    * EQUI-join — each changeset bbox explodes into the grid cells its
    * extent can overlap (≤ the few cells it spans; whole-world boxes cap
    * at the 25-cell grid), regions key by their own (gx, gy), and the
    * exact overlap predicate rides the join as a residual. No
    * nested-loop join, no per-pair geometry: the fact side shuffles on
    * the grid key it would already be bucketed by in a spatial layout.
    */
  /** The nation-derived 5×4 grid of region boxes shared by the batch
    * region join and its streaming face.
    */
  private[graft] def regionBoxes(s: SparkSession, dir: String): DataFrame =
    Tables.nation(s, dir).select(
      col("n_name").as("country"),
      (col("n_nationkey") % 5).cast("long").as("gx"),
      (col("n_nationkey") / 5).cast("long").as("gy"),
      ((col("n_nationkey") % 5) * 72 - 180).cast("double").as("r_lon_min"),
      (expr("(n_nationkey div 5) * 36 - 90")).cast("double").as("r_lat_min"))

  /** Grid-cell candidate generation + exact bbox-overlap predicate
    * against the broadcast region table — the shared kernel of
    * [[csRegionJoin]] and [[graft.streaming.RegionStream]]. A changeset
    * frame with null extents loses those rows at the cell explode (a
    * null sequence explodes to nothing), matching a spatial index that
    * never returns geometry-less rows.
    */
  private[graft] def regionOverlaps(cs: DataFrame, boxes: DataFrame): DataFrame =
    cs
      // overlapping cells: gx ≥ ceil((min+180)/72)−1, gx ≤ (max+180) div 72
      // (corners are integer-valued, so div is exact floor on the
      // non-negative shifted degrees); the exact predicate below keeps
      // boundary semantics regardless of the conservative range
      .withColumn("gx", explode(expr(
        "sequence(greatest(0L, (cast(min_lon as long) + 251) div 72 - 1)," +
          " least(4L, (cast(max_lon as long) + 180) div 72))")))
      .withColumn("gy", explode(expr(
        "sequence(greatest(0L, (cast(min_lat as long) + 125) div 36 - 1)," +
          " least(4L, (cast(max_lat as long) + 90) div 36))")))
      .join(broadcast(boxes), Seq("gx", "gy"))
      .filter(col("min_lon") <= col("r_lon_min") + 72 &&
        col("max_lon") >= col("r_lon_min") &&
        col("min_lat") <= col("r_lat_min") + 36 &&
        col("max_lat") >= col("r_lat_min"))

  def csRegionJoin(s: SparkSession, dir: String): DataFrame =
    regionOverlaps(sessionBbox(s, dir), regionBoxes(s, dir))
      .groupBy("country")
      .agg(count(lit(1)).as("n_changesets"), sum("num_changes").as("n_edits"))

  /** Contribution ← changeset enrichment join (the `--changeset-db` join,
    * docs/CLI.md): each edit gets its changeset struct fields.
    */
  def csEnrich(s: SparkSession, dir: String): DataFrame = {
    // full-frame windows over (user_id, cs_seq): clustering on user_id
    // already satisfies the finer spec, so the changeset struct costs no
    // second shuffle and no join-back (cf. Contributions.contribFull)
    val byCs = Window.partitionBy("user_id", "cs_seq")
    sessionized(s, dir)
      .withColumn("created_at", min("ts_us").over(byCs))
      .withColumn("closed_at", max("ts_us").over(byCs))
      .withColumn("num_changes", count(lit(1)).over(byCs))
      .withColumn("editor", concat(lit("editor/"), col("user_id") % 7))
      .select(col("event_id"), col("user_id"), col("cs_seq"),
        col("created_at"), col("closed_at"), col("num_changes"), col("editor"))
  }

  /** Enrich contributions with an ingested changeset DB (the reference's
    * `--changeset-db` join, ChangesetDb.java / docs/CLI.md): the changeset
    * table parsed from XML (OsmXml.readChangesets) broadcasts onto the
    * contribution stream keyed by changeset id, attaching editor
    * (`created_by` tag), hashtags (ChangesetHashtags.java:20-34 rules over
    * BOTH the dedicated `hashtags` tag AND the `comment` tag —
    * ChangesetHashtags.java:22 `Stream.of("hashtags", "comment")`; URL
    * stripping is per-field, the union is distinct-sorted), lifecycle
    * timestamps and num_changes. The fact side never shuffles — changeset
    * dims are small relative to contributions at any scale.
    *
    * @param contribs    any frame with a `changeset` column
    * @param changesetDb OsmXml.readChangesets output (id, created_at,
    *                    closed_at, uid, user, num_changes, tags)
    */
  def enrichWithChangesetDb(contribs: DataFrame, changesetDb: DataFrame): DataFrame = {
    graft.functions.GeoFunctions.register(contribs.sparkSession)
    // bbox extent → the docs/CLI.md `geom geometry(polygon, 4326)` column
    // (hex WKB; null under the reference's missing/NaN-corner guard) —
    // tolerated absent for changeset frames predating the extent columns
    val hasBbox = changesetDb.columns.contains("min_lon")
    val geomCols =
      if (hasBbox) Seq(
        call_function("wkb_box", col("min_lon"), col("min_lat"),
          col("max_lon"), col("max_lat")).as("cs_geom"))
      else Seq(lit(null).cast("string").as("cs_geom"))
    val commentCols =
      if (changesetDb.columns.contains("comments_count"))
        Seq(col("comments_count").as("cs_comments_count"))
      else Seq(lit(0L).as("cs_comments_count"))
    val cs = changesetDb.select(Seq(
      col("id").as("changeset"),
      col("created_at").as("cs_created_at"),
      col("closed_at").as("cs_closed_at"),
      col("num_changes").as("cs_num_changes")) ++ commentCols ++ geomCols ++ Seq(
      element_at(col("tags"), "created_by").as("cs_editor"),
      array_join(array_sort(array_distinct(
        filter(transform(
          concat(
            hashtagMatches(element_at(col("tags"), "hashtags")),
            hashtagMatches(element_at(col("tags"), "comment"))),
          t => substring(t, 2, 1000000)),
          t => length(t) >= 2 && !t.rlike("^[0-9]+$")))), ",").as("cs_hashtags")): _*)
    contribs.join(broadcast(cs), Seq("changeset"), "left")
  }

  /** Persistent changeset store lifecycle + enrichment (`cs_db_enrich`):
    * the ChangesetDB.java resumable-upsert path as a first-class store.
    * Two incremental batches load a [[graft.sources.ChangesetStore]]:
    *
    *  1. changesets sessionized from events ≤ cut (the initial bulk load);
    *  2. refreshed changesets for ONLY the users with post-cut events
    *     (the incremental update), keyed (user_id, cs_seq).
    *
    * Latest-wins upsert of batch 2 provably reproduces the one-shot global
    * sessionization: appending later events can only extend a user's last
    * session or open new ones (gap flags of earlier edits are unchanged),
    * so refreshed rows replace/extend and untouched users' batch-1 rows
    * are already global. The committed store then broadcast-joins onto the
    * edit stream — the fact side never shuffles for the enrichment, same
    * as `enrichWithChangesetDb`.
    */
  def csDbEnrich(s: SparkSession, dir: String): DataFrame = {
    import graft.sources.ChangesetStore
    val store = Scratch.scratch("graft-cs-store").toString
    // ONE sessionize pass (r15, guide §1.2): the per-user session window
    // commutes with both batch filters — batch 1 keeps each user's
    // ts-prefix (every kept row's in-window predecessors sort ≤ cut too,
    // so its gap_flag and prefix-sum cs_seq are unchanged), batch 2 keeps
    // WHOLE users (the window is per-user) — so both upsert batches and
    // the final enrichment consume the same sessionized frame instead of
    // re-shuffling and re-windowing the event stream three times.
    // Checkpointed: four consumers (two batches, `touched`, enrichment).
    val sess = sessionized(s, dir).localCheckpoint(true)
    def changesets(se: DataFrame): DataFrame =
      se.groupBy("user_id", "cs_seq")
        .agg(min("ts_us").as("created_at"), max("ts_us").as("closed_at"),
          count(lit(1)).as("num_changes"),
          // the discussion count (Changeset.java:17), stood in by the
          // session's `error` events — ingested with the row, exposed in
          // the enrichment struct like num_changes
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("comments_count"))
    val cut = Replication.CutUs
    ChangesetStore.upsert(s, store,
      changesets(sess.filter(col("ts_us") <= cut)), Seq("user_id", "cs_seq"))
    val touched = sess.filter(col("ts_us") > cut).select("user_id").distinct()
    ChangesetStore.upsert(s, store,
      changesets(sess.join(broadcast(touched), Seq("user_id"), "left_semi")),
      Seq("user_id", "cs_seq"))
    val cs = ChangesetStore.read(s, store).select(
      col("user_id"), col("cs_seq"),
      col("created_at").as("cs_created_at"),
      col("closed_at").as("cs_closed_at"),
      col("num_changes").as("cs_num_changes"),
      col("comments_count").as("cs_comments_count"))
    sess
      .join(broadcast(cs), Seq("user_id", "cs_seq"))
      .select(col("event_id"), col("user_id"), col("cs_seq"),
        col("cs_created_at"), col("cs_closed_at"), col("cs_num_changes"),
        col("cs_comments_count"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cs_build" -> (csBuild _),
    "cs_hashtags" -> (csHashtags _),
    "cs_enrich" -> (csEnrich _),
    "cs_bbox" -> (csBbox _),
    "cs_region_join" -> (csRegionJoin _),
    "cs_db_enrich" -> (csDbEnrich _))

  private val sessionSql =
    """SELECT *, CAST(sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cs_seq
      |FROM (SELECT *,
      |        CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 21600000000 THEN 1 ELSE 0 END AS gap_flag
      |      FROM (SELECT *, epoch_us(ts) AS ts_us,
      |              lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
      |            FROM events) a) b""".stripMargin

  /** DuckDB replay of cs_bbox: the same session windows, integer-degree
    * derivation, and bit-exact IEEE-754 LE hex construction as the
    * `geo_wkb` oracle (Geometry.bitsDef/leBitsSql), with the reference's
    * missing-extent guard as an explicit NULL case.
    */
  private val csBboxOracle: String = {
    import Geometry.{bitsDef, leBitsSql}
    val corner = Seq("lo" -> "min_lon_i", "la" -> "min_lat_i",
      "ho" -> "max_lon_i", "ha" -> "max_lat_i")
    val bitCols = corner.map { case (o, c) => bitsDef(c, o) }.mkString(",\n  ")
    def pt(x: String, y: String) = s"${leBitsSql(s"${x}_c", x)} || ${leBitsSql(s"${y}_c", y)}"
    s"""WITH s AS ($sessionSql),
       |loc AS (SELECT user_id, cs_seq, event_type,
       |    CASE WHEN event_type IN ('click','view','purchase')
       |      THEN (event_id * 31) % 360 - 180 END AS lon,
       |    CASE WHEN event_type IN ('click','view','purchase')
       |      THEN (event_id * 17) % 180 - 90 END AS lat
       |  FROM s),
       |b AS (SELECT user_id, cs_seq,
       |    min(lon) AS min_lon_i, min(lat) AS min_lat_i,
       |    max(lon) AS max_lon_i, max(lat) AS max_lat_i,
       |    count(*) AS num_changes,
       |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS comments_count
       |  FROM loc GROUP BY 1, 2),
       |bits AS (SELECT *,
       |  min_lon_i AS lo_c, min_lat_i AS la_c, max_lon_i AS ho_c, max_lat_i AS ha_c,
       |  $bitCols
       |  FROM b)
       |SELECT user_id, cs_seq,
       |  CAST(min_lon_i AS DOUBLE) AS min_lon, CAST(min_lat_i AS DOUBLE) AS min_lat,
       |  CAST(max_lon_i AS DOUBLE) AS max_lon, CAST(max_lat_i AS DOUBLE) AS max_lat,
       |  num_changes, comments_count,
       |  CASE WHEN min_lon_i IS NULL THEN NULL ELSE
       |    '010300000001000000' || '05000000' ||
       |    ${pt("lo", "la")} || ${pt("ho", "la")} || ${pt("ho", "ha")} ||
       |    ${pt("lo", "ha")} || ${pt("lo", "la")}
       |  END AS geom,
       |  coalesce(min_lon_i <= 60 AND max_lon_i >= -20
       |    AND min_lat_i <= 45 AND max_lat_i >= 0, false) AS in_q
       |FROM bits ORDER BY user_id, cs_seq""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "cs_build" ->
      s"""SELECT user_id, cs_seq, min(ts_us) AS created_at, max(ts_us) AS closed_at,
         |  count(*) AS num_changes,
         |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value
         |FROM ($sessionSql)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "cs_hashtags" ->
      """WITH f AS (SELECT doc_id,
        |    'see http://example.org/x#frag #missingmaps '
        |      || regexp_replace(text, ' (s)', ' #\1', 'g') AS comment,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      '#campaign' || (doc_id % 7)
        |        || ' #12345 #missingmaps see http://osm.org/c#x' END AS ht_field
        |  FROM documents)
        |SELECT doc_id, coalesce(array_to_string(list_sort(list_distinct(
        |    list_filter(
        |      list_transform(
        |        list_concat(
        |          regexp_extract_all(
        |            regexp_replace(coalesce(ht_field, ''), 'http\S*', '', 'g'),
        |            '#[^\s''!"#$%()*,./:;<=>?@\[\]^`{|}~\\]+'),
        |          regexp_extract_all(
        |            regexp_replace(comment, 'http\S*', '', 'g'),
        |            '#[^\s''!"#$%()*,./:;<=>?@\[\]^`{|}~\\]+')),
        |        t -> t[2:]),
        |      t -> length(t) >= 2 AND NOT regexp_full_match(t, '[0-9]+')))), ','), '') AS hashtags
        |FROM f ORDER BY doc_id""".stripMargin,
    "cs_db_enrich" ->
      s"""SELECT event_id, b.user_id, b.cs_seq, cs_created_at, cs_closed_at, cs_num_changes,
         |  cs_comments_count
         |FROM ($sessionSql) b
         |JOIN (SELECT user_id, cs_seq, min(ts_us) AS cs_created_at,
         |        max(ts_us) AS cs_closed_at, count(*) AS cs_num_changes,
         |        CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         |          AS cs_comments_count
         |      FROM ($sessionSql) GROUP BY 1, 2) c
         |  ON b.user_id = c.user_id AND b.cs_seq = c.cs_seq
         |ORDER BY event_id""".stripMargin,
    "cs_bbox" -> csBboxOracle,
    "cs_region_join" ->
      s"""WITH s AS ($sessionSql),
         |loc AS (SELECT user_id, cs_seq,
         |    CASE WHEN event_type IN ('click','view','purchase')
         |      THEN (event_id * 31) % 360 - 180 END AS lon,
         |    CASE WHEN event_type IN ('click','view','purchase')
         |      THEN (event_id * 17) % 180 - 90 END AS lat
         |  FROM s),
         |b AS (SELECT user_id, cs_seq,
         |    min(lon) AS min_lon, min(lat) AS min_lat,
         |    max(lon) AS max_lon, max(lat) AS max_lat,
         |    count(*) AS num_changes
         |  FROM loc GROUP BY 1, 2),
         |r AS (SELECT n_name AS country,
         |    CAST((n_nationkey % 5) * 72 - 180 AS BIGINT) AS r_lon_min,
         |    CAST((n_nationkey // 5) * 36 - 90 AS BIGINT) AS r_lat_min
         |  FROM nation)
         |SELECT country, count(*) AS n_changesets,
         |  CAST(sum(num_changes) AS BIGINT) AS n_edits
         |FROM b JOIN r
         |  ON b.min_lon <= r.r_lon_min + 72 AND b.max_lon >= r.r_lon_min
         | AND b.min_lat <= r.r_lat_min + 36 AND b.max_lat >= r.r_lat_min
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "cs_enrich" ->
      s"""SELECT event_id, b.user_id, b.cs_seq, created_at, closed_at, num_changes,
         |  'editor/' || (b.user_id % 7) AS editor
         |FROM ($sessionSql) b
         |JOIN (SELECT user_id, cs_seq, min(ts_us) AS created_at, max(ts_us) AS closed_at,
         |        count(*) AS num_changes
         |      FROM ($sessionSql) GROUP BY 1, 2) c
         |  ON b.user_id = c.user_id AND b.cs_seq = c.cs_seq
         |ORDER BY event_id""".stripMargin)
}
