package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Hashtag extraction — reference semantics (ChangesetHashtags.java:20-34).
    * The comment field is synthesized deterministically from `documents`
    * (URL prefix + '#'-marked words) so the URL-strip and filter rules are
    * exercised; inputs are ASCII so the Java and RE2 hashtag patterns agree.
    */
  def csHashtags(s: SparkSession, dir: String): DataFrame = {
    // Reference pattern (Java regex); on ASCII input it equals the RE2
    // variant used in the oracle.
    val hashtagPattern = "#[^\\u2000-\\u206F\\u2E00-\\u2E7F\\v\\h\\\\'!\"#$%()*,./:;<=>?@\\[\\]^`{|}~]+"
    Tables.documents(s, dir)
      .withColumn("comment",
        concat(lit("see http://example.org/x#frag "),
          regexp_replace(col("text"), " (s)", " #$1")))
      .withColumn("no_urls", regexp_replace(col("comment"), "http\\S*", ""))
      .withColumn("raw_tags", regexp_extract_all(col("no_urls"), lit(hashtagPattern), lit(0)))
      .withColumn("hashtags", array_join(array_sort(array_distinct(
        filter(transform(col("raw_tags"), t => substring(t, 2, 1000000)),
          t => length(t) >= 2 && !t.rlike("^[0-9]+$")))), ","))
      .select(col("doc_id"), col("hashtags"))
  }

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
    * the `comment` tag), lifecycle timestamps and num_changes. The fact
    * side never shuffles — changeset dims are small relative to
    * contributions at any scale.
    *
    * @param contribs    any frame with a `changeset` column
    * @param changesetDb OsmXml.readChangesets output (id, created_at,
    *                    closed_at, uid, user, num_changes, tags)
    */
  def enrichWithChangesetDb(contribs: DataFrame, changesetDb: DataFrame): DataFrame = {
    val hashtagPattern = "#[^\\u2000-\\u206F\\u2E00-\\u2E7F\\v\\h\\\\'!\"#$%()*,./:;<=>?@\\[\\]^`{|}~]+"
    val cs = changesetDb.select(
      col("id").as("changeset"),
      col("created_at").as("cs_created_at"),
      col("closed_at").as("cs_closed_at"),
      col("num_changes").as("cs_num_changes"),
      element_at(col("tags"), "created_by").as("cs_editor"),
      array_join(array_sort(array_distinct(
        filter(transform(
          regexp_extract_all(
            regexp_replace(coalesce(element_at(col("tags"), "comment"), lit("")), "http\\S*", ""),
            lit(hashtagPattern), lit(0)),
          t => substring(t, 2, 1000000)),
          t => length(t) >= 2 && !t.rlike("^[0-9]+$")))), ",").as("cs_hashtags"))
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
    val e = Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000"))
    def changesets(ev: DataFrame): DataFrame =
      sessionize(ev).groupBy("user_id", "cs_seq")
        .agg(min("ts_us").as("created_at"), max("ts_us").as("closed_at"),
          count(lit(1)).as("num_changes"))
    val cut = Replication.CutUs
    ChangesetStore.upsert(s, store, changesets(e.filter(col("ts_us") <= cut)),
      Seq("user_id", "cs_seq"))
    val touched = e.filter(col("ts_us") > cut).select("user_id").distinct()
    ChangesetStore.upsert(s, store,
      changesets(e.join(broadcast(touched), Seq("user_id"), "left_semi")),
      Seq("user_id", "cs_seq"))
    val cs = ChangesetStore.read(s, store).select(
      col("user_id"), col("cs_seq"),
      col("created_at").as("cs_created_at"),
      col("closed_at").as("cs_closed_at"),
      col("num_changes").as("cs_num_changes"))
    sessionized(s, dir)
      .join(broadcast(cs), Seq("user_id", "cs_seq"))
      .select(col("event_id"), col("user_id"), col("cs_seq"),
        col("cs_created_at"), col("cs_closed_at"), col("cs_num_changes"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cs_build" -> (csBuild _),
    "cs_hashtags" -> (csHashtags _),
    "cs_enrich" -> (csEnrich _),
    "cs_db_enrich" -> (csDbEnrich _))

  private val sessionSql =
    """SELECT *, CAST(sum(gap_flag) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cs_seq
      |FROM (SELECT *,
      |        CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 21600000000 THEN 1 ELSE 0 END AS gap_flag
      |      FROM (SELECT *, epoch_us(ts) AS ts_us,
      |              lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts
      |            FROM events) a) b""".stripMargin

  val oracles: Map[String, String] = Map(
    "cs_build" ->
      s"""SELECT user_id, cs_seq, min(ts_us) AS created_at, max(ts_us) AS closed_at,
         |  count(*) AS num_changes,
         |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value
         |FROM ($sessionSql)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "cs_hashtags" ->
      """SELECT doc_id, coalesce(array_to_string(list_sort(list_distinct(
        |    list_filter(
        |      list_transform(
        |        regexp_extract_all(
        |          regexp_replace(
        |            'see http://example.org/x#frag ' || regexp_replace(text, ' (s)', ' #\1', 'g'),
        |            'http\S*', '', 'g'),
        |          '#[^\s''!"#$%()*,./:;<=>?@\[\]^`{|}~\\]+'),
        |        t -> t[2:]),
        |      t -> length(t) >= 2 AND NOT regexp_full_match(t, '[0-9]+')))), ','), '') AS hashtags
        |FROM documents ORDER BY doc_id""".stripMargin,
    "cs_db_enrich" ->
      s"""SELECT event_id, b.user_id, b.cs_seq, cs_created_at, cs_closed_at, cs_num_changes
         |FROM ($sessionSql) b
         |JOIN (SELECT user_id, cs_seq, min(ts_us) AS cs_created_at,
         |        max(ts_us) AS cs_closed_at, count(*) AS cs_num_changes
         |      FROM ($sessionSql) GROUP BY 1, 2) c
         |  ON b.user_id = c.user_id AND b.cs_seq = c.cs_seq
         |ORDER BY event_id""".stripMargin,
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
