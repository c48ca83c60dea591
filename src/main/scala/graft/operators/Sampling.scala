package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Both operators key every keep/drop decision on a salted md5 of the
  * row id, never on `rand()`: the sample is reproducible across runs,
  * engines (the oracle replays it bit-for-bit in DuckDB), cluster sizes,
  * and partitionings — the property a data lineage audit needs. Both are
  * scan-shaped: the rate filter is a pure map (pushes down, no shuffle);
  * the quota is one hash partition per stratum with Spark 4's
  * WindowGroupLimit pushing the rank cutoff map-side.
  */
object Sampling {

  /** Hash bucket in [0, 100): first 24 bits of md5("smp|" + id), mod 100.
    * Engine-portable — DuckDB replays it as CAST('0x' || substr(md5(..)))
    * arithmetic on the same hex digits.
    */
  private def bucket(id: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("smp|"), id.cast("string"))), 1, 6), 16, 10)
      .cast("bigint") % 100

  /** Stratified rate sample: per-language sampling rates (downsample the
    * majority language, keep more of the tail) applied via the hash
    * bucket — the class-balancing step before training-corpus assembly.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket", bucket(col("doc_id")))
      .withColumn("rate", when(col("lang") === "en", lit(5)).otherwise(lit(20)))
      .filter(col("bucket") < col("rate"))
      .select("doc_id", "lang", "bucket")

  /** Per-stratum quota: keep the k=20 documents with the smallest salted
    * hash per language — a deterministic "reservoir" that caps any one
    * stratum (domain/source/language) regardless of its size. Hash-order
    * ranking means adding documents never evicts more than it must.
    */
  def sampleQuota(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("hk", md5(concat(lit("quota|"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy("hk", "doc_id")))
      .filter(col("rk") <= 20)
      .select("doc_id", "lang", "rk")

  /** Fine-grained hash bucket in [0, 1e6): first 32 bits of
    * md5("mix|" + id), mod 1e6 — ppm granularity so small target shares
    * still resolve.
    */
  private def bucketPpm(id: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("mix|"), id.cast("string"))), 1, 8), 16, 10)
      .cast("bigint") % 1000000L

  /** Domain-mixture sampling: fill each source's share of a target
    * mixture (in parts of 200: head sources 30, mid 10, tail 2) measured
    * in CHARACTERS, the token-budget proxy — the "data mixing" step that
    * turns a raw crawl into a pretraining recipe. A document survives iff
    *
    *   bucket_ppm * (200 * src_chars)  <  total_chars * part * 1e6
    *
    * i.e. hash-rate ≈ its source's budget / its source's volume, capped
    * at keep-everything when the source is smaller than its budget (the
    * inequality caps naturally — no branch). DECIMAL(38,0) cross-
    * multiplication instead of a rate division: exact at 100 TB corpus
    * sizes (≈1e14 chars × 1e6 ppm × 200 ≈ 2e22 ≪ 1e38) where BIGINT
    * would overflow and a double rate would round engine-dependently.
    *
    * Scale shape: two column-pruned scans of `documents` ((source,
    * n_chars) then the filter pass), one tiny per-source aggregate
    * broadcast back, zero fact-table shuffles — the decision is a pure
    * map, so Parquet filter/projection pushdown and AQE see through it.
    */
  def sampleMixture(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val dec = "decimal(38,0)"
    val part = when(col("source").isin("src0", "src1", "src2", "src3"), lit(30L))
      .when(col("source").isin("src4", "src5", "src6", "src7", "src8", "src9"), lit(10L))
      .otherwise(lit(2L))
    // total_chars rides the tiny per-source table as a window over all
    // 20 rows (NOT a crossJoin of a 1-row aggregate — that plans a
    // BroadcastNestedLoopJoin); the fact side then needs just the one
    // broadcast hash join on source.
    val perSrc = docs.groupBy("source")
      .agg(sum("n_chars").cast(dec).as("src_chars"))
      .withColumn("total_chars", expr("sum(src_chars) over ()"))
    docs
      .join(broadcast(perSrc), "source")
      .withColumn("part", part.cast(dec))
      .withColumn("bucket", bucketPpm(col("doc_id")))
      .filter(col("bucket").cast(dec) * lit(200L).cast(dec) * col("src_chars")
        < col("total_chars") * col("part") * lit(1000000L).cast(dec))
      .select(col("doc_id"), col("source"), col("bucket"))
  }

  /** Temperature-scaled source sampling (T = 0.5, the multilingual-LLM
    * upsampling rule of mC4/XLM-R): target share p_s ∝ count_s^T, so
    * low-resource sources are upweighted relative to their natural share.
    * The overall budget is total/4 documents; a document survives iff
    *
    *   bucket_ppm * count_s * Σw  <  budget * w_s * 1e6,
    *     where w_s = floor(sqrt(count_s) * 1e6)
    *
    * — the per-source keep rate budget·p_s/count_s, capped naturally at
    * keep-everything (bucket < 1e6 always). Exactness: `sqrt` is
    * IEEE-754 correctly rounded in BOTH engines (unlike `pow`, which is
    * why T is a square root and not a free parameter), the *1e6 product
    * and floor are deterministic double ops on identical inputs, and the
    * comparison is DECIMAL(38,0) cross-multiplication — magnitudes
    * ≤1e6·1e12·2e13 ≈ 2e31 ≪ 1e38 at 100 TB corpus sizes. No double
    * division ever happens, so no engine-dependent rounding can flip a
    * keep decision.
    *
    * Scale shape: identical to [[sampleMixture]] — a tiny per-source
    * aggregate (count + weight) broadcast back onto a scan-shaped fact
    * pass; the decision is a pure map with zero fact-table shuffles.
    */
  def sampleTemperature(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val dec = "decimal(38,0)"
    val perSrc = docs.groupBy("source")
      .agg(count(lit(1)).as("src_n"))
      .withColumn("w", floor(sqrt(col("src_n").cast("double")) * lit(1000000.0))
        .cast(dec))
      .withColumn("sum_w", expr("sum(w) over ()"))
      .withColumn("budget", expr("(sum(src_n) over ()) div 4").cast(dec))
    docs
      .join(broadcast(perSrc), "source")
      .withColumn("bucket", bucketPpm(col("doc_id")))
      .filter(col("bucket").cast(dec) * col("src_n").cast(dec) * col("sum_w")
        < col("budget") * col("w") * lit(1000000L).cast(dec))
      .select(col("doc_id"), col("source"), col("bucket"))
  }

  /** Data-selection-with-importance-resampling scores (the DSIR shape,
    * arXiv:2302.03169 — there hashed n-gram log-ratios between a target
    * and a raw corpus rank candidates). Here the target domain is the
    * `lang = 'en'` slice, the feature is the word unigram, and the
    * per-word affinity is the integer fixed-point target share
    * `(1e4·c_target) div c_raw` — summed per doc (an integer sum is
    * order-independent; log-ratio doubles are not). A doc is kept when
    * its mean affinity beats the corpus-wide target share, i.e. it looks
    * more target-like than average.
    *
    * Scale shape: two vocabulary-sized count tables (≪ corpus — DSIR
    * hashes features into a fixed bucket space for exactly this reason)
    * broadcast onto the token scan; the per-doc fold is one doc_id
    * exchange; the global totals are a 1-row aggregate collected as a
    * driver-scale constant.
    */
  def sampleDsir(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        explode(expr("filter(split(text, ' '), t -> t <> '')")).as("tok"))
    val cr = toks.groupBy("tok").agg(count(lit(1)).as("c_r"))
    val ct = toks.filter(col("lang") === "en")
      .groupBy("tok").agg(count(lit(1)).as("c_t"))
    val ratios = cr.join(ct, Seq("tok"), "left")
      .na.fill(0L, Seq("c_t"))
      .withColumn("p4", expr("(10000 * c_t) div c_r"))
      .select("tok", "p4")
    val Array(nR, nT) = {
      val t = toks.agg(count(lit(1)).as("n_r"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_t"))
        .collect()(0)
      Array(t.getLong(0), t.getLong(1))
    }
    toks.join(broadcast(ratios), Seq("tok"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_toks"), sum("p4").as("sum_p4"))
      .withColumn("avg_p4", expr("sum_p4 div n_toks"))
      .withColumn("keep", col("avg_p4") >= lit(10000L * nT / nR))
      .select("doc_id", "lang", "n_toks", "sum_p4", "avg_p4", "keep")
  }

  /** Deterministic training-SHARD assignment audit — the balance report
    * a pipeline writes before materializing data-loader shards: each
    * document hashes to one of 16 shards by a content hash that is
    * portable across engines AND runs (md5 prefix — a seed-dependent
    * hash would re-shard the corpus on every config change, invalidating
    * every downstream resume point), then per shard the doc/token/char
    * totals, the doc-id range, and the per-mille token share a loader
    * uses to detect imbalance before a 100 TB write, not after.
    *
    * Scale shape: the shard hash and token count are scan-side codegen;
    * partial aggregation map-side into the 16-row shard frame (ONE
    * bounded exchange); the share window runs over those 16 rows. The
    * real write would be `df.write.partitionBy("shard")` fed by this
    * same column — the audit and the layout share one plan.
    */
  def pipeShard(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("shard",
        expr("CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT) % 16"))
      .withColumn("n_toks", size(expr(TextOps.toksExpr)).cast("bigint"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("sum_toks"),
        sum(length(col("text")).cast("bigint")).as("sum_chars"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .withColumn("tok_share_pm",
        expr("(1000 * sum_toks) div sum(sum_toks) over ()"))
      .orderBy("shard")

  /** DATA-QUALITY AUDIT (the Deequ / Great-Expectations check suite a
    * pipeline runs before training on a new drop): one long-format
    * report row per constraint over the fact table — row count, PK
    * null count, composite-PK duplicate count, referential ORPHANS
    * (line items whose order key has no order — an anti-join, the one
    * corpus-scale check a single pass can't fold), domain violations
    * (negative quantity, discount outside [0,1] in exact cents,
    * return-flag outside its enum), and value ranges. A report that
    * rides the same engine as the pipeline can gate ingest
    * transactionally; a sidecar checker drifts.
    *
    * Scale shape: ONE scan computes every per-row constraint as
    * conditional aggregates (map-side partials into a 1-row frame;
    * the composite-PK distinct is the only two-phase part); the orphan
    * check is a key-projected anti-join; the 1×1 bind and the 9-row
    * stack are free.
    */
  def pipeValidate(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val base = li.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("null_orderkey"),
      (count(lit(1)) -
        countDistinct(col("l_orderkey"), col("l_linenumber"))).as("dup_pk"),
      sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("neg_quantity"),
      sum(when(round(col("l_discount") * 100).cast("bigint").between(0L, 100L),
        0L).otherwise(1L)).as("discount_oob"),
      sum(when(col("l_returnflag").isin("A", "N", "R"), 0L).otherwise(1L))
        .as("bad_returnflag"),
      min(col("l_quantity").cast("bigint")).as("min_qty"),
      max(col("l_quantity").cast("bigint")).as("max_qty"))
    val orphans = li.select(col("l_orderkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_orderkey"))
    base.crossJoin(orphans)
      .select(expr("stack(9, " +
        "'n_rows', n_rows, 'null_orderkey', null_orderkey, " +
        "'dup_pk', dup_pk, 'orphan_orderkey', orphan_orderkey, " +
        "'neg_quantity', neg_quantity, 'discount_oob', discount_oob, " +
        "'bad_returnflag', bad_returnflag, 'min_qty', min_qty, " +
        "'max_qty', max_qty) as (metric, value)"))
      .orderBy("metric")
  }

  /** LEAKAGE-SAFE train/valid/test split — the evaluation-hygiene
    * primitive every ML pipeline needs: the split is a pure function of
    * the GROUP key (user), not the row, so all of a user's events land
    * in exactly one split and no user's behavior can leak from train
    * into eval (row-level splits leak whenever a group spans splits).
    * Assignment is the salted-md5 bucket (80/10/10), reproducible
    * across runs, engines, and partitionings. The report is the
    * balance audit a pipeline checks before materializing: per split
    * the user count, event count, exact value cents, and per-mille
    * event share.
    *
    * Scale shape: the split column is scan-side codegen; one
    * aggregation exchange keyed by (split, user) for the exact
    * distinct-user count (two-phase, map-side partial), then the
    * 3-row frame; the share window is free. No row ever joins
    * anything.
    */
  def sampleHoldout(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("b", conv(substring(
        md5(concat(lit("split|"), col("user_id").cast("string"))), 1, 6),
        16, 10).cast("bigint") % 100)
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") < 90, "valid")
          .otherwise("test"))
      .groupBy("split")
      .agg(countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("bigint")).as("sum_val_cents"))
      .withColumn("share_pm", expr("(1000 * n_events) div sum(n_events) over ()"))
      .orderBy("split")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_holdout" -> (sampleHoldout _),
    "pipe_validate" -> (pipeValidate _),
    "pipe_shard" -> (pipeShard _),
    "sample_dsir" -> (sampleDsir _),
    "sample_stratified" -> (sampleStratified _),
    "sample_quota" -> (sampleQuota _),
    "sample_mixture" -> (sampleMixture _),
    "sample_temperature" -> (sampleTemperature _))

  val oracles: Map[String, String] = Map(
    "sample_holdout" ->
      """WITH b AS (SELECT user_id, value,
        |    CAST(('0x' || substr(md5('split|' || CAST(user_id AS VARCHAR)), 1, 6))
        |      AS BIGINT) % 100 AS bk
        |  FROM events),
        |g AS (SELECT CASE WHEN bk < 80 THEN 'train'
        |             WHEN bk < 90 THEN 'valid' ELSE 'test' END AS split,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      AS sum_val_cents
        |  FROM b GROUP BY 1)
        |SELECT split, n_users, n_events, sum_val_cents,
        |  CAST((1000 * n_events) // (sum(n_events) OVER ()) AS BIGINT)
        |    AS share_pm
        |FROM g ORDER BY split""".stripMargin,
    "pipe_validate" ->
      """WITH b AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS null_orderkey,
        |    CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber))
        |      AS BIGINT) AS dup_pk,
        |    CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS neg_quantity,
        |    CAST(sum(CASE WHEN CAST(round(l_discount * 100) AS BIGINT)
        |      BETWEEN 0 AND 100 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS discount_oob,
        |    CAST(sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 0
        |      ELSE 1 END) AS BIGINT) AS bad_returnflag,
        |    CAST(min(CAST(l_quantity AS BIGINT)) AS BIGINT) AS min_qty,
        |    CAST(max(CAST(l_quantity AS BIGINT)) AS BIGINT) AS max_qty
        |  FROM lineitem),
        |o AS (SELECT CAST(count(*) AS BIGINT) AS orphan_orderkey
        |  FROM lineitem l WHERE NOT EXISTS (
        |    SELECT 1 FROM orders x WHERE x.o_orderkey = l.l_orderkey))
        |SELECT 'n_rows' AS metric, n_rows AS value FROM b
        |UNION ALL SELECT 'null_orderkey', null_orderkey FROM b
        |UNION ALL SELECT 'dup_pk', dup_pk FROM b
        |UNION ALL SELECT 'orphan_orderkey', orphan_orderkey FROM o
        |UNION ALL SELECT 'neg_quantity', neg_quantity FROM b
        |UNION ALL SELECT 'discount_oob', discount_oob FROM b
        |UNION ALL SELECT 'bad_returnflag', bad_returnflag FROM b
        |UNION ALL SELECT 'min_qty', min_qty FROM b
        |UNION ALL SELECT 'max_qty', max_qty FROM b
        |ORDER BY metric""".stripMargin,
    "pipe_shard" ->
      """WITH d AS (SELECT doc_id, text,
        |    CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 16 AS shard,
        |    len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_toks
        |  FROM documents),
        |g AS (SELECT shard, count(*) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS sum_toks,
        |    CAST(sum(length(text)) AS BIGINT) AS sum_chars,
        |    min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |  FROM d GROUP BY 1)
        |SELECT shard, n_docs, sum_toks, sum_chars, min_doc, max_doc,
        |  CAST((1000 * sum_toks) // (sum(sum_toks) OVER ()) AS BIGINT)
        |    AS tok_share_pm
        |FROM g ORDER BY shard""".stripMargin,
    "sample_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang,
        |    unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS tok
        |  FROM documents),
        |cr AS (SELECT tok, count(*) AS c_r FROM toks GROUP BY 1),
        |ct AS (SELECT tok, count(*) AS c_t FROM toks WHERE lang = 'en' GROUP BY 1),
        |ratios AS (SELECT cr.tok,
        |    (10000 * coalesce(ct.c_t, 0)) // cr.c_r AS p4
        |  FROM cr LEFT JOIN ct ON ct.tok = cr.tok),
        |tot AS (SELECT count(*) AS n_r,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_t FROM toks),
        |scored AS (SELECT doc_id, lang, count(*) AS n_toks,
        |    CAST(sum(p4) AS BIGINT) AS sum_p4
        |  FROM toks JOIN ratios USING (tok) GROUP BY 1, 2)
        |SELECT doc_id, lang, n_toks, sum_p4,
        |  CAST(sum_p4 // n_toks AS BIGINT) AS avg_p4,
        |  sum_p4 // n_toks >= (10000 * tot.n_t) // tot.n_r AS keep
        |FROM scored, tot ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang, bucket FROM (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS bucket
        |  FROM documents) t
        |WHERE bucket < CASE WHEN lang = 'en' THEN 5 ELSE 20 END
        |ORDER BY doc_id""".stripMargin,
    "sample_mixture" ->
      """WITH tot AS (SELECT CAST(sum(n_chars) AS HUGEINT) AS total_chars
        |            FROM documents),
        |src AS (SELECT source, CAST(sum(n_chars) AS HUGEINT) AS src_chars
        |        FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source,
        |  CAST(('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 AS bucket
        |FROM documents d JOIN src ON src.source = d.source, tot
        |WHERE CAST(CAST(('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 AS HUGEINT)
        |      * 200 * src.src_chars
        |    < tot.total_chars
        |      * (CASE WHEN d.source IN ('src0','src1','src2','src3') THEN 30
        |              WHEN d.source IN ('src4','src5','src6','src7','src8','src9') THEN 10
        |              ELSE 2 END)
        |      * 1000000
        |ORDER BY doc_id""".stripMargin,
    "sample_quota" ->
      """SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('quota|' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 20
        |ORDER BY lang, rk""".stripMargin,
    "sample_temperature" ->
      """WITH src AS (
        |  SELECT source, count(*) AS src_n,
        |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000) AS HUGEINT) AS w
        |  FROM documents GROUP BY source
        |), agg AS (
        |  SELECT CAST(sum(w) AS HUGEINT) AS sum_w,
        |    CAST(sum(src_n) // 4 AS HUGEINT) AS budget FROM src
        |)
        |SELECT d.doc_id, d.source,
        |  CAST(('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 AS bucket
        |FROM documents d JOIN src ON src.source = d.source, agg
        |WHERE CAST(CAST(('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000000 AS HUGEINT)
        |      * src.src_n * agg.sum_w
        |    < agg.budget * src.w * 1000000
        |ORDER BY doc_id""".stripMargin)
}
