package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline: exact (hash),
  * MinHash signatures, LSH band-bucket candidate pairs, SimHash
  * fingerprints, and n-gram Jaccard verification.
  *
  * Hash choice: `md5` — identical hex output in Spark and DuckDB, so the
  * oracle can replay every stage; min-hashes compare the hex strings
  * lexicographically (no integer conversion, SURVEY §3.6).
  *
  * Scale: the only shuffles are (a) the hash groupBy of exact dedup and
  * (b) the per-(band, bucket) self-join of LSH — candidate generation is
  * within-bucket only, never all-pairs. At 100 TB add a bucket-size cap
  * (count per bkey, drop degenerate mega-buckets) before the self-join;
  * signature computation itself is embarrassingly parallel scan work.
  */
object Dedup {

  val NumHashes = 8
  val Bands = 2 // rows-per-band = 4: collision probability j⁴ per band —
                // tuned so shared-vocabulary corpora don't produce
                // degenerate mega-buckets (2-row bands fire at j≈0.5 and
                // explode candidate pairs ~80× on this corpus)

  /** Bucket-size cap: buckets larger than this are dropped before the
    * within-bucket self-join. One degenerate mega-bucket (boilerplate-heavy
    * or empty documents hashing identically) would otherwise make candidate
    * generation quadratic at corpus scale; such buckets carry no ranking
    * information anyway (everything in them is near-identical — exact dedup
    * catches the identical subset far cheaper). 64 is above every organic
    * bucket observed at sf0.1 (max 40) so results are unchanged there.
    */
  val MaxBucket = 64

  // ---- shared Spark-side fragments ------------------------------------

  /** doc_id + mh0..mh7 MinHash signature columns, via the one-pass custom
    * codegen expression `minhash8` (graft.functions.Minhash8) — same
    * semantics as `array_min(transform(shingles, md5(x || '|' || j)))`
    * per salt j (the oracle's declarative form), one shingle scan total.
    */
  private def signatures(s: SparkSession, dir: String): DataFrame =
    signaturesOf(s, Tables.documentsRaw(s, dir))

  private[graft] def signaturesOf(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    val slim = docs.select("doc_id", "text")
    // the md5 kernel is CPU-bound: when the input arrives in fewer splits
    // than cores (single small parquet artifact), rebalance the slim
    // projection so one fat split can't serialize the hashing; at real
    // scale the input already has >= cores splits and no shuffle happens
    val para = s.sparkContext.defaultParallelism
    val balanced =
      if (slim.rdd.getNumPartitions < para) slim.repartition(para) else slim
    balanced
      .withColumn("mharr", call_function("minhash8", col("text")))
      .select(col("doc_id") +:
        (0 until NumHashes).map(j => col("mharr").getItem(j).as(s"mh$j")): _*)
  }

  private def bandKey(b: Int): Column =
    md5(concat_ws("|", (0 until 4).map(r => col(s"mh${4 * b + r}")): _*)).as("bkey")

  /** (doc_a, doc_b) candidate pairs sharing at least one LSH band bucket.
    * Buckets above [[MaxBucket]] are dropped BEFORE the self-join: the
    * bucket-size window shares the (band, bkey) hash partitioning with the
    * join, so the cap costs no extra exchange — and without it one
    * mega-bucket makes candidate generation quadratic at 100 TB.
    */
  /** Uncapped (doc_id, band, bkey) rows — the raw LSH band table. The
    * PERSISTED form ([[LshIndex]]) stores these uncapped: the MaxBucket
    * cap is a property of the candidate-generation moment (bucket size
    * over ALL docs including the probing batch), so it must be applied at
    * probe time over index∪batch, never frozen into the artifact.
    */
  private[operators] def bandRows(sigs: DataFrame): DataFrame =
    sigs
      .withColumn("bs", array((0 until Bands).map(b =>
        struct(lit(b).as("band"), bandKey(b))): _*))
      .select(col("doc_id"), explode(col("bs")).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.bkey"))

  /** Drops (band, bkey) groups above [[MaxBucket]] — the quadratic-bucket
    * guard; the window shares the (band, bkey) partitioning downstream
    * joins use, so the cap costs no extra exchange.
    */
  private[operators] def capBuckets(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    rows
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("band", "bkey")))
      .filter(col("bsz") <= MaxBucket)
      .drop("bsz")
  }

  /** Capped (doc_id, band, bkey) bucket rows — at 100 TB this table IS the
    * persisted dedup-store artifact an incremental batch probes against
    * ([[LshIndex]] is that artifact made real).
    */
  private[graft] def bandTable(sigs: DataFrame): DataFrame =
    capBuckets(bandRows(sigs))

  private[graft] def candidates(sigs: DataFrame): DataFrame = {
    val bands = bandTable(sigs)
    bands.select(col("band"), col("bkey"), col("doc_id").as("doc_a"))
      .join(bands.select(col("band"), col("bkey"), col("doc_id").as("doc_b")),
        Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Evaluates `df` eagerly (localCheckpoint: materialize + truncate
    * lineage), then releases the intermediate caches. Queries that cache
    * sub-frames must not leak them into the session — across a 60-query
    * run leaked storage accumulates into GC/eviction thrash, and at
    * cluster scale into executor OOM. Eager evaluation first is essential:
    * the caches must be live while the result computes, and the caller
    * only consumes the materialized result afterwards.
    */
  private[operators] def releasing(df: DataFrame, cached: DataFrame*): DataFrame =
    try df.localCheckpoint(eager = true)
    finally cached.foreach(_.unpersist(blocking = false))

  // ---- queries --------------------------------------------------------

  /** INCREMENTAL dedup — the daily-increment shape at 100 TB: a (small)
    * new batch checks against the (huge) existing corpus WITHOUT
    * re-LSHing or all-pairs-joining the corpus. The batch's band-bucket
    * rows broadcast into a join against the corpus bucket table (at scale
    * a persisted store artifact, here derived in-query: [[bandTable]]),
    * so the corpus side is a scan-and-probe — its only exchange is the
    * bucket-cap window the stored artifact would already carry. Emitted:
    * every candidate pair involving at least one batch doc, with the
    * signature-agreement Jaccard estimate and whether the match reaches
    * into the corpus (`is_cross`) or is batch-internal. The batch is
    * `doc_id % 5 = 4` — a deterministic 20% split both engines compute.
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val sigs = signatures(s, dir).cache()
    val isNew = (col("doc_id") % 5) === 4
    val bandsAll = bandTable(sigs)
    val bandsNew = bandsAll.filter(isNew)
      .select(col("band"), col("bkey"), col("doc_id").as("new_id"))
    val agree = (0 until NumHashes)
      .map(j => when(col(s"a_mh$j") === col(s"b_mh$j"), 1).otherwise(0))
      .reduce(_ + _)
    releasing(
      bandsAll
        .join(broadcast(bandsNew), Seq("band", "bkey"))
        .filter(col("doc_id") =!= col("new_id"))
        .select(least(col("doc_id"), col("new_id")).as("doc_a"),
          greatest(col("doc_id"), col("new_id")).as("doc_b"))
        .distinct()
        .join(sigs.toDF("doc_a" +: (0 until NumHashes).map(j => s"a_mh$j"): _*), "doc_a")
        .join(sigs.toDF("doc_b" +: (0 until NumHashes).map(j => s"b_mh$j"): _*), "doc_b")
        .select(col("doc_a"), col("doc_b"), (agree / 8.0).as("jaccard_est"),
          ((col("doc_a") % 5 === 4) =!= (col("doc_b") % 5 === 4)).as("is_cross")),
      sigs)
  }

  /** RFC-3986-style URL canonicalization — the normalizer every web-crawl
    * dedup runs BEFORE content hashing (a page fetched as
    * `HTTPS://WWW.Site.com:443/a/?utm_source=x#frag` and
    * `https://site.com/a` is one document). Rules, in order: drop the
    * fragment; lowercase scheme://host:port (the case-insensitive parts —
    * the path stays untouched); strip a leading `www.`; strip default
    * ports (`https :443`, `http :80`); drop tracking query params
    * (`utm_*`, `fbclid`, `gclid`), sort the survivors byte-wise and
    * reattach; strip one trailing slash whenever the preceding character
    * is not itself a slash — NOTE this includes the authority-root case
    * (`https://host/` → `https://host`, since `t` precedes the slash);
    * only a `//`-terminated path keeps its final slash. The DuckDB oracle
    * replays the identical regex, so the rule is engine-symmetric. Pure
    * column expressions — codegen end to end, scan-side at any scale.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val auth = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val lowered = concat(lower(auth),
      noFrag.substr(length(auth) + 1, length(noFrag)))
    val noWww = regexp_replace(lowered, "^(https?://)www\\.", "$1")
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(https://[^/?#]*):443", "$1"),
      "^(http://[^/?#]*):80", "$1")
    val q = regexp_extract(noPort, "\\?(.*)", 1)
    val keep = array_join(array_sort(filter(split(q, "&"), p =>
      p =!= "" && !p.startsWith("utm_") &&
        !p.startsWith("fbclid=") && !p.startsWith("gclid="))), "&")
    val base = regexp_replace(substring_index(noPort, "?", 1), "([^/])/$", "$1")
    concat(base, when(keep === "", lit("")).otherwise(concat(lit("?"), keep)))
  }

  /** URL dedup (`dedup_url`): canonicalize, group, report each canonical
    * URL's multiplicity and keeper — the crawl-frontier dedup that runs
    * BEFORE any content is fetched twice. URLs are synthesized
    * deterministically from doc ids across five real-world variant shapes
    * (case-mangled host, explicit default port, fragment, tracking
    * params, unsorted params + trailing slash) so every canonicalization
    * rule is load-bearing for the groups to form. Scale: scan-side canon
    * + one hash aggregate — the dedup_exact shape on the URL column.
    */
  def dedupUrl(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .withColumn("core", col("doc_id") % 200)
      .withColumn("url",
        when(col("doc_id") % 5 === 0, concat(lit("https://WWW.Site"),
          col("core"), lit(".example.com/docs/page"), col("core"),
          lit("/?utm_source=feed")))
        .when(col("doc_id") % 5 === 1, concat(lit("HTTPS://Site"),
          col("core"), lit(".EXAMPLE.COM:443/docs/page"), col("core")))
        .when(col("doc_id") % 5 === 2, concat(lit("https://site"),
          col("core"), lit(".example.com/docs/page"), col("core"),
          lit("#section-2")))
        .when(col("doc_id") % 5 === 3, concat(lit("https://site"),
          col("core"), lit(".example.com:443/docs/page"), col("core"),
          lit("/?utm_campaign=x&utm_medium=y")))
        .otherwise(concat(lit("https://www.site"),
          col("core"), lit(".example.com/docs/page"), col("core"),
          lit("?b=2&a=1&utm_content=z"))))
    d.withColumn("canon_url", canonicalizeUrl(col("url")))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
  }

  /** Exact dedup: content-hash groupBy, keep the lowest doc_id. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))

  /** SOFT dedup (the SoftDeDup / D4 down-WEIGHTING variant): instead of
    * dropping duplicates, every doc gets a training weight inversely
    * proportional to its exact-duplicate multiplicity —
    * `weight_ppm = 10^6 div n_copies` (integer ppm, engine-exact), so a
    * doc repeated k× contributes ~1× total mass. The signal a sampling
    * stage consumes when outright dropping is too aggressive (near-dup
    * boilerplate that still carries signal). One window over the
    * text-hash fingerprint — a single fp-keyed exchange, no join back.
    */
  def dedupSoft(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("n_copies", count(lit(1)).over(Window.partitionBy("h")))
      .select(col("doc_id"), col("n_copies"),
        expr("1000000L div n_copies").as("weight_ppm"))
  }

  /** Passage width for sub-document dedup (words per passage). */
  val PassageW = 10

  /** Sub-document PASSAGE dedup — the CCNet/C4 paragraph-hash pass
    * applied to structure-free text: the document splits into
    * consecutive [[PassageW]]-word passages, a passage is a duplicate
    * when an identical passage (md5) occurs EARLIER in the corpus
    * ((doc_id, passage_idx) order — repeats inside one doc count from
    * the second occurrence on, exactly the paragraph-level rule), and
    * each doc reports how many of its passages survive and the word
    * count they retain. Where `dedup_exact` drops whole documents,
    * this is the finer instrument that strips boilerplate (headers,
    * licence blocks, navigation chrome) repeated ACROSS different
    * documents.
    *
    * Scale shape: passage strings assemble SCAN-SIDE from one
    * `slice`/`array_join` transform (no word-level shuffle — the corpus
    * shuffles once, keyed by passage hash, with the passage TEXT never
    * leaving the map side: only (hash, doc, idx, n_words) rows move);
    * first-occurrence rank is a WindowGroupLimit-free window on the
    * hash key (rank 1 per hash = keeper), and the per-doc rollup reuses
    * the doc_id exchange. Both exchanges are passage-count-scale.
    */
  def dedupPassage(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("h").orderBy("doc_id", "pidx")
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, (size(ws) - 1) div $PassageW), " +
          s"i -> array_join(slice(ws, i * $PassageW + 1, $PassageW), ' '))"))
        .as(Seq("pidx", "passage")))
      .select(col("doc_id"), col("pidx"), md5(col("passage")).as("h"),
        size(split(col("passage"), " ")).cast("long").as("n_words"))
      .withColumn("rk", row_number().over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_passages"),
        sum(when(col("rk") > 1, 1L).otherwise(0L)).as("n_dup_passages"),
        sum(when(col("rk") === 1, col("n_words")).otherwise(0L)).as("n_words_kept"))
      .orderBy("doc_id")
  }

  /** Content-defined-chunking dedup (the rsync/LBFS/FastCDC primitive —
    * the chunk-store dedup a blob/dataset store runs, and the shift-robust
    * upgrade over [[dedupPassage]]'s fixed-stride passages): chunk
    * boundaries fall where the 8-byte Karp–Rabin window hash ≡ 0 (mod 64)
    * (ONE `cdccuts` codegen kernel call per document — expected ~64-byte
    * chunks), so an insertion RESYNCHRONIZES after one window instead of
    * shifting every later boundary. Chunks dedup corpus-wide by content
    * md5 with the first occurrence (min (doc_id, off)) canonical; output =
    * per-doc chunk/byte totals, duplicated chunk/byte counts and the
    * dedup ratio in per-mille — the storage-savings number a chunk store
    * quotes.
    *
    * Scale shape: cut detection is scan-side codegen; the chunk explode
    * carries (doc, off, len, md5) only — text never leaves the map side;
    * the canonical-occurrence aggregate and the join back share the ONE
    * chunk-hash-keyed exchange (same partitioning both sides), then the
    * per-doc rollup is a second, doc-keyed exchange — the dedup_passage
    * budget exactly.
    */
  def dedupCdc(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    val chunks = Tables.documents(s, dir)
      .withColumn("bounds", concat(
        array(lit(0L)),
        call_function("cdccuts", col("text")),
        array(length(col("text")).cast("long"))))
      .select(col("doc_id"), col("text"), explode(expr(
        """transform(sequence(0, size(bounds) - 2),
          |  k -> struct(bounds[k] as off, bounds[k + 1] - bounds[k] as len))"""
          .stripMargin)).as("c"))
      .select(col("doc_id"), col("c.off").as("off"), col("c.len").as("len"),
        md5(expr("substring(text, cast(off + 1 as int), cast(len as int))"))
          .as("h"))
    val canon = chunks.groupBy("h")
      .agg(min(struct(col("doc_id"), col("off"))).as("first"))
    chunks.join(canon, "h")
      .withColumn("dup", col("doc_id") =!= col("first.doc_id") ||
        col("off") =!= col("first.off"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("len").as("n_bytes"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("dup_chunks"),
        sum(when(col("dup"), col("len")).otherwise(0L)).as("dup_bytes"))
      .withColumn("dup_pm", expr("(1000 * dup_bytes) div n_bytes"))
      .orderBy("doc_id")
  }

  /** MinHash signatures (k=8, md5 over 5-char shingles). */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    signatures(s, dir)

  /** LSH band-bucket join → candidate pairs + signature-agreement Jaccard
    * estimate.
    */
  def dedupLshPairs(s: SparkSession, dir: String): DataFrame = {
    // materialize signatures once: projection collapse would otherwise
    // inline the md5-over-shingles arrays into every band key and every
    // agreement column on both join sides (~8× recompute)
    val sigs = signatures(s, dir).cache()
    val agree = (0 until NumHashes)
      .map(j => when(col(s"a_mh$j") === col(s"b_mh$j"), 1).otherwise(0))
      .reduce(_ + _)
    releasing(
      candidates(sigs)
        .join(sigs.toDF("doc_a" +: (0 until NumHashes).map(j => s"a_mh$j"): _*), "doc_a")
        .join(sigs.toDF("doc_b" +: (0 until NumHashes).map(j => s"b_mh$j"): _*), "doc_b")
        .select(col("doc_a"), col("doc_b"), (agree / 8.0).as("jaccard_est")),
      sigs)
  }

  /** Exact edit-distance verification of the LSH candidate pairs — the
    * final arbiter a dedup pipeline runs where minhash agreement is only
    * an estimate: Levenshtein distance is an integer metric both engines
    * implement identically, so the verdict replays with no float anywhere.
    * A pair is a duplicate when lev ≤ 20 % of the longer document
    * (integer cross-mult `100·lev ≤ 20·max(len)`).
    *
    * Scale shape: Levenshtein is O(len²) PER PAIR — the whole design is
    * that it only ever runs on the banded, MaxBucket-capped candidate
    * set (never corpus-quadratic, same contract as [[dedupLshPairs]]);
    * the text join is two keyed exchanges of candidate-scale rows
    * against the corpus. The distance runs through the `lev_band`
    * codegen kernel (r14, TextKernels.levBand): band width = the
    * PAIR'S OWN dup bound k = (20·max(len)) div 100 — not the corpus
    * max, which over-banded every short pair and made sf1 pay ×32 —
    * plus the exact common-prefix/suffix trim (edit distance is
    * invariant under shared ends, and LSH candidates share almost
    * everything, so the DP sees only the differing middle). A −1 is
    * provably past the pair's dup threshold, so `is_dup ⇔ lev ≥ 0`
    * exactly; a parity spec pins the kernel against an independent
    * full-DP implementation.
    */
  def dedupEditDist(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    val sigs = signatures(s, dir).cache()
    val docs = Tables.documentsRaw(s, dir).select(col("doc_id"), col("text"))
    releasing(
      candidates(sigs)
        .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
        .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          call_function("lev_band", col("ta"), col("tb")).as("lev"),
          length(col("ta")).as("len_a"), length(col("tb")).as("len_b"))
        .withColumn("is_dup", col("lev") >= 0),
      sigs)
  }

  /** SimHash 64-bit fingerprint (hex) via the custom codegen expression —
    * one pass per document instead of a token explode + 64-way groupBy.
    * Hamming-near pair generation = band on hex prefix + verify; the scan
    * stays shuffle-free (see DedupSpec).
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    Tables.documents(s, dir)
      .select(col("doc_id"), call_function("simhash64", col("text")).as("simhash"))
  }

  /** n-gram (word trigram) Jaccard verification of the LSH candidates. */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    // jgrams3 codegen kernel — the interpreted transform/concat_ws chain
    // it replaces was the dominant cost of this key at sf1
    val grams = Tables.documentsRaw(s, dir)
      .withColumn("grams", call_function("jgrams3", col("text")))
      .select(col("doc_id"), col("grams"), size(col("grams")).as("ng"))
      .cache() // reused by flat + both size joins
    val flat = grams.select(col("doc_id"), explode(col("grams")).as("g"))
    val sigs = signatures(s, dir).cache()
    // gram intersection as an explicit (doc, gram) equi-join — the shared
    // gram is a join KEY, never a post-join filter, so the executed plan
    // hash-joins on (doc_b, g) instead of risking a per-pair gram cross
    val inter = candidates(sigs)
      .join(flat.toDF("doc_a", "g"), "doc_a")
      .join(flat.toDF("doc_b", "g"), Seq("doc_b", "g"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    releasing(
      inter
        .join(grams.select(col("doc_id").as("doc_a"), col("ng").as("na")), "doc_a")
        .join(grams.select(col("doc_id").as("doc_b"), col("ng").as("nb")), "doc_b")
        .select(col("doc_a"), col("doc_b"), col("inter"), col("na"), col("nb"),
          (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard")),
      grams, sigs)
  }

  /** MinHash ACCURACY census — the [[Ann.annRecall]] discipline applied
    * to the dedup index ("measure the estimator before trusting it"):
    * for every LSH candidate pair, the 8-hash signature agreement
    * (the [[dedupLshPairs]] Jaccard estimate) against the EXACT 3-gram
    * Jaccard ([[dedupNgramJaccard]]'s verification), rolled into the
    * per-agreement-level calibration curve: pair count, pooled exact
    * Jaccard (Σinter/Σunion in exact per-mille — floor div, both
    * engines agree), and the per-pair min/max. A well-calibrated
    * MinHash shows pooled_j_pm ≈ 125·agree; drift tells you the
    * shingle width or hash count is wrong BEFORE a 100 TB dedup run
    * keeps the wrong documents. Zero-overlap candidates stay in the
    * census (left join, inter = 0) — dropping them would hide the
    * false-positive band entirely.
    *
    * Scale shape: reuses the banded candidate generation (MaxBucket-
    * capped, never corpus-quadratic), the gram intersection is the
    * (doc, gram) equi-join of dedup_ngram_jaccard, and the rollup frame
    * is 9 rows (agreement 0..8).
    */
  def dedupMinhashAcc(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    val grams = Tables.documentsRaw(s, dir)
      .withColumn("grams", call_function("jgrams3", col("text")))
      .select(col("doc_id"), col("grams"), size(col("grams")).as("ng"))
      .cache()
    val flat = grams.select(col("doc_id"), explode(col("grams")).as("g"))
    val sigs = signatures(s, dir).cache()
    val agreeExpr = (0 until NumHashes)
      .map(j => when(col(s"a_mh$j") === col(s"b_mh$j"), 1).otherwise(0))
      .reduce(_ + _)
    val cand = candidates(sigs)
    val inter = cand
      .join(flat.toDF("doc_a", "g"), "doc_a")
      .join(flat.toDF("doc_b", "g"), Seq("doc_b", "g"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    releasing(
      cand
        .join(sigs.toDF("doc_a" +: (0 until NumHashes).map(j => s"a_mh$j"): _*), "doc_a")
        .join(sigs.toDF("doc_b" +: (0 until NumHashes).map(j => s"b_mh$j"): _*), "doc_b")
        .select(col("doc_a"), col("doc_b"), agreeExpr.cast("bigint").as("agree"))
        .join(inter, Seq("doc_a", "doc_b"), "left")
        .withColumn("inter", coalesce(col("inter"), lit(0L)))
        .join(grams.select(col("doc_id").as("doc_a"), col("ng").as("na")), "doc_a")
        .join(grams.select(col("doc_id").as("doc_b"), col("ng").as("nb")), "doc_b")
        .withColumn("un", col("na") + col("nb") - col("inter"))
        .withColumn("j_pm", expr("(1000 * inter) div un"))
        .groupBy("agree")
        .agg(count(lit(1)).as("n_pairs"), sum("inter").as("sum_inter"),
          sum("un").as("sum_union"),
          min("j_pm").as("min_j_pm"), max("j_pm").as("max_j_pm"))
        .withColumn("pool_j_pm", expr("(1000 * sum_inter) div sum_union"))
        .select("agree", "n_pairs", "sum_inter", "sum_union",
          "pool_j_pm", "min_j_pm", "max_j_pm")
        .orderBy("agree"),
      grams, sigs)
  }

  /** Minimum shared sampled fingerprints for a [[dedupSubstring]] pair.
    * A same-vocabulary corpus shares single 8-byte windows ("the data")
    * constantly — at sf0.01 the noise floor decays smoothly up to ~10
    * shared fingerprints while genuine shared spans sit at 12-30, so 8
    * (≈ 8·FpSample bytes of shared content) separates span-sharing pairs
    * from phrase-collision noise.
    */
  val MinSharedFps = 8

  /** EXACT-substring dedup — pairs of documents sharing literal byte
    * spans, via the winnowing fingerprint kernel (mod-p sampled Karp–Rabin
    * window hashes, the `text_rollhash` machinery): each document emits
    * its sampled fingerprint SET (one codegen kernel pass), pairs join
    * PER FINGERPRINT VALUE — never all-pairs — with the same
    * [[MaxBucket]] cap as LSH so one boilerplate n-gram shared by the
    * whole corpus cannot make candidate generation quadratic.
    * `n_shared` counts distinct shared fingerprints;
    * `est_shared_bytes` scales by the sampling rate (each selected
    * fingerprint stands for ~FpSample windows of shared text).
    */
  def dedupSubstring(s: SparkSession, dir: String): DataFrame =
    substringPairsOf(s, Tables.documents(s, dir))

  /** Window granularity of [[dedupWindow50]] — the k of Lee et al. 2022. */
  val SpanTokens = 50

  /** EXACT duplicate spans at 50-TOKEN granularity (`dedup_window50`) —
    * the public standard for training-data dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better": remove/
    * report exact substrings of ≥ 50 tokens shared between documents).
    * Any shared span of ≥ k tokens contains a shared k-token window, so
    * the operator emits EVERY k-token window of every document keyed by
    * the window's 128-bit content hash and equi-joins windows by key —
    * the distributed analog of the paper's suffix-array scan, shaped as
    * a sorted hash join instead of a per-node suffix automaton.
    * Per pair: `n_win` distinct shared windows and the implied span
    * estimate `n_win + k − 1` tokens (exact when the overlap is one
    * contiguous span).
    *
    * Exactness: the join key is md5 over the joined window tokens —
    * content-derived, engine-portable (DuckDB replays the identical
    * md5), and collision-free below ~2⁶⁴ windows (birthday bound), i.e.
    * beyond a 100 TB corpus — so unlike [[dedupSubstring]]'s SAMPLED
    * fingerprints, a reported pair is a literal byte-for-byte shared
    * span, no verification pass needed.
    *
    * Scale shape: window emit is scan-side (one row per token position),
    * the per-doc `distinct` folds repeated windows map-side on the one
    * (doc, fp) exchange, and candidate generation joins PER FINGERPRINT
    * VALUE under the same [[MaxBucket]] cap as LSH — a boilerplate
    * window shared by the whole corpus caps at MaxBucket docs instead of
    * going quadratic (the cap is the paper's "drop pathological repeats"
    * rule, made explicit). Never all-pairs.
    */
  def dedupWindow50(s: SparkSession, dir: String): DataFrame =
    windowPairsOf(s, Tables.documents(s, dir))

  /** Per-doc DISTINCT 50-token window fingerprints — the row shape both
    * [[windowPairsOf]] and the persisted [[WindowIndex]] ingest.
    */
  private[graft] def windowRows(docs: DataFrame): DataFrame = {
    val k = SpanTokens
    docs
      .withColumn("toks", expr(TextOps.toksExpr))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= k)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), col("n") - (k - 1))).as("i"))
      .select(col("doc_id"),
        md5(array_join(slice(col("toks"), col("i"), lit(k)), " ")).as("fp"))
      .distinct()
  }

  /** The [[MaxBucket]] cut + fp-keyed pair rollup over a window-row
    * frame — shared by the one-shot operator and the store probe (the
    * store serves COMPLETE per-fp buckets, so the cap over its opened
    * rows equals the cap over the full corpus).
    */
  private[graft] def windowPairs(wins: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val capped = wins
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("fp")))
      .filter(col("bsz") <= MaxBucket)
      .select("doc_id", "fp")
    capped.toDF("doc_a", "fp")
      .join(capped.toDF("doc_b", "fp"), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_win"))
      .withColumn("est_span_toks", col("n_win") + lit(SpanTokens - 1))
  }

  private[graft] def windowPairsOf(s: SparkSession, docs: DataFrame): DataFrame =
    windowPairs(windowRows(docs))

  private[graft] def substringPairsOf(s: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GeoFunctions.register(s)
    val fps = docs
      .select(col("doc_id"), explode(call_function("rollfps16", col("text"))).as("fp"))
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("fp")))
      .filter(col("bsz") <= MaxBucket)
      .select("doc_id", "fp")
    fps.toDF("doc_a", "fp")
      .join(fps.toDF("doc_b", "fp"), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedFps)
      .withColumn("est_shared_bytes",
        col("n_shared") * lit(graft.functions.TextKernels.FpSample))
  }

  /** Benchmark DECONTAMINATION: flag training documents that share any
    * word 3-gram with a held-out benchmark set (here the deterministic
    * doc_id % 101 == 0 slice standing in for an eval suite) — the
    * overlap check a training pipeline runs so test data never leaks
    * into the corpus (the n-gram-overlap rule from the GPT-3/PaLM
    * decontamination appendices).
    *
    * Scale shape: the benchmark side is an eval suite — bounded MBs no
    * matter how big the corpus — so its distinct-gram set is BROADCAST
    * and the corpus side stays scan-shaped: tokenize, emit distinct
    * grams per doc (higher-order functions, no shuffle), hash-join
    * against the broadcast set, partial-agg the hit counts per doc.
    * The big side never shuffles its text.
    */
  /** Per-doc distinct word-trigram arrays via the `wgrams3` codegen
    * kernel — one static call per document; the equivalent
    * transform/slice/array_join higher-order chain runs interpreted and
    * cost ~3× on these gram-heavy keys.
    */
  private def gramFrame(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    Tables.documents(s, dir)
      .select(col("doc_id"), call_function("wgrams3", col("text")).as("gs"))
  }

  def dedupDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val grams = gramFrame(s, dir)
    val bench = grams.filter(col("doc_id") % 101 === 0)
      .select(explode(col("gs")).as("g")).distinct()
    grams.filter(col("doc_id") % 101 =!= 0)
      .select(col("doc_id"), explode(col("gs")).as("g"))
      .join(broadcast(bench), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_gram_hits"))
  }

  /** Bloom width floor in bits (64 longs). The ACTUAL width is data-
    * derived — the smallest power of two ≥ 8·(bench gram count), floored
    * here — because a fixed width saturates the moment the reference set
    * grows: at sf0.1 this floor alone held 2522 grams × 4 hashes in 4096
    * bits (92 % fill, ~70 % FP rate — the "gate" passed most of the
    * corpus to the exact join and cost 5 s of bench time). 8 bits/key at
    * k=4 keeps fill ≈ 39 % and per-gram FP ≈ 2 % at every scale, and the
    * floor keeps the FP path exercised at test scale. At 100 TB the same
    * rule yields 2^30+ bits, broadcast instead of inlined.
    */
  private val BloomBitsFloor = 4096L

  /** Smallest power of two ≥ 8·n, floored at [[BloomBitsFloor]] — the
    * shared width rule (the oracle picks the same value from an exact
    * integer VALUES lookup, no float log2 at the boundaries).
    */
  private[operators] def bloomBitsFor(nKeys: Long): Long = {
    var bits = BloomBitsFloor
    while (bits < 8 * nKeys) bits <<= 1
    bits
  }

  /** 48-bit integer fold of a string key (md5 prefix), shared by build
    * and probe and replayed verbatim by the oracle — the `md5head48`
    * kernel reads the digest bytes directly; the expression form
    * (`conv(substring(md5(c), 1, 12), 16, 10)`) paid a hex round-trip
    * plus conv's per-row string parse.
    */
  private def keyHash(c: Column): Column = call_function("md5head48", c)

  private def bloomPos(j: Int, h: Column, bits: Long): Column =
    (((h % Sketches.FoldP) * (Sketches.KnuthA + 2 * j + 1) +
      Sketches.HashB * (j + 1)) % Sketches.HashP) % bits

  /** Bloom-GATED decontamination — what [[dedupDecontaminate]] becomes
    * when the reference set outgrows a broadcast: the benchmark's gram
    * set folds into a k=4 Bloom bitmap (an 8 KB artifact here; 100s of
    * MB at real scale, still ≪ the gram set itself), the training side
    * tests membership as pure scan-side bit arithmetic, and ONLY the
    * grams that bloom-positive reach the exact verification join — the
    * filter's one-sided guarantee (no false negatives) is what makes the
    * gate sound, and the per-doc `n_fp` column measures exactly what the
    * gate overpays. Everything is integer arithmetic on a shared md5
    * fold, so bitmap, probes, and FP counts replay bit-for-bit in
    * DuckDB.
    */
  def dedupBloom(s: SparkSession, dir: String): DataFrame = {
    val grams = gramFrame(s, dir)
    // materialized once: the bench gram set feeds the bitmap build AND
    // the exact verification join. localCheckpoint (not cache): a live
    // session cache would silently rewrite OTHER queries' plans wherever
    // the same logical subtree appears — the checkpoint is private to
    // this lineage.
    val bench = grams.filter(col("doc_id") % 101 === 0)
      .select(explode(col("gs")).as("g")).distinct()
      .localCheckpoint(eager = true)
    // width from the bench gram count (the count is artifact-scale and
    // the checkpoint makes it a cheap local scan), THEN the positions:
    // a fixed width saturates as the reference set grows — see
    // BloomBitsFloor
    val bits = bloomBitsFor(bench.count())
    // build: distinct bit positions of the benchmark grams — artifact-
    // scale, packed driver-side into bits/64 literal longs
    val positions = bench.withColumn("h", keyHash(col("g")))
      .select(explode(array((0 until 4).map(j =>
        bloomPos(j, col("h"), bits)): _*)).as("p"))
      .distinct().collect().map(_.getLong(0))
    val bitmap = Array.fill((bits / 64).toInt)(0L)
    positions.foreach(p => bitmap((p / 64).toInt) |= 1L << (p % 64).toInt)
    val bm = typedLit(bitmap.toSeq)
    def bitSet(j: Int): Column =
      element_at(bm, expr(s"p$j div 64").cast("int") + 1)
        .bitwiseAND(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(p$j % 64 AS INT))")) =!= 0L
    val probes = (0 until 4).foldLeft(
      grams.filter(col("doc_id") % 101 =!= 0)
        .select(col("doc_id"), explode(col("gs")).as("g"))
        .withColumn("h", keyHash(col("g")))) {
      case (df, j) => df.withColumn(s"p$j", bloomPos(j, col("h"), bits))
    }.withColumn("maybe", (0 until 4).map(bitSet).reduce(_ && _))
    // the gate: only bloom-positive grams reach the exact join
    val checked = probes.filter(col("maybe"))
      .join(bench.withColumn("th", lit(true)), Seq("g"), "left")
      .select(col("doc_id"), col("maybe"),
        coalesce(col("th"), lit(false)).as("true_hit"))
    val unchecked = probes.filter(!col("maybe"))
      .select(col("doc_id"), col("maybe"), lit(false).as("true_hit"))
    checked.unionByName(unchecked)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("maybe"), 1L).otherwise(0L)).as("n_bloom_hits"),
        sum(when(col("true_hit"), 1L).otherwise(0L)).as("n_true_hits"))
      .withColumn("n_fp", col("n_bloom_hits") - col("n_true_hits"))
  }

  /** Near-dup clustering: connected components over the LSH candidate
    * graph (pairs with signature-agreement ≥ 0.5), keeping the minimum
    * doc_id as the cluster representative — the step a training pipeline
    * runs after pair generation to drop all-but-one of each duplicate
    * group.
    *
    * Distributed shape: iterative min-label propagation — per round each
    * node takes the min of its own and its neighbors' labels (one
    * edge-keyed shuffle per round), until a fixpoint; rounds are bounded
    * by the graph diameter (≤ log n with doubling in practice — duplicate
    * clusters are tiny). The driver loop only checks a convergence count;
    * all data work is joins/aggregations. Labels converge to the exact
    * per-component minimum, deterministically, regardless of execution
    * order.
    */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val sigs = signatures(s, dir).cache()
    val agree = (0 until NumHashes)
      .map(j => when(col(s"a_mh$j") === col(s"b_mh$j"), 1).otherwise(0))
      .reduce(_ + _)
    val edges = candidates(sigs)
      .join(sigs.toDF("doc_a" +: (0 until NumHashes).map(j => s"a_mh$j"): _*), "doc_a")
      .join(sigs.toDF("doc_b" +: (0 until NumHashes).map(j => s"b_mh$j"): _*), "doc_b")
      .filter(agree >= 4) // signature-agreement jaccard_est >= 0.5
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    // connectedComponents materializes its result eagerly, so by return
    // time the signature cache has served its purpose
    releasing(
      connectedComponents(s, edges)
        .toDF("doc_id", "cluster_id"),
      sigs)
  }

  /** Max (node, label) pairs allowed into the final single-task merge of
    * [[connectedComponents]]. The merge input is the CONTRACTED forest —
    * one pair per dup-graph node per surviving partition, not corpus rows
    * or candidate pairs — so for dedup workloads it is tiny relative to
    * the input; above the cap the exact-but-iterative propagation path
    * runs instead of one oversized task.
    */
  val SingleTaskCC: Long = 8L * 1000 * 1000

  /** Partition-local union-find: consumes (a, b) connection pairs, emits
    * one (node, root) pair per node seen, where root is the minimum node
    * id of the node's partition-local component. Unions always attach the
    * larger root under the smaller, so the root invariant IS the
    * component minimum; finds are path-compressed.
    */
  private def contract(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    import scala.collection.mutable
    val parent = mutable.LongMap.empty[Long]
    val seen = mutable.LongMap.empty[Unit]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (c != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    it.foreach { case (a, b) =>
      seen.update(a, ()); seen.update(b, ())
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    seen.keysIterator.map(n => (n, find(n)))
  }

  /** Distributed connected components with deterministic min-label
    * output, as a constant number of Spark stages instead of an
    * O(diameter) driver loop (label propagation spent ~24 s/round-trip
    * overhead at sf0.1; this shape is bounded by the one heavy upstream
    * pipeline run).
    *
    * Shape: (1) union-find WITHIN each input partition, contracting each
    * partition's subgraph to a min-rooted star forest — output is one
    * pair per distinct node, regardless of edge count; (2) fan-in rounds
    * (64× narrower each) re-contract the unioned forests — overlapping
    * stars merge wherever they co-locate, and a chain of overlaps merges
    * transitively because every round unions WHOLE forests, preserving
    * connectivity exactly; (3) a final merge. When the surviving forest
    * fits one task (≤ `singleTaskMax` pairs) the final merge is a single
    * union-find; otherwise exact min-label propagation with pointer
    * jumping runs over the contracted forest (O(log diameter) rounds,
    * throws after 50 rather than returning unconverged labels).
    *
    * The result is the exact per-component minimum id regardless of how
    * rows were distributed, so round-robin repartitioning cannot make
    * the output nondeterministic.
    */
  private[graft] def connectedComponents(
      s: SparkSession, edges: DataFrame,
      singleTaskMax: Long = SingleTaskCC): DataFrame = {
    import s.implicits._
    val FanIn = 64
    var cur = edges.toDF("_1", "_2").as[(Long, Long)].mapPartitions(contract _)
    var parts = cur.rdd.getNumPartitions
    while (parts > FanIn) {
      parts = math.max(1, parts / FanIn)
      cur = cur.repartition(parts).mapPartitions(contract _)
    }
    // decision point: one count over the contracted forest picks the final
    // merge strategy; the cache means the heavy upstream pipeline (LSH
    // candidates + signature joins) runs exactly once (on a cluster a
    // reliable checkpoint() here also truncates the lineage)
    val forest = cur.cache()
    try {
      val n = forest.count()
      val merged =
        if (n <= singleTaskMax) forest.repartition(1).mapPartitions(contract _).toDF("node", "label")
        else propagateMinLabels(s, forest.toDF("a", "b"))
      // eager: the merge must run while the forest cache is live; callers
      // get a materialized, lineage-truncated frame and no leaked storage
      merged.localCheckpoint(eager = true)
    } finally forest.unpersist(blocking = false)
  }

  /** Exact min-label propagation over an edge list — the big-graph final
    * merge of [[connectedComponents]]: per round every node takes the min
    * of its own and its neighbors' labels (one edge-keyed shuffle), then
    * two pointer-jumping passes collapse label chains exponentially.
    * localCheckpoint keeps the logical plan constant-depth across rounds
    * (nested-join plans otherwise grow analysis/codegen superlinearly).
    * Throws if 50 rounds pass without a fixpoint — unconverged labels
    * must never be returned silently.
    */
  private def propagateMinLabels(s: SparkSession, edges: DataFrame): DataFrame = {
    val undirected = edges
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    var labels = undirected.select(col("a").as("node")).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val neighborMin = undirected
        .join(labels.withColumnRenamed("node", "b").withColumnRenamed("label", "nl"), Seq("b"))
        .groupBy(col("a").as("node")).agg(min("nl").as("nmin"))
      val prop = labels.join(neighborMin, Seq("node"), "left")
        .select(col("node"), col("label").as("old"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint(true)
      val ptr = prop.select(col("node").as("label"), col("label").as("ll"))
      val next = prop
        .join(ptr, Seq("label"), "left")
        .select(col("node"), col("old"), coalesce(col("ll"), col("label")).as("label"))
        .join(ptr, Seq("label"), "left")
        .select(col("node"), col("old"), coalesce(col("ll"), col("label")).as("label"))
      converged = next.filter(col("label") =!= col("old")).limit(1).isEmpty
      labels = next.drop("old")
      rounds += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge after $rounds propagation rounds")
    labels
  }

  /** LSH INDEX HEALTH AUDIT — the bucket-size report an operator reads
    * before trusting (or re-parameterizing) the dedup index: per band,
    * the bucket count, row mass, largest bucket, singleton buckets
    * (hash space too fine → no candidates), buckets over [[MaxBucket]]
    * and the per-mille row mass the cap drops (hash space too coarse →
    * candidate generation quadratic without the cap). This is how
    * "did the banding scheme fit this corpus?" gets measured rather
    * than assumed — the r10 dedup_bloom saturation was exactly this
    * defect class, caught late because nothing reported fill rates.
    *
    * Scale shape: signature kernel + band explode are scan-side; one
    * (band, bkey) aggregate collapses the corpus into bucket rows
    * (map-side partials), one bounded per-band aggregate on top; the
    * share window rides the |bands|-row frame.
    */
  def dedupBucketStats(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val para = s.sparkContext.defaultParallelism
    val balanced =
      if (docs.rdd.getNumPartitions < para) docs.repartition(para) else docs
    // the generator expression holds exactly ONE minhash8 node (a single
    // `mharr` reference inside the transform) — the per-band column form
    // ([[bandRows]]'s array-of-structs) carries 8 separate kernel nodes,
    // and generator-input projections get NO codegen subexpression
    // elimination, so each reference re-ran the kernel: measured 25× on
    // this aggregate (14 s → 0.6 s at sf0.1)
    balanced
      .withColumn("mharr", call_function("minhash8", col("text")))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, " + (Bands - 1) + "), b -> " +
          "md5(concat_ws('|', slice(mharr, b*4+1, 4))))"))
        .as(Seq("band", "bkey")))
      .groupBy("band", "bkey").agg(count(lit(1)).as("sz"))
      .groupBy("band").agg(
        count(lit(1)).as("n_buckets"),
        sum("sz").as("n_rows"),
        max("sz").as("max_bucket"),
        sum(when(col("sz") === 1, 1L).otherwise(0L)).as("n_singleton"),
        sum(when(col("sz") > MaxBucket, 1L).otherwise(0L)).as("n_capped_buckets"),
        sum(when(col("sz") > MaxBucket, col("sz")).otherwise(0L)).as("capped_rows"))
      .withColumn("capped_pm",
        expr("(1000 * capped_rows) div sum(n_rows) over ()"))
      .select("band", "n_buckets", "n_rows", "max_bucket", "n_singleton",
        "n_capped_buckets", "capped_pm")
      .orderBy("band")
  }

  /** DEDUP HEADLINE REPORT — the dataset-card numbers every corpus drop
    * quotes (The Pile / RefinedWeb tables): total docs, distinct texts,
    * duplicate doc count and per-mille rate, the largest exact-dup
    * cluster, how many clusters have ≥2 members, and the total row mass
    * inside dup clusters. One number a reviewer can sanity-check against
    * the dedup keys' row-level output.
    *
    * Scale shape: ONE scan, (hash) partial-aggregate map-side into the
    * distinct-text frame, then a second partial-aggregate into ONE row —
    * both map-side combinable, no window, no join.
    */
  def textDedupReport(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("sz"))
      .agg(sum("sz").as("n_docs"),
        count(lit(1)).as("n_distinct"),
        (sum("sz") - count(lit(1))).as("n_dup_docs"),
        max("sz").as("max_cluster"),
        sum(when(col("sz") >= 2, 1L).otherwise(0L)).as("n_clusters_ge2"),
        sum(when(col("sz") >= 2, col("sz")).otherwise(0L)).as("dup_mass"))
      .withColumn("dup_pm", expr("(1000 * n_dup_docs) div n_docs"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_dedup_report" -> (textDedupReport _),
    "dedup_bucket_stats" -> (dedupBucketStats _),
    "dedup_clusters" -> (dedupClusters _),
    "dedup_exact" -> (dedupExact _),
    "dedup_url" -> (dedupUrl _),
    "dedup_soft" -> (dedupSoft _),
    "dedup_passage" -> (dedupPassage _),
    "dedup_cdc" -> (dedupCdc _),
    "dedup_minhash" -> (dedupMinhash _),
    "dedup_lsh_pairs" -> (dedupLshPairs _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_incr_store" -> (LshIndex.dedupIncrStore _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_substring" -> (dedupSubstring _),
    "dedup_window50" -> (dedupWindow50 _),
    "dedup_window_store" -> (WindowIndex.dedupWindowStore _),
    "dedup_decontaminate" -> (dedupDecontaminate _),
    "dedup_bloom" -> (dedupBloom _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_minhash_acc" -> (dedupMinhashAcc _),
    "dedup_editdist" -> (dedupEditDist _))

  // ---- oracle SQL -----------------------------------------------------

  /** SQL twins of the Bloom machinery, shared by the `dedup_bloom` oracle
    * and `pipe_curate`'s composed decontamination gate. The width CTE
    * replays [[bloomBitsFor]] exactly: smallest power of two ≥ 8·|bench|
    * from an integer VALUES list — no float log2 whose rounding could
    * flip a boundary. The list covers 2^12..2^40 (bench sets to ~137 G
    * grams — far past oracle scale); the `error()` coalesce makes an
    * out-of-range scale fail LOUDLY instead of nulling every probe
    * (`min` over an empty filter is NULL).
    */
  private[operators] val bloomPosSql: String = (0 until 4).map(j =>
    s"(((h % ${Sketches.FoldP}) * ${Sketches.KnuthA + 2 * j + 1} + ${Sketches.HashB * (j + 1)}) % ${Sketches.HashP}) % bw.bits AS p$j")
    .mkString(", ")
  private[operators] val bloomInChecksSql: String =
    (0 until 4).map(j => s"p$j IN (SELECT p FROM bpos)").mkString(" AND ")
  private[operators] val bloomWidthsSql: String =
    (12 to 40).map(b => s"(${1L << b})").mkString(",")
  private[operators] val bloomWidthSelectSql: String =
    s"""SELECT coalesce(min(v),
       |    error('bench gram count exceeds the oracle bloom width list'))
       |    AS bits
       |  FROM (VALUES $bloomWidthsSql) t(v)""".stripMargin

  private val sigSql = {
    val mhs = (0 until NumHashes).map(j =>
      s"list_min(list_transform(shingles, x -> md5(x || '|$j'))) AS mh$j").mkString(",\n       ")
    s"""SELECT doc_id, $mhs
       |FROM (SELECT doc_id,
       |        list_transform(range(0, greatest(length(text) - 4, 1)),
       |                       i -> substr(text, i + 1, 5)) AS shingles
       |      FROM documents) sh""".stripMargin
  }

  private val candSql = {
    val bandSelects = (0 until Bands).map { b =>
      val parts = (0 until 4).map(r => s"mh${4 * b + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($parts) AS bkey FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""bands_raw AS MATERIALIZED (
       |  $bandSelects),
       |bands AS MATERIALIZED (
       |  SELECT doc_id, band, bkey FROM bands_raw
       |  QUALIFY count(*) OVER (PARTITION BY band, bkey) <= $MaxBucket),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
       |  WHERE a.doc_id < b.doc_id)""".stripMargin
  }

  /** Shared by `dedup_incremental` (in-query corpus) and `dedup_incr_store`
    * (corpus served from the persisted [[LshIndex]] artifact).
    */
  private val incrementalSql = {
    val agree = (0 until NumHashes)
      .map(j => s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END").mkString(" + ")
    s"""WITH sigs AS MATERIALIZED ($sigSql),
       |$candSql,
       |inc AS (
       |  SELECT doc_a, doc_b FROM cand
       |  WHERE doc_a % 5 = 4 OR doc_b % 5 = 4)
       |SELECT doc_a, doc_b, ($agree) / 8.0 AS jaccard_est,
       |  ((doc_a % 5 = 4) <> (doc_b % 5 = 4)) AS is_cross
       |FROM inc JOIN sigs a ON a.doc_id = doc_a JOIN sigs b ON b.doc_id = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** DuckDB replay of the 50-token window dedup (tokenize → window →
    * md5 → MaxBucket cut → pair rollup); `pairFilter` restricts the pair
    * set (the store key's batch-side predicate).
    */
  private def window50Sql(pairFilter: String): String =
    s"""WITH t AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), t -> t <> '') AS tk
       |  FROM documents),
       |ok AS (SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) >= $SpanTokens),
       |w AS (SELECT DISTINCT doc_id,
       |    md5(array_to_string(tk[i:i+${SpanTokens - 1}], ' ')) AS fp
       |  FROM ok, LATERAL (SELECT unnest(range(1, n - ${SpanTokens - 2})) AS i) r),
       |b AS (SELECT fp FROM w GROUP BY fp HAVING count(*) <= $MaxBucket),
       |c AS (SELECT w.doc_id, w.fp FROM w JOIN b USING (fp))
       |SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
       |  CAST(count(*) AS BIGINT) AS n_win,
       |  CAST(count(*) + ${SpanTokens - 1} AS BIGINT) AS est_span_toks
       |FROM c a JOIN c b2 USING (fp)
       |WHERE a.doc_id < b2.doc_id$pairFilter
       |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin

  val oracles: Map[String, String] = Map(
    // connected components as a recursive reachability closure + min per
    // node — tractable at oracle scale; the Spark side's label propagation
    // converges to the same per-component minimum
    "dedup_clusters" -> {
      val agree = (0 until NumHashes)
        .map(j => s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH RECURSIVE sigs AS MATERIALIZED ($sigSql),
         |$candSql,
         |agreed AS (
         |  SELECT doc_a, doc_b
         |  FROM cand JOIN sigs a ON a.doc_id = doc_a JOIN sigs b ON b.doc_id = doc_b
         |  WHERE ($agree) >= 4),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM agreed
         |          UNION ALL SELECT doc_b, doc_a FROM agreed),
         |reach(node, m) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.m)
         |SELECT node AS doc_id, CAST(min(m) AS BIGINT) AS cluster_id
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin
    },
    "dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    // DuckDB replay of canonicalizeUrl: same rule chain, same order —
    // fragment, authority lowercase, www, default ports, tracking-param
    // filter + byte-wise sort, trailing slash
    "dedup_url" ->
      """WITH d AS (SELECT doc_id, doc_id % 200 AS core,
        |    CASE doc_id % 5
        |      WHEN 0 THEN 'https://WWW.Site' || (doc_id % 200) || '.example.com/docs/page' || (doc_id % 200) || '/?utm_source=feed'
        |      WHEN 1 THEN 'HTTPS://Site' || (doc_id % 200) || '.EXAMPLE.COM:443/docs/page' || (doc_id % 200)
        |      WHEN 2 THEN 'https://site' || (doc_id % 200) || '.example.com/docs/page' || (doc_id % 200) || '#section-2'
        |      WHEN 3 THEN 'https://site' || (doc_id % 200) || '.example.com:443/docs/page' || (doc_id % 200) || '/?utm_campaign=x&utm_medium=y'
        |      ELSE 'https://www.site' || (doc_id % 200) || '.example.com/docs/page' || (doc_id % 200) || '?b=2&a=1&utm_content=z'
        |    END AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(url, '#.*', '') AS u FROM d),
        |s2 AS (SELECT doc_id,
        |    lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0))
        |      || substr(u, length(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) + 1) AS u
        |  FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(u, '^(https?://)www\.', '\1') AS u FROM s2),
        |s4 AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(u, '^(https://[^/?#]*):443', '\1'),
        |                   '^(http://[^/?#]*):80', '\1') AS u
        |  FROM s3),
        |s5 AS (SELECT doc_id,
        |    regexp_replace(split_part(u, '?', 1), '([^/])/$', '\1') AS base,
        |    -- array_to_string([]) is NULL in DuckDB (Spark array_join
        |    -- gives ''): coalesce keeps the no-params case a real ''
        |    coalesce(array_to_string(list_sort(list_filter(string_split(regexp_extract(u, '\?(.*)', 1), '&'),
        |      p -> p <> '' AND NOT starts_with(p, 'utm_')
        |        AND NOT starts_with(p, 'fbclid=') AND NOT starts_with(p, 'gclid='))), '&'), '') AS keep
        |  FROM s4)
        |SELECT base || CASE WHEN keep = '' THEN '' ELSE '?' || keep END AS canon_url,
        |  count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM s5 GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_soft" ->
      """SELECT doc_id,
        |  count(*) OVER (PARTITION BY md5(text)) AS n_copies,
        |  CAST(1000000 // count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS weight_ppm
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the generate_subscripts/unnest pair expands in lockstep, so word i
    // keeps its 1-based position; passage idx = (i-1) div W, first
    // occurrence per md5 in (doc_id, pidx) order
    "dedup_cdc" -> {
      import graft.functions.TextKernels.{CdcMask, RollMod, RollPow, RollWindow}
      val powCase = (0 until RollWindow)
        .map(k => s"WHEN $k THEN ${RollPow(RollWindow - 1 - k)}")
        .mkString(" ")
      s"""WITH d AS (SELECT doc_id, text, lower(hex(encode(text))) AS hx,
         |      octet_length(encode(text)) AS nb FROM documents),
         |bytes AS (SELECT doc_id, p,
         |      CAST(('0x' || substr(hx, 2*p - 1, 2)) AS BIGINT) AS bv
         |    FROM d, LATERAL (SELECT unnest(range(1, nb + 1)) AS p) r),
         |win AS (SELECT doc_id, i FROM d,
         |    LATERAL (SELECT unnest(range(1, greatest(nb - ${RollWindow - 1}, 0) + 1)) AS i) rr),
         |h AS (SELECT w.doc_id, w.i,
         |      CAST(sum(b.bv * CASE CAST(b.p - w.i AS INT) $powCase END)
         |        % $RollMod AS BIGINT) AS hv
         |    FROM win w JOIN bytes b
         |      ON b.doc_id = w.doc_id AND b.p >= w.i AND b.p < w.i + $RollWindow
         |    GROUP BY 1, 2),
         |cuts AS (SELECT h.doc_id, i + $RollWindow AS s
         |    FROM h JOIN d ON d.doc_id = h.doc_id
         |    WHERE hv % $CdcMask = 0 AND i + $RollWindow <= d.nb),
         |starts AS (SELECT doc_id, 1 AS s FROM d
         |    UNION ALL SELECT doc_id, s FROM cuts),
         |spans AS (SELECT doc_id, s,
         |      lead(s) OVER (PARTITION BY doc_id ORDER BY s) AS nxt FROM starts),
         |chunks AS (SELECT sp.doc_id, sp.s,
         |      coalesce(sp.nxt, d.nb + 1) - sp.s AS len,
         |      md5(substr(d.text, CAST(sp.s AS INT),
         |        CAST(coalesce(sp.nxt, d.nb + 1) - sp.s AS INT))) AS h
         |    FROM spans sp JOIN d ON d.doc_id = sp.doc_id),
         |mk AS (SELECT doc_id, len,
         |      CASE WHEN row_number() OVER (PARTITION BY h ORDER BY doc_id, s) > 1
         |        THEN 1 ELSE 0 END AS dup
         |    FROM chunks)
         |SELECT doc_id, count(*) AS n_chunks, CAST(sum(len) AS BIGINT) AS n_bytes,
         |  CAST(sum(dup) AS BIGINT) AS dup_chunks,
         |  CAST(sum(dup * len) AS BIGINT) AS dup_bytes,
         |  CAST((1000 * sum(dup * len)) // sum(len) AS BIGINT) AS dup_pm
         |FROM mk GROUP BY 1 ORDER BY doc_id""".stripMargin
    },
    "dedup_passage" ->
      s"""WITH wds AS (
         |  SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w
         |  FROM (SELECT doc_id, str_split(text, ' ') AS ws FROM documents) t),
         |pass AS MATERIALIZED (
         |  SELECT doc_id, (i - 1) // $PassageW AS pidx,
         |    md5(string_agg(w, ' ' ORDER BY i)) AS h, count(*) AS n_words
         |  FROM wds GROUP BY 1, 2),
         |rk AS (SELECT doc_id, pidx, n_words,
         |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pidx) AS rk
         |  FROM pass)
         |SELECT doc_id, count(*) AS n_passages,
         |  CAST(sum(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
         |  CAST(sum(CASE WHEN rk = 1 THEN n_words ELSE 0 END) AS BIGINT) AS n_words_kept
         |FROM rk GROUP BY 1 ORDER BY doc_id""".stripMargin,
    // 3-gram slice w[i:i+2] is 1-based INCLUSIVE (3 tokens), matching the
    // Spark side's slice(w, i, 3); range() end is exclusive so i runs to
    // len(w)-2, the last full trigram start
    "dedup_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |grams AS MATERIALIZED (
        |  SELECT doc_id,
        |    CASE WHEN len(w) >= 3 THEN
        |      list_distinct(list_transform(range(1, len(w) - 1),
        |                    i -> array_to_string(w[i:i+2], ' ')))
        |    ELSE [] END AS gs
        |  FROM toks),
        |bench AS MATERIALIZED (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 101 = 0)
        |SELECT c.doc_id, count(*) AS n_gram_hits
        |FROM grams c, unnest(c.gs) AS u(g) JOIN bench ON u.g = bench.g
        |WHERE c.doc_id % 101 <> 0
        |GROUP BY c.doc_id""".stripMargin,
    "dedup_bloom" -> {
      val pj = bloomPosSql
      val inChecks = bloomInChecksSql
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |grams AS MATERIALIZED (
         |  SELECT doc_id,
         |    CASE WHEN len(w) >= 3 THEN
         |      list_distinct(list_transform(range(1, len(w) - 1),
         |                    i -> array_to_string(w[i:i+2], ' ')))
         |    ELSE [] END AS gs
         |  FROM toks),
         |bench AS MATERIALIZED (SELECT DISTINCT unnest(gs) AS g FROM grams WHERE doc_id % 101 = 0),
         |bw AS ($bloomWidthSelectSql
         |  WHERE v >= 8 * (SELECT count(*) FROM bench)),
         |bh AS (SELECT CAST(('0x' || substr(md5(g), 1, 12)) AS BIGINT) AS h
         |  FROM bench, bw),
         |bp AS (SELECT $pj FROM bh, bw),
         |bpos AS MATERIALIZED (SELECT DISTINCT p FROM (
         |  SELECT p0 AS p FROM bp UNION ALL SELECT p1 FROM bp
         |  UNION ALL SELECT p2 FROM bp UNION ALL SELECT p3 FROM bp)),
         |tg AS (SELECT c.doc_id, u.g AS g,
         |    CAST(('0x' || substr(md5(u.g), 1, 12)) AS BIGINT) AS h
         |  FROM grams c, unnest(c.gs) AS u(g) WHERE c.doc_id % 101 <> 0),
         |tp AS (SELECT doc_id, g, $pj FROM tg, bw),
         |fl AS (SELECT doc_id, ($inChecks) AS maybe,
         |    g IN (SELECT g FROM bench) AS th FROM tp)
         |SELECT doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
         |  CAST(sum(CASE WHEN th THEN 1 ELSE 0 END) AS BIGINT) AS n_true_hits,
         |  CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END)
         |    - sum(CASE WHEN th THEN 1 ELSE 0 END) AS BIGINT) AS n_fp
         |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "dedup_minhash" -> s"$sigSql ORDER BY doc_id",
    "text_dedup_report" ->
      """WITH g AS (SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS sz
        |  FROM documents GROUP BY 1)
        |SELECT CAST(sum(sz) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(sz) - count(*) AS BIGINT) AS n_dup_docs,
        |  CAST(max(sz) AS BIGINT) AS max_cluster,
        |  CAST(sum(CASE WHEN sz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clusters_ge2,
        |  CAST(sum(CASE WHEN sz >= 2 THEN sz ELSE 0 END) AS BIGINT)
        |    AS dup_mass,
        |  CAST((1000 * (sum(sz) - count(*))) // sum(sz) AS BIGINT) AS dup_pm
        |FROM g""".stripMargin,
    "dedup_bucket_stats" -> {
      val bandSelects = (0 until Bands).map { b =>
        val parts = (0 until 4).map(r => s"mh${4 * b + r}").mkString(" || '|' || ")
        s"SELECT doc_id, $b AS band, md5($parts) AS bkey FROM sigs"
      }.mkString("\n  UNION ALL ")
      s"""WITH sigs AS MATERIALIZED ($sigSql),
         |br AS (
         |  $bandSelects),
         |g AS (SELECT band, bkey, CAST(count(*) AS BIGINT) AS sz
         |  FROM br GROUP BY 1, 2)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST(sum(sz) AS BIGINT) AS n_rows,
         |  CAST(max(sz) AS BIGINT) AS max_bucket,
         |  CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_singleton,
         |  CAST(sum(CASE WHEN sz > $MaxBucket THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_capped_buckets,
         |  CAST((1000 * sum(CASE WHEN sz > $MaxBucket THEN sz ELSE 0 END))
         |    // (sum(sum(sz)) OVER ()) AS BIGINT) AS capped_pm
         |FROM g GROUP BY band ORDER BY band""".stripMargin
    },
    "dedup_incremental" -> incrementalSql,
    // the persisted-index probe (LshIndex) must reproduce the in-query
    // incremental computation exactly: same candidates, same cap, same
    // jaccard — corpus side served from the artifact
    "dedup_incr_store" -> incrementalSql,
    "dedup_lsh_pairs" -> {
      val agree = (0 until NumHashes)
        .map(j => s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH sigs AS MATERIALIZED ($sigSql),
         |$candSql
         |SELECT doc_a, doc_b, ($agree) / 8.0 AS jaccard_est
         |FROM cand JOIN sigs a ON a.doc_id = doc_a JOIN sigs b ON b.doc_id = doc_b
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "dedup_window50" -> window50Sql(""),
    // the store key is the one-shot computation restricted to pairs with
    // a batch (doc_id % 3 = 2) side — exactly what probe-after-append
    // serves from the persisted index
    "dedup_window_store" ->
      window50Sql(" AND (a.doc_id % 3 = 2 OR b2.doc_id % 3 = 2)"),
    "dedup_substring" -> {
      import graft.functions.TextKernels.{FpSample, RollMod, RollPow, RollWindow}
      val powCase = (0 until RollWindow)
        .map(k => s"WHEN $k THEN ${RollPow(RollWindow - 1 - k)}")
        .mkString(" ")
      s"""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
         |              octet_length(encode(text)) AS nb FROM documents),
         |bytes AS MATERIALIZED (SELECT doc_id, p, CAST(('0x' || substr(hx, 2*p - 1, 2)) AS BIGINT) AS bv
         |          FROM d, LATERAL (SELECT unnest(range(1, nb + 1)) AS p) r),
         |win AS MATERIALIZED (SELECT doc_id, i FROM d,
         |        LATERAL (SELECT unnest(range(1, greatest(nb - ${RollWindow - 1}, 0) + 1)) AS i) rr),
         |h AS MATERIALIZED (SELECT w.doc_id, w.i,
         |        CAST(sum(b.bv * CASE CAST(b.p - w.i AS INT) $powCase END) % $RollMod AS BIGINT) AS hv
         |      FROM win w JOIN bytes b
         |        ON b.doc_id = w.doc_id AND b.p >= w.i AND b.p < w.i + $RollWindow
         |      GROUP BY 1, 2),
         |fps AS MATERIALIZED (SELECT DISTINCT doc_id, hv FROM h WHERE hv % $FpSample = 0),
         |capped AS (SELECT doc_id, hv FROM fps
         |           QUALIFY count(*) OVER (PARTITION BY hv) <= $MaxBucket)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  count(*) AS n_shared,
         |  CAST(count(*) * $FpSample AS BIGINT) AS est_shared_bytes
         |FROM capped a JOIN capped b ON a.hv = b.hv AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= $MinSharedFps
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "dedup_simhash" ->
      """WITH toks AS (SELECT doc_id, t AS tok
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents) x
        |  WHERE t <> ''),
        |th AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM toks),
        |bits AS (SELECT doc_id, b,
        |    CASE WHEN (strpos('0123456789abcdef', substr(h, 16 - b // 4, 1)) - 1)
        |              & (1 << (b % 4)) <> 0 THEN 1 ELSE -1 END AS w
        |  FROM th, range(0, 64) r(b)),
        |sums AS (SELECT doc_id, b, sum(w) AS s FROM bits GROUP BY 1, 2),
        |digs AS (SELECT doc_id, b // 4 AS dig,
        |    sum(CASE WHEN s > 0 THEN 1 << (b % 4) ELSE 0 END) AS dv
        |  FROM sums GROUP BY 1, 2),
        |fp AS (SELECT doc_id,
        |    string_agg(substr('0123456789abcdef', CAST(dv + 1 AS INT), 1), '' ORDER BY dig DESC) AS sh
        |  FROM digs GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(fp.sh, '0000000000000000') AS simhash
        |FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // the oracle computes FULL levenshtein and clamps at the pair's own
    // dup bound — lv ≤ (20·max) div 100 ⇔ 100·lv ≤ 20·max for integer
    // lv, so the clamp and the kernel's band agree exactly
    "dedup_editdist" ->
      s"""WITH sigs AS MATERIALIZED ($sigSql),
         |$candSql,
         |lv AS (SELECT c.doc_a, c.doc_b,
         |    CAST(levenshtein(a.text, b.text) AS INT) AS lv,
         |    CAST(length(a.text) AS INT) AS len_a,
         |    CAST(length(b.text) AS INT) AS len_b
         |  FROM cand c JOIN documents a ON a.doc_id = c.doc_a
         |    JOIN documents b ON b.doc_id = c.doc_b)
         |SELECT doc_a, doc_b,
         |  CASE WHEN 100 * lv > 20 * greatest(len_a, len_b) THEN -1
         |       ELSE lv END AS lev,
         |  len_a, len_b,
         |  100 * lv <= 20 * greatest(len_a, len_b) AS is_dup
         |FROM lv ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_minhash_acc" -> {
      val agree = (0 until NumHashes)
        .map(j => s"CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH sigs AS MATERIALIZED ($sigSql),
         |$candSql,
         |grams AS MATERIALIZED (SELECT doc_id,
         |    list_distinct(list_transform(range(0, greatest(len(toks) - 2, 1)),
         |      i -> concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3]))) AS gs
         |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |        FROM documents) t),
         |flat AS (SELECT doc_id, unnest(gs) AS g FROM grams),
         |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cand c JOIN flat fa ON fa.doc_id = c.doc_a
         |              JOIN flat fb ON fb.doc_id = c.doc_b AND fb.g = fa.g
         |  GROUP BY 1, 2),
         |pp AS (SELECT c.doc_a, c.doc_b, CAST($agree AS BIGINT) AS agree,
         |    coalesce(i.inter, 0) AS inter,
         |    len(ga.gs) + len(gb.gs) - coalesce(i.inter, 0) AS un
         |  FROM cand c
         |  JOIN sigs a ON a.doc_id = c.doc_a
         |  JOIN sigs b ON b.doc_id = c.doc_b
         |  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         |  JOIN grams ga ON ga.doc_id = c.doc_a
         |  JOIN grams gb ON gb.doc_id = c.doc_b)
         |SELECT agree, count(*) AS n_pairs,
         |  CAST(sum(inter) AS BIGINT) AS sum_inter,
         |  CAST(sum(un) AS BIGINT) AS sum_union,
         |  CAST((1000 * sum(inter)) // sum(un) AS BIGINT) AS pool_j_pm,
         |  CAST(min((1000 * inter) // un) AS BIGINT) AS min_j_pm,
         |  CAST(max((1000 * inter) // un) AS BIGINT) AS max_j_pm
         |FROM pp GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "dedup_ngram_jaccard" ->
      s"""WITH sigs AS MATERIALIZED ($sigSql),
         |$candSql,
         |grams AS MATERIALIZED (SELECT doc_id,
         |    list_distinct(list_transform(range(0, greatest(len(toks) - 2, 1)),
         |      i -> concat_ws(' ', toks[i + 1], toks[i + 2], toks[i + 3]))) AS gs
         |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |        FROM documents) t),
         |flat AS (SELECT doc_id, unnest(gs) AS g FROM grams),
         |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cand c JOIN flat fa ON fa.doc_id = c.doc_a
         |              JOIN flat fb ON fb.doc_id = c.doc_b AND fb.g = fa.g
         |  GROUP BY 1, 2)
         |SELECT i.doc_a, i.doc_b, i.inter, len(ga.gs) AS na, len(gb.gs) AS nb,
         |       CAST(i.inter AS DOUBLE) / (len(ga.gs) + len(gb.gs) - i.inter) AS jaccard
         |FROM inter i JOIN grams ga ON ga.doc_id = i.doc_a
         |             JOIN grams gb ON gb.doc_id = i.doc_b
         |ORDER BY i.doc_a, i.doc_b""".stripMargin)
}
