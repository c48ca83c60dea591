package graft.operators

import graft.Tables
import graft.sources.ChangesetStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted exact-substring dedup index — [[Dedup.dedupWindow50]]'s
  * window-fingerprint table as a store artifact, the production shape
  * for CONTINUOUS crawl ingest: a new batch must be checked for ≥50-token
  * duplicate spans against the whole accumulated corpus without
  * recomputing (or even reading) the corpus windows.
  *
  * Layout: `(fp, doc_id)` rows bucketed by `fp` through the shared
  * [[graft.sources.ChangesetStore]] machinery (base + per-bucket delta
  * files + atomic version pointer — the LshIndex/Bm25Index discipline).
  * Because every row of one fingerprint lives in exactly one bucket,
  * a probe that opens only the BATCH's fp buckets still sees each
  * opened fingerprint's COMPLETE corpus posting — so the MaxBucket
  * pathological-repeat cap computed over opened rows equals the cap the
  * one-shot operator computes over the full corpus, and store-served
  * results are bit-identical to the monolithic computation restricted
  * to batch-involving pairs.
  *
  * Scale: appends write per-bucket DELTA files — O(batch) I/O against
  * any corpus size; probes read base+deltas of only the touched buckets
  * (batch-fp-proportional); [[compact]] folds delta-heavy buckets to
  * bound probe fan-in.
  */
object WindowIndex {

  private val Keys = Seq("fp", "doc_id")
  private val BucketBy = Seq("fp")

  /** Builds the index from a corpus slice (one store version). */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String,
      numBuckets: Int = 64): Int = {
    // new store: the upsert consumes the batch once — no merge probe, no
    // key set — so the materialization is only paid on re-builds (r14)
    val fresh = ChangesetStore.currentVersion(spark, indexDir).isEmpty
    val rows = if (fresh) Dedup.windowRows(docs)
      else Dedup.windowRows(docs).localCheckpoint(true)
    try ChangesetStore.upsertBucketed(spark, indexDir, rows,
      Keys, numBuckets, BucketBy)
    finally if (!fresh) { rows.unpersist(blocking = false); () }
  }

  /** Appends a batch's window rows as per-bucket DELTA files — O(batch)
    * I/O, no existing bucket data read or rewritten (row identity
    * (fp, doc_id) never repeats for an immutable corpus: windowRows is
    * per-doc distinct).
    */
  def append(spark: SparkSession, docs: DataFrame, indexDir: String,
      numBuckets: Int = 64): Int =
    // delta appends consume the batch once (staging write only)
    appendRows(spark, Dedup.windowRows(docs), indexDir, numBuckets)

  /** Row-level append for callers that already materialized the batch's
    * window rows (the streaming ingest computes them ONCE for gate +
    * probe + append).
    */
  private[graft] def appendRows(spark: SparkSession, rows: DataFrame,
      indexDir: String, numBuckets: Int): Int =
    ChangesetStore.appendBucketed(spark, indexDir, rows,
      Keys, numBuckets, BucketBy)

  /** The index's rows under the batch's fingerprints — base + deltas of
    * only the touched buckets (batch-fp-proportional I/O).
    */
  private[graft] def openedFor(spark: SparkSession, indexDir: String,
      bw: DataFrame, numBuckets: Int): DataFrame = {
    val fps = bw.select("fp").distinct()
    val empty = bw.sparkSession.range(0)
      .select(lit("").as("fp"), lit(0L).as("doc_id"))
    ChangesetStore
      .readBucketsFor(spark, indexDir, fps, Keys, numBuckets, BucketBy)
      .map(_.join(broadcast(fps), Seq("fp"), "left_semi"))
      .getOrElse(empty)
  }

  /** Batch doc ids ALREADY present in the index — decidable from exactly
    * the buckets the probe opens anyway (a doc's rows live only where
    * its own fps hash), so the at-least-once replay gate costs no extra
    * I/O. A doc too short to emit any window is never indexed and never
    * probed — a redelivery of it appends nothing either way.
    */
  private[graft] def indexedIds(spark: SparkSession, indexDir: String,
      bw: DataFrame, numBuckets: Int): DataFrame =
    openedFor(spark, indexDir, bw, numBuckets)
      .join(bw, Seq("fp", "doc_id"), "left_semi")
      .select("doc_id").distinct()

  /** Folds pending delta files into their buckets' bases once a bucket
    * accumulates `minDeltas` of them.
    */
  def compact(spark: SparkSession, indexDir: String, minDeltas: Int = 4): Int =
    ChangesetStore.compactBucketed(spark, indexDir, minDeltas)

  /** Duplicate-span pairs of `batch` docs against everything the index
    * holds plus the batch itself (order-agnostic: probing before or
    * after the batch's append gives the same result): opens ONLY the
    * buckets the batch's fingerprints hash into, semi-joins to the
    * batch's fp set, and runs the SHARED cap + pair rollup
    * ([[Dedup.windowPairs]]) keeping pairs with ≥ 1 batch side. Opened
    * buckets carry complete per-fp postings, so cap and counts equal the
    * one-shot operator's.
    */
  def probe(spark: SparkSession, indexDir: String, batch: DataFrame,
      numBuckets: Int = 64): DataFrame = {
    val bw = Dedup.windowRows(batch).localCheckpoint(true)
    try probeRows(spark, indexDir, bw, numBuckets)
    finally { bw.unpersist(blocking = false); () }
  }

  private[graft] def probeRows(spark: SparkSession, indexDir: String,
      bw: DataFrame, numBuckets: Int): DataFrame = {
    // index∪batch, (fp, doc_id)-distinct: correct whether the batch was
    // already appended (opened contains its rows — distinct dedupes) or
    // not yet (the streaming probe-then-append order) — the LshIndex
    // .probe discipline
    val opened = openedFor(spark, indexDir, bw, numBuckets)
      .select("doc_id", "fp")
      .unionByName(bw.select("doc_id", "fp"))
      .distinct()
    val batchIds = bw.select("doc_id").distinct()
    Dedup.windowPairs(opened)
      .join(broadcast(batchIds.toDF("doc_a").withColumn("a_new", lit(true))),
        Seq("doc_a"), "left")
      .join(broadcast(batchIds.toDF("doc_b").withColumn("b_new", lit(true))),
        Seq("doc_b"), "left")
      .filter(coalesce(col("a_new"), lit(false)) ||
        coalesce(col("b_new"), lit(false)))
      .select("doc_a", "doc_b", "n_win", "est_span_toks")
  }

  /** Driver-checked key `dedup_window_store`: build on the 80 % corpus
    * split, APPEND the 20 % batch (delta files), then probe the batch —
    * the continuous-ingest lifecycle. Probe-after-append sees the full
    * corpus, so the result is exactly the one-shot [[Dedup
    * .dedupWindow50]] restricted to pairs with a batch side, which is
    * what the oracle replays.
    */
  def dedupWindowStore(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // batch = doc_id ≡ 2 (mod 3): unlike the % 5 = 4 split other store
    // keys use, this one actually straddles the corpus' span-sharing
    // pairs (batch-vs-corpus AND batch-vs-batch results both populated),
    // so the probe path is load-bearing in the driver check
    val isNew = (col("doc_id") % 3) === 2
    // 8 store buckets: 64 is the 100 TB layout; at driver-check scale it
    // is pure small-file overhead (the LshIndex precedent)
    val idx = Scratch.scratch("graft-w50-idx").toString
    build(s, docs.filter(!isNew), idx, numBuckets = 8)
    // the batch's window rows computed ONCE for append + probe (each
    // derived them separately — one tokenize+fingerprint pass saved, r15)
    val bw = Dedup.windowRows(docs.filter(isNew)).localCheckpoint(true)
    // append ∥ probe (§2.6): the probe is order-agnostic by construction
    // (it unions the batch's own rows and (fp, doc_id)-distincts, so
    // seeing the appended deltas or not gives the same table), and the
    // append only ADDS delta dirs while GC keeps the previous manifest's
    // files — the two actions cannot disturb each other
    val (probeDf, _) = graft.Par.run2(
      () => probeRows(s, idx, bw, numBuckets = 8),
      () => appendRows(s, bw, idx, numBuckets = 8))
    probeDf
  }
}
