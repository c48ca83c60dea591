package graft.streaming

import graft.operators.TextOps
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The per-document signal row the stateless gate stage emits — the
  * typed face of [[TextOps.curateSignals]]' output columns.
  */
case class CurateSignals(doc_id: Long, pred_lang: String, n_words: Long,
    fp: String, ok_lang: Boolean, ok_quality: Boolean, ok_rep: Boolean,
    n_fp: Long, ok_decon: Boolean)

/** Streaming verdict — the same row `pipe_curate` materializes. */
case class CurateVerdict(doc_id: Long, pred_lang: String, n_words: Long,
    ok_lang: Boolean, ok_quality: Boolean, ok_rep: Boolean, ok_uniq: Boolean,
    n_fp: Long, ok_decon: Boolean, keep: Boolean, reason: String)

/** Continuous curation — the streaming face of `pipe_curate`: every
  * stateless gate (language, quality, repetition, decontamination) is
  * THE SAME expression pipeline as the batch operator (shared through
  * [[TextOps.curateSignals]], so the two faces cannot drift), and the
  * exact-dedup gate becomes fingerprint state in Spark's managed state
  * store: first arrival per fingerprint is canonical, later arrivals
  * gate out as `duplicate` — which is what "first doc wins" MEANS on a
  * stream, and equals the batch `min(doc_id)` verdict whenever ingest
  * order follows doc_id (the parity spec's arrangement).
  *
  * Scale shape: the gate stage is scan-side kernel work on each
  * micro-batch (the decon artifact binds once per query from the
  * benchmark dir, like the batch operator); the only state is one
  * (fingerprint → first id) pair per distinct document — RocksDB-backed
  * and TTL-expirable at 100 TB, same notes as [[DedupStream]]. Replay
  * is idempotent: a redelivered doc finds its own id in state and keeps
  * its first verdict.
  */
object CurateStream {

  def judge(fp: String, rows: Iterator[CurateSignals],
      state: GroupState[Long]): Iterator[CurateVerdict] = {
    var first = state.getOption.getOrElse(-1L)
    val out = rows.toSeq.sortBy(_.doc_id).map { r =>
      if (first < 0) first = r.doc_id
      val okUniq = r.doc_id == first
      val keep = r.ok_lang && r.ok_quality && r.ok_rep && okUniq && r.ok_decon
      // the reason ladder must stay in lockstep with pipeCurate's chain
      val reason =
        if (!r.ok_lang) "lang"
        else if (!r.ok_quality) "quality"
        else if (!r.ok_rep) "repetition"
        else if (!okUniq) "duplicate"
        else if (!r.ok_decon) "contaminated"
        else "kept"
      CurateVerdict(r.doc_id, r.pred_lang, r.n_words, r.ok_lang, r.ok_quality,
        r.ok_rep, okUniq, r.n_fp, r.ok_decon, keep, reason)
    }
    state.update(first)
    out.iterator
  }

  /** `benchDir` points at the corpus whose held-out docs define the
    * decontamination artifact (built once per query, batch-identical).
    */
  def apply(spark: SparkSession, docs: Dataset[DocArrival],
      benchDir: String): Dataset[CurateVerdict] = {
    import spark.implicits._
    graft.functions.GeoFunctions.register(spark)
    TextOps.curateSignals(docs.toDF(),
        TextOps.deconArtifactCol(spark, benchDir))
      .selectExpr("doc_id", "pred_lang", "n_words", "fp", "ok_lang",
        "ok_quality", "ok_rep", "n_fp", "ok_decon")
      .as[CurateSignals]
      .groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(judge)
  }
}
