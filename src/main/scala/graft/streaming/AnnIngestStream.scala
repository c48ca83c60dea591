package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** One embedding vector arriving on the ingest stream. */
final case class VecArrival(vec_id: Long, embedding: Array[Float])

/** Continuous vector ingest — the streaming face of the persisted IVF
  * index ([[graft.operators.IvfIndex]] / `ann_ivf_store`): each
  * micro-batch of vectors is PROBED against the index (top-k neighbor
  * rows land in a per-batch parquet results feed — the "what does this
  * new data resemble" signal), then APPENDED as per-cell delta files
  * with the locator-tracked latest-wins contract.
  *
  * Unlike [[LshIngestStream]] (whose band store is append-only and needs
  * an id GATE), replay safety here is inherent: the IVF append is
  * LATEST-WINS by vec_id — a redelivered batch re-assigns the same
  * vectors to the same cells and its rows supersede the identical rows
  * it wrote the first time, so every INDEX read (probe) is
  * value-idempotent; the re-emitted results feed overwrites its own
  * `batch_id=N` directory. One at-least-once nuance is inherent to the
  * probe-before-append ordering: a replayed trigger probes an index
  * that already holds its own first-delivery rows, so its feed rows see
  * the batch's vectors as neighbors (each finds itself at rank 1) — the
  * feed stays consistent with the index state it probed, it does not
  * replay the pre-append past. A periodic [[IvfIndex.compactCells]]
  * folds the (bounded) replay-duplicate delta files away with the
  * ordinary delta debt.
  *
  * Per-trigger I/O is O(batch): assignment is map-only against the live
  * codebook, the probe opens only the probed cells, the append writes
  * deltas without reading cell bases.
  */
object AnnIngestStream {

  def start(spark: SparkSession, vecs: DataFrame, indexDir: String,
      resultsDir: String, checkpointDir: String, k: Int = 3,
      compactEvery: Int = 16): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          processBatch(spark, batch, batchId, indexDir, resultsDir, k,
            compactEvery)
      }
      .start()

  /** One trigger's work, exposed for the stream==batch parity spec. */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, indexDir: String, resultsDir: String, k: Int,
      compactEvery: Int): Unit = {
    // materialized once: probed AND appended
    val b = batch.select("vec_id", "embedding").localCheckpoint(true)
    try {
      IvfIndex.probe(spark, indexDir, b, k = k)
        .write.mode("overwrite").parquet(s"$resultsDir/batch_id=$batchId")
      IvfIndex.append(spark, b, indexDir)
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
        IvfIndex.compactCells(spark, indexDir)
    } finally b.unpersist(blocking = false)
  }

  /** The accumulated neighbor feed across all batches. */
  def results(spark: SparkSession, resultsDir: String): DataFrame =
    spark.read.option("basePath", resultsDir).parquet(resultsDir)
}
