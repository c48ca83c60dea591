package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, desc, row_number}
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
  * an id GATE), replay safety of the INDEX is inherent: the IVF append
  * is LATEST-WINS by vec_id — a redelivered batch re-assigns the same
  * vectors to the same cells and its rows supersede the identical rows
  * it wrote the first time, so every index read (probe) is
  * value-idempotent. The FEED is made exactly-once by keying it on
  * batchId: a batch whose `batch_id=N` directory already committed
  * (`_SUCCESS`) skips the probe entirely on redelivery, so feed content
  * is frozen at first delivery no matter when the trigger crashed —
  * without the gate, a replayed probe would run against an index already
  * holding the batch's own rows and batch-mates (including each vector
  * itself at rank 1) could displace the true neighbors. Because the feed
  * commit happens BEFORE the append, an uncommitted feed on replay
  * implies the append never ran, so the re-probe still sees the
  * pre-batch index; the self-match filter below (probe k+1, drop
  * q_id = n_id, re-rank) is defense in depth for that window and leaves
  * first-delivery content untouched (a vector absent from the index can
  * never match itself). A periodic [[IvfIndex.compactCells]] folds the
  * (bounded) replay-duplicate delta files away with the ordinary delta
  * debt.
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
      val feedDir = new org.apache.hadoop.fs.Path(s"$resultsDir/batch_id=$batchId")
      val fs = feedDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val feedCommitted =
        fs.exists(new org.apache.hadoop.fs.Path(feedDir, "_SUCCESS"))
      if (!feedCommitted)
        IvfIndex.probe(spark, indexDir, b, k = k + 1)
          .filter(col("q_id") =!= col("n_id"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("q_id").orderBy(desc("cos"), col("n_id"))))
          .filter(col("rnk") <= k)
          .select("q_id", "n_id", "rnk", "cell", "cos")
          .write.mode("overwrite").parquet(feedDir.toString)
      IvfIndex.append(spark, b, indexDir)
      if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
        IvfIndex.compactCells(spark, indexDir)
    } finally b.unpersist(blocking = false)
  }

  /** The accumulated neighbor feed across all batches. */
  def results(spark: SparkSession, resultsDir: String): DataFrame =
    spark.read.option("basePath", resultsDir).parquet(resultsDir)
}
