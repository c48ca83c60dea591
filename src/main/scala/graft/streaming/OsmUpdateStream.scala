package graft.streaming

import graft.operators.OsmUpdater
import graft.sources.OsmXml
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous typed replication — the streaming face of
  * [[graft.operators.OsmUpdater]]: a watched replication directory of
  * minutely `.osc` files becomes a file stream; each micro-batch applies
  * through the SAME `applyDiff` the sequenced catch-up uses (diff
  * classification, backref-propagated way/relation minors, store
  * upserts), so batch catch-up and continuous streaming produce identical
  * stores and contribution streams over the same diff sequence.
  *
  * `foreachBatch` is the right Structured Streaming hook here: the store
  * upsert is a transactional side effect with its own commit protocol
  * (bucketed snapshots + atomic pointer), and applyDiff's idempotence
  * (versions ≤ stored are filtered, store timestamps advance past applied
  * edits) absorbs Structured Streaming's at-least-once batch replay after
  * a crash — a re-delivered batch emits nothing and rewrites the store to
  * the same state. Checkpointed file-source progress gives exactly-once
  * file discovery on top.
  */
object OsmUpdateStream {

  def start(spark: SparkSession, replDir: String, storeRoot: String,
      outDir: String): StreamingQuery = {
    // a FRESH incarnation (no checkpoint yet) restarts batch ids at 0: a
    // reused outDir full of previous batch=N/_SUCCESS dirs would make the
    // committed-skip silently discard every new batch's output (and a
    // pre-existing flat layout breaks partition discovery). Refuse loudly.
    val cp = java.nio.file.Paths.get(storeRoot, "stream-checkpoint")
    val outP = java.nio.file.Paths.get(outDir)
    if (!java.nio.file.Files.exists(cp) && java.nio.file.Files.isDirectory(outP)) {
      val stream = java.nio.file.Files.list(outP)
      val nonEmpty = try stream.findFirst().isPresent finally stream.close()
      require(!nonEmpty,
        s"$outDir already contains output but $cp has no checkpoint: " +
          "a fresh stream incarnation would collide with (and silently " +
          "skip) the previous run's batch directories — use a new outDir " +
          "or keep the original checkpoint")
    }
    OsmXml.streamOsc(spark, replDir).writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // per-batch overwrite directory (batchId is stable across
          // replays), committed BEFORE the store advances — the same
          // output-then-store order as the batch catch-up, so a replayed
          // batch neither loses nor duplicates contributions
          val dirPath = s"$outDir/batch=$batchId"
          val committed = java.nio.file.Files.exists(
            java.nio.file.Paths.get(dirPath, "_SUCCESS"))
          OsmUpdater.applyDiff(spark, storeRoot, batch,
            sink = out => if (!committed)
              out.write.mode("overwrite").parquet(dirPath))
          // applyDiff's checkpoint blocks must not accumulate across a
          // long-running stream (same discipline as the batch catch-up)
          graft.GraftSession.releaseStorage(spark)
        }
      }
      .option("checkpointLocation", s"$storeRoot/stream-checkpoint")
      .start()
  }
}
