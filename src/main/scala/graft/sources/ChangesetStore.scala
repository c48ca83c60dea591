package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8

/** Persistent, incrementally-updatable changeset store — the
  * ChangesetDB.java analog (the reference keeps a resumable Postgres upsert
  * store of changeset rows; `--changeset-db`, docs/CLI.md). Here the store
  * is versioned parquet snapshots with an atomically-swapped pointer file:
  *
  *  - `v=N/` — immutable snapshot N (plain parquet).
  *  - `current` — single-line pointer to the live version, written via
  *    tmp + atomic rename AFTER snapshot N lands; it is the only commit
  *    point, so a crash mid-upsert leaves the previous snapshot live and
  *    the re-run overwrites the orphan — same idempotent-resume contract
  *    as the replication catch-up state.
  *
  * Upsert = latest-wins by key: stored rows whose key appears in the batch
  * are replaced, others carried over. The batch key set is broadcast into
  * a left-anti join, so the (large) store side never shuffles. At 100 TB
  * store sizes the carry-over rewrite would be bounded by bucketing the
  * store on the key and rewriting only batch-touched buckets — the
  * snapshot+pointer commit protocol is unchanged by that optimization.
  */
object ChangesetStore {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Live version number, if the store exists. */
  def currentVersion(spark: SparkSession, storeDir: String): Option[Int] = {
    val f = fs(spark, storeDir)
    val ptr = new Path(storeDir, "current")
    if (!f.exists(ptr)) None
    else {
      val in = f.open(ptr)
      try Some(new String(in.readAllBytes(), UTF_8).trim.toInt)
      finally in.close()
    }
  }

  /** The live snapshot (empty-schema-less: callers must only read a store
    * they have written).
    */
  def read(spark: SparkSession, storeDir: String): DataFrame = {
    val v = currentVersion(spark, storeDir).getOrElse(
      throw new IllegalStateException(s"$storeDir: no committed store version"))
    spark.read.parquet(s"$storeDir/v=$v")
  }

  /** Applies one batch with latest-wins-by-`keys` semantics and commits a
    * new snapshot. Returns the committed version. Old snapshots beyond the
    * previous one are garbage-collected (the previous stays for readers
    * mid-flight and for crash forensics).
    */
  def upsert(spark: SparkSession, storeDir: String, batch: DataFrame,
      keys: Seq[String]): Int = {
    val f = fs(spark, storeDir)
    f.mkdirs(new Path(storeDir))
    val prev = currentVersion(spark, storeDir)
    val next = prev.getOrElse(0) + 1
    val merged = prev match {
      case None => batch
      case Some(_) =>
        val keyDf = batch.select(keys.map(col): _*).distinct()
        read(spark, storeDir)
          .join(broadcast(keyDf), keys, "left_anti")
          .unionByName(batch)
    }
    merged.write.mode("overwrite").parquet(s"$storeDir/v=$next")
    // commit: pointer tmp + atomic rename
    val tmp = new Path(storeDir, "current.tmp")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes(UTF_8))
    finally out.close()
    if (!f.delete(new Path(storeDir, "current"), false) && f.exists(new Path(storeDir, "current")))
      throw new java.io.IOException(s"$storeDir: cannot replace pointer")
    if (!f.rename(tmp, new Path(storeDir, "current")))
      throw new java.io.IOException(s"$storeDir: pointer commit failed")
    // GC everything older than the previous snapshot
    prev.foreach { p =>
      val it = f.listStatus(new Path(storeDir))
      it.foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("v=") && n.drop(2).forall(_.isDigit) && n.drop(2).toInt < p)
          f.delete(st.getPath, true)
      }
    }
    next
  }
}
