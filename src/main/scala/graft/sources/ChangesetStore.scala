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
  * a left-anti join, so the (large) store side never shuffles.
  *
  * TWO layouts behind the same pointer commit:
  *
  *  - **snapshot** ([[upsert]]): each version is a full rewrite — simple,
  *    right for dimension-sized stores.
  *  - **bucketed** ([[upsertBucketed]]): rows hash into `b=<i>/v=<vi>`
  *    bucket directories and a `manifest-v<M>.json` maps each bucket to
  *    its live version. An upsert reads, merges, and rewrites ONLY the
  *    buckets the batch touches; untouched buckets keep their existing
  *    files byte-for-byte. This is the 100 TB path: a minutely batch
  *    touching k of NB buckets costs O(k/NB) of the store in I/O, not a
  *    full rewrite, while reads stay plain multi-path parquet scans.
  *
  * Bucketed stores additionally support **delta appends**
  * ([[appendBucketed]]) for append-only row sets: a batch lands as
  * per-bucket `b=<i>/d=<dv>` delta directories recorded in the manifest
  * (`"<b>#d":[dv,…]`) WITHOUT reading or rewriting any existing bucket
  * data — O(batch) I/O even when the batch touches every bucket (the LSH
  * index case: a diverse daily batch hashes into all band buckets, and a
  * read-merge-rewrite there would rewrite the whole accumulated store
  * every day). Reads scan base + deltas; [[compactBucketed]] folds
  * delta-heavy buckets back into their base. Because delta rows are
  * UNIONED (never key-merged) at read time, appends are only for stores
  * whose row identity never repeats — latest-wins writers must use
  * [[upsertBucketed]], which also folds any pending deltas it touches.
  *
  * The bucket layout (`numBuckets` + `bucketBy`) is pinned in a
  * `meta.json` written at store creation and ADOPTED by every later
  * writer and pruned reader: two writers hashing the same key with
  * different bucket counts would strand live rows in dead buckets, so
  * the caller's arguments only matter for a store that does not exist
  * yet.
  */
object ChangesetStore {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Live version number, if the store exists. A missing pointer file does
    * NOT mean an empty store: the pointer swap is not atomic on every
    * filesystem, so recovery falls back to scanning for the highest fully
    * committed artifact — `manifest-v<N>.json` (bucketed layout; written
    * via tmp + atomic rename after its bucket data) or a `v=N/_SUCCESS`
    * snapshot (snapshot layout; the marker lands when the write completes,
    * and a completed-but-unpointered merge already contains the previous
    * snapshot's content, so re-pointing at it never loses rows). Without
    * this, a crash inside the pointer swap would silently restart the
    * store from scratch on the next upsert.
    */
  def currentVersion(spark: SparkSession, storeDir: String): Option[Int] = {
    val f = fs(spark, storeDir)
    val ptr = new Path(storeDir, "current")
    if (f.exists(ptr)) {
      val in = f.open(ptr)
      try Some(new String(in.readAllBytes(), UTF_8).trim.toInt)
      finally in.close()
    } else recoverVersion(spark, storeDir)
  }

  /** Highest committed version when the pointer is missing (crash
    * recovery); None only for a genuinely empty/new store.
    */
  private def recoverVersion(spark: SparkSession, storeDir: String): Option[Int] = {
    val f = fs(spark, storeDir)
    if (!f.exists(new Path(storeDir))) return None
    val names = f.listStatus(new Path(storeDir)).map(_.getPath.getName)
    val manifests = names.collect {
      case n if n.startsWith("manifest-v") && n.endsWith(".json") &&
        n.stripPrefix("manifest-v").stripSuffix(".json").forall(_.isDigit) =>
        n.stripPrefix("manifest-v").stripSuffix(".json").toInt
    }
    val snapshots = names.collect {
      case n if n.startsWith("v=") && n.drop(2).nonEmpty && n.drop(2).forall(_.isDigit) &&
        f.exists(new Path(s"$storeDir/$n/_SUCCESS")) => n.drop(2).toInt
    }
    val all = manifests ++ snapshots
    if (all.isEmpty) None
    else {
      val v = all.max
      commitPointer(spark, storeDir, v) // heal the pointer for later readers
      Some(v)
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
        // allowMissingColumns: a store's schema may GROW across writers
        // (a dump-ingested snapshot later caught up by the sequenced
        // path, whose rows carry `seq`); carried rows surface the new
        // column as null
        read(spark, storeDir)
          .join(broadcast(keyDf), keys, "left_anti")
          .unionByName(batch, allowMissingColumns = true)
    }
    merged.write.mode("overwrite").parquet(s"$storeDir/v=$next")
    commitPointer(spark, storeDir, next)
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

  // ---- layout-agnostic facade -------------------------------------------

  /** Whether the live version was committed by [[upsertBucketed]] (a
    * manifest exists for it) rather than as a plain snapshot.
    */
  def isBucketed(spark: SparkSession, storeDir: String, v: Int): Boolean =
    fs(spark, storeDir).exists(new Path(storeDir, s"manifest-v$v.json"))

  /** The live table regardless of which layout committed it — lets a
    * store bulk-loaded as snapshots (the dump-ingest path) be read by the
    * same consumers as a bucketed catch-up store.
    */
  def readAuto(spark: SparkSession, storeDir: String): DataFrame = {
    val v = currentVersion(spark, storeDir).getOrElse(
      throw new IllegalStateException(s"$storeDir: no committed store version"))
    if (isBucketed(spark, storeDir, v)) readBucketed(spark, storeDir)
    else spark.read.parquet(s"$storeDir/v=$v")
  }

  /** Upsert that follows the store's existing layout (a snapshot store
    * stays snapshot, a bucketed store stays bucketed); a NEW store starts
    * bucketed — the 100 TB default. One store must never mix layouts: the
    * version counter is shared, so a bucketed upsert onto a snapshot store
    * would read an empty manifest and silently drop the loaded rows.
    */
  def upsertAuto(spark: SparkSession, storeDir: String, batch: DataFrame,
      keys: Seq[String], numBuckets: Int = 64): Int =
    currentVersion(spark, storeDir) match {
      case Some(v) if !isBucketed(spark, storeDir, v) =>
        upsert(spark, storeDir, batch, keys)
      case _ => upsertBucketed(spark, storeDir, batch, keys, numBuckets)
    }

  // ---- bucketed layout --------------------------------------------------

  /** Single-step atomic pointer swap: tmp write + rename-with-OVERWRITE
    * (FileContext — one atomic operation on HDFS and the local fs alike).
    * No delete-then-rename window, so no state in which the pointer is
    * missing mid-commit; [[recoverVersion]] covers pre-existing stores
    * written by the old two-step swap or exotic filesystems.
    */
  private[graft] def commitPointer(spark: SparkSession, storeDir: String, next: Int): Unit = {
    val f = fs(spark, storeDir)
    val tmp = new Path(storeDir, "current.tmp")
    val out = f.create(tmp, true)
    try out.write(next.toString.getBytes(UTF_8))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      f.getUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(fc.makeQualified(tmp),
      fc.makeQualified(new Path(storeDir, "current")),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  // ---- bucket-layout metadata --------------------------------------------

  /** Bucket layout pinned at store creation. Two writers hashing the same
    * key with different bucket counts (or differently-ordered bucket
    * columns) would keep the same id live in two buckets — so the layout
    * is store state, not a per-call argument.
    */
  private[graft] case class BucketMeta(numBuckets: Int, bucketBy: Seq[String])

  private[graft] def readBucketMeta(spark: SparkSession,
      storeDir: String): Option[BucketMeta] = {
    val f = fs(spark, storeDir)
    val p = new Path(storeDir, "meta.json")
    if (!f.exists(p)) return None
    val in = f.open(p)
    val txt = try new String(in.readAllBytes(), UTF_8) finally in.close()
    val nb = "\"numBuckets\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt)
    val by = "\"bucketBy\"\\s*:\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
      .split(',').map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
    nb.map(BucketMeta(_, by))
  }

  private def writeBucketMeta(spark: SparkSession, storeDir: String,
      m: BucketMeta): Unit = {
    val f = fs(spark, storeDir)
    val body = s"""{"numBuckets":${m.numBuckets},"bucketBy":[${
      m.bucketBy.map("\"" + _ + "\"").mkString(",")}]}"""
    val tmp = new Path(storeDir, "meta.json.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(UTF_8)) finally out.close()
    if (!f.rename(tmp, new Path(storeDir, "meta.json")))
      throw new java.io.IOException(s"$storeDir: meta commit failed")
  }

  /** Effective (numBuckets, bucket columns): the pinned meta when present
    * — the caller's arguments only apply to a store that does not exist
    * yet (or one created before meta pinning, which keeps its first
    * writer's layout from here on).
    */
  private def resolveBuckets(spark: SparkSession, storeDir: String,
      numBuckets: Int, bucketBy: Seq[String],
      keys: Seq[String]): (Int, Seq[String]) =
    readBucketMeta(spark, storeDir) match {
      case Some(m) =>
        (m.numBuckets, if (m.bucketBy.nonEmpty) m.bucketBy else keys)
      case None =>
        (numBuckets, if (bucketBy.nonEmpty) bucketBy else keys)
    }

  // ---- manifest ----------------------------------------------------------

  /** bucket id → live BASE version for store version `v`. */
  def readManifest(spark: SparkSession, storeDir: String, v: Int): Map[Int, Int] = {
    // flat {"<bucket>":<version>,...} — parsed without a JSON dependency;
    // the digits-only key regex skips the "<bucket>#d" delta entries
    "\"(\\d+)\"\\s*:\\s*(\\d+)".r.findAllMatchIn(manifestText(spark, storeDir, v))
      .map(m => m.group(1).toInt -> m.group(2).toInt).toMap
  }

  /** bucket id → pending delta versions (ascending) for store version `v`
    * — the `"<bucket>#d":[dv,…]` entries written by [[appendBucketed]].
    */
  def readDeltas(spark: SparkSession, storeDir: String, v: Int): Map[Int, Seq[Int]] =
    "\"(\\d+)#d\"\\s*:\\s*\\[([\\d,]*)\\]".r
      .findAllMatchIn(manifestText(spark, storeDir, v))
      .map(m => m.group(1).toInt ->
        m.group(2).split(',').filter(_.nonEmpty).map(_.toInt).toSeq)
      .filter(_._2.nonEmpty).toMap

  private def manifestText(spark: SparkSession, storeDir: String, v: Int): String = {
    val f = fs(spark, storeDir)
    val in = f.open(new Path(storeDir, s"manifest-v$v.json"))
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }

  private[graft] def writeManifest(spark: SparkSession, storeDir: String, v: Int,
      m: Map[Int, Int], deltas: Map[Int, Seq[Int]] = Map.empty): Unit = {
    val f = fs(spark, storeDir)
    val base = m.toSeq.sorted.map { case (b, bv) => s""""$b":$bv""" }
    val dEntries = deltas.filter(_._2.nonEmpty).toSeq.sortBy(_._1)
      .map { case (b, ds) => s""""$b#d":[${ds.sorted.mkString(",")}]""" }
    val body = (base ++ dEntries).mkString("{", ",", "}")
    val tmp = new Path(storeDir, s"manifest-v$v.json.tmp")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(UTF_8))
    finally out.close()
    if (!f.rename(tmp, new Path(storeDir, s"manifest-v$v.json")))
      throw new java.io.IOException(s"$storeDir: manifest commit failed")
  }

  /** Every live directory (base + deltas) of the given buckets. */
  private def bucketPaths(storeDir: String, manifest: Map[Int, Int],
      deltas: Map[Int, Seq[Int]], buckets: Iterable[Int]): Seq[String] =
    buckets.toSeq.sorted.flatMap { b =>
      manifest.get(b).map(bv => s"$storeDir/b=$b/v=$bv").toSeq ++
        deltas.getOrElse(b, Nil).sorted.map(d => s"$storeDir/b=$b/d=$d")
    }

  /** The live table of a BUCKETED store: one multi-path parquet scan over
    * each bucket's base + pending delta directories.
    */
  def readBucketed(spark: SparkSession, storeDir: String): DataFrame = {
    val v = currentVersion(spark, storeDir).getOrElse(
      throw new IllegalStateException(s"$storeDir: no committed store version"))
    val manifest = readManifest(spark, storeDir, v)
    val deltas = readDeltas(spark, storeDir, v)
    val paths = bucketPaths(storeDir, manifest, deltas,
      manifest.keySet ++ deltas.keySet)
    spark.read.parquet(paths: _*)
  }

  /** Bucket-pruned point lookup: reads ONLY the buckets that can contain
    * the given keys (the store analog of the reference UpdateStore's
    * `nodes(Set<Long> ids)` KV gets). `keyDf` columns must match the
    * upsert `keys` in name, order and type — the bucket id is the same
    * `pmod(hash(keys), numBuckets)` the writer used, computed engine-side
    * so the hash function is identical by construction. At 100 TB a
    * minutely diff touches a handful of buckets; everything else is never
    * opened. Returns None for an empty/untouched store.
    */
  def readBucketsFor(spark: SparkSession, storeDir: String, keyDf: DataFrame,
      keys: Seq[String], numBuckets: Int = 64,
      bucketBy: Seq[String] = Seq.empty): Option[DataFrame] =
    currentVersion(spark, storeDir).flatMap { v =>
      val (nb, bCols) = resolveBuckets(spark, storeDir, numBuckets, bucketBy, keys)
      val touched = keyDf
        .select(pmod(hash(bCols.map(col): _*), lit(nb)).as("_b"))
        .distinct().collect().map(_.getInt(0)).toSet
      val manifest = readManifest(spark, storeDir, v).filter(t => touched(t._1))
      val deltas = readDeltas(spark, storeDir, v).filter(t => touched(t._1))
      val paths = bucketPaths(storeDir, manifest, deltas,
        manifest.keySet ++ deltas.keySet)
      if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
    }

  /** Bucket-pruned upsert: only batch-touched buckets are read, merged
    * (broadcast anti-join, latest-wins) and rewritten; the new manifest
    * carries every untouched bucket's entry forward unchanged. Commit
    * order: bucket data → manifest → pointer (the single commit point) —
    * a crash leaves the previous version live and the re-run deletes and
    * rewrites the orphan bucket dirs (idempotent).
    */
  /** @param bucketBy optional bucket-defining column subset (default: the
    *                  identity `keys`). A PROPER subset lets readers prune
    *                  on a lookup key coarser than row identity (e.g. LSH
    *                  (band, bkey) buckets holding many doc rows each) —
    *                  but then a row whose bucketBy VALUES change between
    *                  upserts lands in a new bucket while the stale copy
    *                  in the old bucket goes undetected, so proper-subset
    *                  stores are append-only-or-immutable by contract
    *                  (cf. the IvfIndex locator for the mutable case).
    */
  def upsertBucketed(spark: SparkSession, storeDir: String, batch: DataFrame,
      keys: Seq[String], numBuckets: Int = 64,
      bucketBy: Seq[String] = Seq.empty): Int = {
    require(numBuckets > 0, "numBuckets must be positive")
    require(bucketBy.isEmpty || bucketBy.forall(keys.contains),
      "bucketBy must be a subset of keys")
    val f = fs(spark, storeDir)
    f.mkdirs(new Path(storeDir))
    val prev = currentVersion(spark, storeDir)
    val (nb, bCols) = resolveBuckets(spark, storeDir, numBuckets, bucketBy, keys)
    if (readBucketMeta(spark, storeDir).isEmpty)
      writeBucketMeta(spark, storeDir, BucketMeta(nb,
        if (bucketBy.nonEmpty) bucketBy else Seq.empty))
    val next = prev.getOrElse(0) + 1
    val bCol = pmod(hash(bCols.map(col): _*), lit(nb))
    val batchB = batch.withColumn("_b", bCol)
    val prevManifest = prev.map(readManifest(spark, storeDir, _)).getOrElse(Map.empty)
    val prevDeltas = prev.map(readDeltas(spark, storeDir, _)).getOrElse(Map.empty)
    // the touched-bucket set exists only to scope the merge read; a NEW
    // store has nothing to merge, so skip the collect job entirely (r14 —
    // every store lifecycle pays this on its initial build)
    val touched =
      if (prevManifest.isEmpty && prevDeltas.isEmpty) Set.empty[Int]
      else batchB.select("_b").distinct().collect().map(_.getInt(0)).toSet

    val merged = {
      // base + pending deltas of every touched bucket fold into the new
      // base (an upsert is the layout's compaction moment for its buckets)
      val livePaths = bucketPaths(storeDir,
        prevManifest.filter(t => touched(t._1)),
        prevDeltas.filter(t => touched(t._1)),
        touched.filter(b => prevManifest.contains(b) || prevDeltas.contains(b)))
      if (livePaths.isEmpty) batchB
      else {
        val keyDf = batch.select(keys.map(col): _*).distinct()
        spark.read.parquet(livePaths: _*)
          .join(broadcast(keyDf), keys, "left_anti")
          .withColumn("_b", bCol)
          .unionByName(batchB, allowMissingColumns = true)
      }
    }
    val written = stageAndInstall(spark, storeDir, merged, nb, next, "v")

    writeManifest(spark, storeDir, next,
      prevManifest ++ written.map(_ -> next).toMap,
      prevDeltas -- written)
    commitPointer(spark, storeDir, next)
    gcBucketed(spark, storeDir, prev, written.toSet,
      written.map(_ -> next).toMap, Map.empty)
    next
  }

  /** Appends a batch as per-bucket DELTA files without reading or
    * rewriting ANY existing bucket data — O(batch) I/O even when the
    * batch hashes into every bucket (the LSH-index daily-append case,
    * where a read-merge-rewrite upsert would rewrite the whole
    * accumulated store). Only for append-only row sets: delta rows are
    * unioned at read time, never key-merged, so a key that repeats
    * across appends would surface twice — latest-wins writers must use
    * [[upsertBucketed]] (which folds pending deltas for the buckets it
    * touches). [[compactBucketed]] bounds the per-bucket file fan-in.
    * The first write to a new store lands as the base version.
    */
  def appendBucketed(spark: SparkSession, storeDir: String, batch: DataFrame,
      keys: Seq[String], numBuckets: Int = 64,
      bucketBy: Seq[String] = Seq.empty): Int = {
    require(numBuckets > 0, "numBuckets must be positive")
    require(bucketBy.isEmpty || bucketBy.forall(keys.contains),
      "bucketBy must be a subset of keys")
    val prev = currentVersion(spark, storeDir)
    if (prev.isEmpty)
      return upsertBucketed(spark, storeDir, batch, keys, numBuckets, bucketBy)
    val (nb, bCols) = resolveBuckets(spark, storeDir, numBuckets, bucketBy, keys)
    if (readBucketMeta(spark, storeDir).isEmpty)
      writeBucketMeta(spark, storeDir, BucketMeta(nb,
        if (bucketBy.nonEmpty) bucketBy else Seq.empty))
    val next = prev.get + 1
    val batchB = batch.withColumn("_b", pmod(hash(bCols.map(col): _*), lit(nb)))
    val written = stageAndInstall(spark, storeDir, batchB, nb, next, "d")

    val prevManifest = readManifest(spark, storeDir, prev.get)
    val prevDeltas = readDeltas(spark, storeDir, prev.get)
    val newDeltas = prevDeltas ++ written.map(b =>
      b -> (prevDeltas.getOrElse(b, Seq.empty) :+ next))
    writeManifest(spark, storeDir, next, prevManifest, newDeltas)
    commitPointer(spark, storeDir, next)
    gcBucketed(spark, storeDir, prev, written.toSet, Map.empty,
      written.map(b => b -> newDeltas(b)).toMap)
    next
  }

  /** Folds base + pending deltas into a fresh base for every bucket with
    * at least `minDeltas` deltas — the periodic maintenance keeping read
    * fan-in bounded while appends stay O(batch). Untouched buckets carry
    * forward byte-for-byte. Rows are unioned (append-only contract), so
    * a compacted store reads identically to the uncompacted one. Returns
    * the committed version — unchanged if no bucket met the threshold.
    */
  def compactBucketed(spark: SparkSession, storeDir: String,
      minDeltas: Int = 4): Int = {
    val prev = currentVersion(spark, storeDir).getOrElse(
      throw new IllegalStateException(s"$storeDir: no committed store version"))
    val manifest = readManifest(spark, storeDir, prev)
    val deltas = readDeltas(spark, storeDir, prev)
    val toCompact = deltas.filter(_._2.size >= minDeltas).keySet
    if (toCompact.isEmpty) return prev
    val next = prev + 1
    // per-bucket reads tagged with their bucket id: no re-hash needed (and
    // none possible — bucketBy columns may be a derived subset), and the
    // union is k bucket-scoped scans, k = buckets being compacted
    val merged = toCompact.toSeq.sorted.map { b =>
      spark.read.parquet(bucketPaths(storeDir, manifest, deltas, Seq(b)): _*)
        .withColumn("_b", lit(b))
    }.reduce(_.unionByName(_))
    val written = stageAndInstall(spark, storeDir, merged, toCompact.size, next, "v")

    writeManifest(spark, storeDir, next,
      manifest ++ written.map(_ -> next).toMap,
      deltas -- written)
    commitPointer(spark, storeDir, next)
    gcBucketed(spark, storeDir, Some(prev), written.toSet,
      written.map(_ -> next).toMap, Map.empty)
    next
  }

  /** Stages `df` (carrying `_b`) partitioned by bucket and installs each
    * written bucket dir as `b=<i>/<kind>=<next>` (delete-then-rename: a
    * crashed previous attempt may have left the target behind). Returns
    * the written bucket ids.
    */
  private def stageAndInstall(spark: SparkSession, storeDir: String,
      df: DataFrame, nb: Int, next: Int, kind: String): Seq[Int] = {
    val f = fs(spark, storeDir)
    val staging = s"$storeDir/stage-v$next"
    // cluster by bucket before the partitioned write: without it every
    // input task emits a file into every bucket dir (tasks × buckets small
    // files — at 64 buckets the store read cost is file-open dominated).
    // One task per bucket hash is the right write parallelism for a
    // bucketed store at any scale: buckets are the unit of rewrite.
    df.repartition(nb.max(1), col("_b"))
      .write.mode("overwrite").partitionBy("_b").parquet(staging)
    val written = f.listStatus(new Path(staging))
      .map(_.getPath.getName).filter(_.startsWith("_b="))
      .map(_.stripPrefix("_b=").toInt).toSeq
    written.foreach { b =>
      val target = new Path(s"$storeDir/b=$b/$kind=$next")
      f.mkdirs(target.getParent)
      if (f.exists(target)) f.delete(target, true)
      if (!f.rename(new Path(s"$staging/_b=$b"), target))
        throw new java.io.IOException(s"$storeDir: bucket $b install failed")
    }
    f.delete(new Path(staging), true)
    written
  }

  /** GC after a commit: inside every bucket the new version touched,
    * delete `v=`/`d=` dirs referenced by neither the PREVIOUS manifest
    * (which stays readable for mid-flight readers) nor the new one; then
    * drop manifests older than prev. `newBase`/`newDeltas` describe what
    * the just-committed manifest references for the touched buckets.
    */
  private def gcBucketed(spark: SparkSession, storeDir: String,
      prev: Option[Int], buckets: Set[Int], newBase: Map[Int, Int],
      newDeltas: Map[Int, Seq[Int]]): Unit = prev.foreach { p =>
    val f = fs(spark, storeDir)
    val prevManifest = readManifest(spark, storeDir, p)
    val prevDeltas = readDeltas(spark, storeDir, p)
    buckets.foreach { b =>
      val keepV = prevManifest.get(b).toSet ++ newBase.get(b)
      val keepD = prevDeltas.getOrElse(b, Seq.empty).toSet ++
        newDeltas.getOrElse(b, Seq.empty)
      f.listStatus(new Path(s"$storeDir/b=$b")).foreach { st =>
        val n = st.getPath.getName
        val stale =
          (n.startsWith("v=") && n.drop(2).forall(_.isDigit) &&
            !keepV(n.drop(2).toInt)) ||
          (n.startsWith("d=") && n.drop(2).forall(_.isDigit) &&
            !keepD(n.drop(2).toInt))
        if (stale) f.delete(st.getPath, true)
      }
    }
    f.listStatus(new Path(storeDir)).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("manifest-v") && n.endsWith(".json") &&
        n.stripPrefix("manifest-v").stripSuffix(".json").forall(_.isDigit) &&
        n.stripPrefix("manifest-v").stripSuffix(".json").toInt < p)
        f.delete(st.getPath, false)
    }
  }
}
