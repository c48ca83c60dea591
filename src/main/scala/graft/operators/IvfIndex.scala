package graft.operators

import graft.sources.ChangesetStore
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF-Flat index — the offline artifact behind [[Ann.annIvf]]'s
  * inline shape. A production ANN deployment builds the index ONCE (train
  * centroids, assign every corpus vector to its nearest-centroid cell),
  * APPENDS daily embedding batches without ever re-reading the corpus,
  * and serves every query from the artifact alone. The reference's analog
  * is the offline spatial grid its country lookups probe (grid built
  * once, shipped as a file, queried forever).
  *
  * Layout — the [[graft.sources.ChangesetStore]] bucketed commit
  * discipline with CELL-DEFINED buckets (content-defined, not key-hash,
  * so probes prune by cell at the directory level):
  *
  *  - `centroids-v<N>/` — K rows (cid, embedding): the codebook for
  *    version N, broadcast-scale by construction.
  *  - `cells/c=<cell>/v=<vi>/` — per-cell immutable assignment artifacts
  *    (cell, vec_id, embedding, n2).
  *  - `manifest-v<N>.json` — cell → live artifact version (the
  *    ChangesetStore manifest format, so its pointer recovery reads this
  *    store unchanged); written via tmp + atomic rename AFTER the data.
  *  - `current` — atomically-swapped pointer, the single commit point.
  *
  * Scale: a build is one corpus scan (centroids inlined as literals —
  * assignment is pure map work, no shuffle) plus one cell-partitioned
  * write. An APPEND touches only the cells the batch lands in: those
  * cells merge batch + live rows (latest-wins by vec_id) into new `v=`
  * dirs; every untouched cell's manifest entry carries forward and its
  * files are never opened. A probe reads K centroid rows + the `nprobe`
  * probed cells' directories; cost is O(corpus/K · nprobe) I/O
  * regardless of corpus size.
  */
object IvfIndex {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Adds the fixed-point squared norm to any (vec_id, embedding) frame. */
  private def withN2(df: DataFrame): DataFrame = {
    graft.functions.GeoFunctions.register(df.sparkSession)
    df.withColumn("n2", Ann.dotDec(col("embedding"), col("embedding")))
  }

  /** Nearest-cosine cell per vector — map-only argmax over inlined
    * centroid literals (no shuffle, no join for the corpus side).
    */
  private def assign(vectors: DataFrame,
      cents: Array[(Long, Seq[Float], Long)]): DataFrame =
    withN2(vectors.select("vec_id", "embedding"))
      .withColumn("cell",
        -array_max(Ann.cellScores(cents)(col("embedding"), col("n2"))).getField("nid"))
      .select("cell", "vec_id", "embedding", "n2")

  /** Installs per-cell data + centroids + manifest + pointer as version
    * `next`. `rows` must carry (cell, vec_id, embedding, n2); only its
    * cells are written — `carried` manifest entries survive unchanged.
    */
  private def commit(spark: SparkSession, indexDir: String, next: Int,
      rows: DataFrame, centroids: Seq[(Long, Seq[Float])],
      carried: Map[Int, Int]): Int = {
    val f = fs(spark, indexDir)
    f.mkdirs(new Path(indexDir))
    val staging = s"$indexDir/stage-v$next"
    // _c duplicates cell as the partition key so the data files keep the
    // cell column (partition columns are stripped from the files). Cluster
    // by cell first: without it every task emits a file into every cell
    // dir (tasks x cells small files); one task per cell is the right
    // write parallelism — cells are the unit of rewrite and of probe I/O.
    rows.withColumn("_c", col("cell"))
      .repartition(centroids.size.max(1), col("_c"))
      .write.mode("overwrite").partitionBy("_c").parquet(staging)

    val written = f.listStatus(new Path(staging))
      .map(_.getPath.getName).filter(_.startsWith("_c="))
      .map(_.stripPrefix("_c=").toInt)
    written.foreach { c =>
      val target = new Path(s"$indexDir/cells/c=$c/v=$next")
      f.mkdirs(target.getParent)
      if (f.exists(target)) f.delete(target, true) // crashed previous attempt
      if (!f.rename(new Path(s"$staging/_c=$c"), target))
        throw new java.io.IOException(s"$indexDir: cell $c install failed")
    }
    f.delete(new Path(staging), true)

    import spark.implicits._
    centroids.toDF("cid", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids-v$next")

    ChangesetStore.writeManifest(spark, indexDir, next,
      carried ++ written.map(_ -> next).toMap)
    ChangesetStore.commitPointer(spark, indexDir, next)

    // GC: cell artifacts referenced by neither the new nor the previous
    // manifest (readers mid-flight on prev stay safe), plus manifests and
    // codebooks older than prev
    if (next > 1) {
      val prev = next - 1
      val keep = ChangesetStore.readManifest(spark, indexDir, prev).toSet ++
        carried ++ written.map(_ -> next)
      written.foreach { c =>
        val dir = new Path(s"$indexDir/cells/c=$c")
        f.listStatus(dir).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith("v=") && n.drop(2).forall(_.isDigit) &&
            !keep((c, n.drop(2).toInt)))
            f.delete(st.getPath, true)
        }
      }
      f.listStatus(new Path(indexDir)).foreach { st =>
        val n = st.getPath.getName
        val stale =
          (n.startsWith("manifest-v") && n.endsWith(".json") &&
            n.stripPrefix("manifest-v").stripSuffix(".json").forall(_.isDigit) &&
            n.stripPrefix("manifest-v").stripSuffix(".json").toInt < prev) ||
          (n.startsWith("centroids-v") &&
            n.stripPrefix("centroids-v").forall(_.isDigit) &&
            n.stripPrefix("centroids-v").toInt < prev)
        if (stale) f.delete(st.getPath, true)
      }
    }
    next
  }

  /** The key→cell locator sidecar — a hash-bucketed ChangesetStore of
    * (vec_id, cell). Cell-defined bucketing breaks the key→bucket
    * invariant latest-wins needs (a re-appended vector's NEW embedding can
    * land in a different cell than its old row, which would go stale
    * undetected); the locator answers "which cell holds this key today"
    * with a bucket-pruned point lookup, never a cell scan.
    */
  private def locatorDir(indexDir: String) = s"$indexDir/locator"

  /** Builds and commits a FULL index version from the corpus. Returns the
    * committed version.
    */
  def build(spark: SparkSession, corpus: DataFrame,
      centroids: Seq[(Long, Seq[Float])], indexDir: String,
      locatorBuckets: Int = 64): Int = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val next = ChangesetStore.currentVersion(spark, indexDir).getOrElse(0) + 1
    val cents = centroids.map { case (cid, v) => (cid, v, Ann.n2Of(v)) }.toArray
    // materialized once: consumed by the cell staging write AND the
    // locator upsert (which probes/keys/writes its batch three times)
    val assigned = assign(corpus, cents).localCheckpoint(true)
    // a full (re)build replaces every cell: carry nothing forward
    val committed = commit(spark, indexDir, next, assigned, centroids, Map.empty)
    // locator rebuilt from scratch AFTER the main commit: a crash between
    // the two leaves the previous locator, and re-running the (idempotent)
    // build heals it — same retry contract as every catch-up store here
    val f = fs(spark, indexDir)
    f.delete(new Path(locatorDir(indexDir)), true)
    ChangesetStore.upsertBucketed(spark, locatorDir(indexDir),
      assigned.select("vec_id", "cell"), Seq("vec_id"), locatorBuckets)
    committed
  }

  /** Appends a new vector batch to the live index WITHOUT re-reading the
    * corpus: batch rows are assigned with the live codebook (map-only);
    * the touched-cell set is the batch's landing cells PLUS — via the
    * bucket-pruned locator lookup — the cells currently holding any
    * re-appended key (so a vector whose update moves it across cells is
    * removed from its old cell, not duplicated). Only touched cells are
    * read + merged (latest-wins by vec_id) + rewritten; every other
    * cell's artifact carries forward untouched. The incremental shape of
    * `dedup_incremental`, applied to the ANN index. Returns the committed
    * version.
    */
  def append(spark: SparkSession, batch: DataFrame, indexDir: String,
      locatorBuckets: Int = 64): Int = {
    val v = ChangesetStore.currentVersion(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"$indexDir: append needs a built index"))
    val cents = centroids(spark, indexDir)
    // materialized once: landed-cell collect, merge union, cell staging
    // write, and the locator upsert all consume the assignment
    val assigned = assign(batch, cents).localCheckpoint(true)
    val keyDf = batch.select("vec_id").distinct()

    val manifest = ChangesetStore.readManifest(spark, indexDir, v)
    // the batch is the small side by contract: its touched-cell set is a
    // tiny collect (the dedup_incremental probe shape)
    val landed = assigned.select("cell").distinct().collect()
      .map(_.getLong(0).toInt).toSet
    val priorCells = ChangesetStore
      .readBucketsFor(spark, locatorDir(indexDir), keyDf, Seq("vec_id"), locatorBuckets)
      .map(_.join(broadcast(keyDf), Seq("vec_id"), "left_semi")
        .select("cell").distinct().collect().map(_.getLong(0).toInt).toSet)
      .getOrElse(Set.empty)
    val touched = landed ++ priorCells

    val livePaths = manifest.filter(t => touched(t._1))
      .toSeq.sorted.map { case (c, cv) => s"$indexDir/cells/c=$c/v=$cv" }
    val merged =
      if (livePaths.isEmpty) assigned
      else
        spark.read.parquet(livePaths: _*)
          .join(broadcast(keyDf), Seq("vec_id"), "left_anti")
          .select("cell", "vec_id", "embedding", "n2")
          .unionByName(assigned)
    val committed = commit(spark, indexDir, v + 1, merged,
      cents.map { case (cid, vec, _) => (cid, vec) }.toSeq,
      manifest.filter(t => !touched(t._1)))
    ChangesetStore.upsertBucketed(spark, locatorDir(indexDir),
      assigned.select("vec_id", "cell"), Seq("vec_id"), locatorBuckets)
    committed
  }

  /** The live codebook: K rows, collected driver-side (an index probe's
    * first step everywhere — K is broadcast-scale by construction).
    */
  def centroids(spark: SparkSession, indexDir: String): Array[(Long, Seq[Float], Long)] = {
    val v = ChangesetStore.currentVersion(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"$indexDir: no committed index version"))
    spark.read.parquet(s"$indexDir/centroids-v$v")
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getSeq[Float](1), Ann.n2Of(r.getSeq[Float](1))))
  }

  /** Serves top-`k` neighbors per query FROM THE ARTIFACT ALONE: queries
    * score the codebook map-side, explode into their `nprobe` best cells,
    * and only those cells' live directories are opened (manifest lookup —
    * directory-level pruning); exact cosine rerank inside the probed
    * cells. The corpus table is not an input — build once, append daily,
    * probe forever.
    *
    * @param queries frame with (vec_id, embedding)
    */
  def probe(spark: SparkSession, indexDir: String, queries: DataFrame,
      nprobe: Int = 2, k: Int = 3): DataFrame = {
    val v = ChangesetStore.currentVersion(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"$indexDir: no committed index version"))
    val cents = centroids(spark, indexDir)
    val probes = withN2(queries.select("vec_id", "embedding"))
      .withColumn("probe", explode(
        slice(reverse(sort_array(Ann.cellScores(cents)(col("embedding"), col("n2")))), 1, nprobe)))
      .select((-col("probe.nid")).as("cell"), col("vec_id").as("q_id"),
        col("embedding").as("qe"), col("n2").as("qn2"))

    // queries are the small side by contract: the touched-cell set is a
    // tiny collect, and only those cells' live artifacts are ever opened
    val touched = probes.select("cell").distinct().collect()
      .map(_.getLong(0).toInt).toSet
    val manifest = ChangesetStore.readManifest(spark, indexDir, v)
    val paths = manifest.filter(t => touched(t._1))
      .toSeq.sorted.map { case (c, cv) => s"$indexDir/cells/c=$c/v=$cv" }
    if (paths.isEmpty)
      return probes.select(col("q_id"), col("q_id").as("n_id"),
        lit(0).as("rnk"), col("cell"), lit(0.0).as("cos")).limit(0)

    spark.read.parquet(paths: _*)
      .select(col("cell"), col("vec_id").as("n_id"),
        col("embedding").as("ne"), col("n2").as("nn2"))
      .join(broadcast(probes), Seq("cell"))
      .withColumn("cos",
        Ann.cosine(Ann.dotDec(col("qe"), col("ne")), col("qn2"), col("nn2")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos"), col("n_id"))))
      .filter(col("rnk") <= k)
      .select("q_id", "n_id", "rnk", "cell", "cos")
  }

  /** Driver-checked key `ann_ivf_store`: build the index artifact ONCE
    * from most of the corpus, [[append]] the remainder as an incremental
    * batch (fixed vec_id 8..15 centroids — the [[Ann.annIvf]] codebook),
    * then serve the queries from the artifact. Build + append must be
    * indistinguishable from a one-shot build, so this shares the
    * `ann_ivf` oracle verbatim.
    */
  def annIvfStore(s: SparkSession, dir: String): DataFrame = {
    val e = Ann.withNorm(s, dir)
    val cents = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      .select("vec_id", "embedding").collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString
    val corpus = e.filter(col("vec_id") >= 8).select("vec_id", "embedding")
    // locator buckets sized to the corpus: the 64-bucket default is the
    // 100 TB layout; at driver-check scale it is pure small-file overhead
    build(s, corpus.filter(col("vec_id") % 5 =!= 0), cents, idx, locatorBuckets = 8)
    append(s, corpus.filter(col("vec_id") % 5 === 0), idx, locatorBuckets = 8)
    probe(s, idx, e.filter(col("vec_id") < 8).select("vec_id", "embedding"))
  }
}
