package graft.operators

import graft.sources.ChangesetStore
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF-Flat index — the offline artifact behind [[Ann.annIvf]]'s
  * inline shape. A production ANN deployment builds the index ONCE (train
  * centroids, assign every corpus vector to its nearest-centroid cell) and
  * then serves every query from the artifact alone; the corpus is never
  * re-read or re-assigned at probe time. The reference's analog is the
  * offline spatial grid its country lookups probe (grid built once,
  * shipped as a file, queried forever).
  *
  * Layout (the [[graft.sources.ChangesetStore]] commit discipline —
  * versioned immutable artifacts behind one atomically-swapped pointer,
  * recovery via the `v=N/_SUCCESS` marker):
  *
  *  - `v=N/centroids/` — K rows (cid, embedding, n2): the trained
  *    codebook, broadcast-scale by construction.
  *  - `v=N/cells/cell=C/` — corpus assignments PARTITIONED BY CELL
  *    (vec_id, embedding, n2): a probe opens only its `nprobe` cell
  *    directories — directory-level pruning, the on-disk form of the
  *    map-only cell argmax.
  *  - `v=N/_SUCCESS` + `current` — marker then pointer; a crash between
  *    them leaves the previous version live ([[ChangesetStore.currentVersion]]
  *    recovers committed-but-unpointered versions).
  *
  * Scale: the build is one corpus scan (centroids inlined as literals —
  * assignment is pure map work, no shuffle) plus one cell-partitioned
  * write. A probe reads K centroid rows + the probed cells' directories;
  * cost is O(corpus/K · nprobe) I/O regardless of corpus size.
  */
object IvfIndex {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Adds the fixed-point squared norm to any (vec_id, embedding) frame. */
  private def withN2(df: DataFrame): DataFrame = {
    graft.functions.GeoFunctions.register(df.sparkSession)
    df.withColumn("n2", Ann.dotDec(col("embedding"), col("embedding")))
  }

  /** Builds and commits one index version from the corpus: nearest-cosine
    * cell per vector (map-only argmax over inlined centroid literals),
    * written partitioned by cell, plus the centroid codebook. Returns the
    * committed version.
    */
  def build(spark: SparkSession, corpus: DataFrame,
      centroids: Seq[(Long, Seq[Float])], indexDir: String): Int = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val f = fs(spark, indexDir)
    f.mkdirs(new Path(indexDir))
    val next = ChangesetStore.currentVersion(spark, indexDir).getOrElse(0) + 1
    val vDir = s"$indexDir/v=$next"
    if (f.exists(new Path(vDir))) f.delete(new Path(vDir), true) // crashed attempt

    val cents = centroids.map { case (cid, v) => (cid, v, Ann.n2Of(v)) }.toArray
    val assigned = withN2(corpus.select("vec_id", "embedding"))
      .withColumn("cell",
        -array_max(Ann.cellScores(cents)(col("embedding"), col("n2"))).getField("nid"))
      .select("cell", "vec_id", "embedding", "n2")
    assigned.write.partitionBy("cell").parquet(s"$vDir/cells")

    import spark.implicits._
    centroids.toDF("cid", "embedding")
      .coalesce(1).write.parquet(s"$vDir/centroids")

    // marker then pointer — the ChangesetStore snapshot commit order
    f.create(new Path(vDir, "_SUCCESS"), true).close()
    ChangesetStore.commitPointer(spark, indexDir, next)
    next
  }

  /** The live codebook: K rows, collected driver-side (an index probe's
    * first step everywhere — K is broadcast-scale by construction).
    */
  def centroids(spark: SparkSession, indexDir: String): Array[(Long, Seq[Float], Long)] = {
    val v = ChangesetStore.currentVersion(spark, indexDir).getOrElse(
      throw new IllegalStateException(s"$indexDir: no committed index version"))
    spark.read.parquet(s"$indexDir/v=$v/centroids")
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getSeq[Float](1), Ann.n2Of(r.getSeq[Float](1))))
  }

  /** Serves top-`k` neighbors per query FROM THE ARTIFACT ALONE: queries
    * score the codebook map-side, explode into their `nprobe` best cells,
    * and only those cells' directories are opened (basePath keeps the
    * `cell` partition column); exact cosine rerank inside the probed
    * cells. The corpus table is not an input — build once, probe forever.
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
    // tiny collect, and only those directories are ever opened
    val touched = probes.select("cell").distinct().collect().map(_.getLong(0))
    val cellsDir = s"$indexDir/v=$v/cells"
    val f = fs(spark, indexDir)
    val paths = touched.sorted.map(c => s"$cellsDir/cell=$c")
      .filter(p => f.exists(new Path(p)))
    if (paths.isEmpty)
      return probes.select(col("q_id"), col("q_id").as("n_id"),
        lit(0).as("rnk"), col("cell"), lit(0.0).as("cos")).limit(0)

    // the partition column comes back from directory names as INT; the
    // inline path (and the oracle) carry BIGINT cells
    spark.read.option("basePath", cellsDir).parquet(paths: _*)
      .select(col("cell").cast("long").as("cell"), col("vec_id").as("n_id"),
        col("embedding").as("ne"), col("n2").as("nn2"))
      .join(broadcast(probes), Seq("cell"))
      .withColumn("cos",
        Ann.cosine(Ann.dotDec(col("qe"), col("ne")), col("qn2"), col("nn2")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy(desc("cos"), col("n_id"))))
      .filter(col("rnk") <= k)
      .select("q_id", "n_id", "rnk", "cell", "cos")
  }

  /** Driver-checked key `ann_ivf_store`: build the index artifact once
    * (fixed vec_id 8..15 centroids — the [[Ann.annIvf]] codebook, so the
    * persisted path provably reproduces the inline path), then serve the
    * queries from the artifact. Same oracle as `ann_ivf`.
    */
  def annIvfStore(s: SparkSession, dir: String): DataFrame = {
    val e = Ann.withNorm(s, dir)
    val cents = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
      .select("vec_id", "embedding").collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-idx").toString
    build(s, e.filter(col("vec_id") >= 8).select("vec_id", "embedding"), cents, idx)
    probe(s, idx, e.filter(col("vec_id") < 8).select("vec_id", "embedding"))
  }
}
