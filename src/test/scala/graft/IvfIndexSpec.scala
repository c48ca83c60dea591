package graft

import graft.operators.{Ann, IvfIndex}
import graft.sources.ChangesetStore
import org.apache.spark.sql.functions._

/** Persisted IVF index: build once, probe from the artifact alone
  * (corpus deleted between probes), versioned rebuilds behind the atomic
  * pointer, and parity with the inline `ann_ivf` operator.
  */
class IvfIndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("q_id", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        math.round(r.getDouble(4) * 1e9))).toSeq

  private def corpusAndQueries() = {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    (e.filter(col("vec_id") >= 8).select("vec_id", "embedding"),
      e.filter(col("vec_id") < 8).select("vec_id", "embedding"))
  }

  private def fixedCentroids() =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") >= 8 && col("vec_id") < 16)
      .select("vec_id", "embedding").collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

  test("build once, probe twice — the second probe reads ONLY the artifact") {
    val (corpus, queries) = corpusAndQueries()
    // stage the corpus as its own table so it can be deleted after build
    val corpusDir = tmp("graft-ivf-corpus")
    corpus.write.mode("overwrite").parquet(s"$corpusDir/emb")
    val staged = spark.read.parquet(s"$corpusDir/emb")

    val idx = tmp("graft-ivf-idx")
    assert(IvfIndex.build(spark, staged, fixedCentroids(), idx) === 1)

    val first = rows(IvfIndex.probe(spark, idx, queries))
    assert(first.nonEmpty)

    // delete the corpus: a probe that secretly re-read it would now fail
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(corpusDir))
    val second = rows(IvfIndex.probe(spark, idx, queries))
    assert(second === first)
  }

  test("probe serves byte-identical results to the inline ann_ivf") {
    val (corpus, queries) = corpusAndQueries()
    val idx = tmp("graft-ivf-idx2")
    IvfIndex.build(spark, corpus, fixedCentroids(), idx)
    assert(rows(IvfIndex.probe(spark, idx, queries)) ===
      rows(Ann.queries("ann_ivf")(spark, sf)))
  }

  test("rebuild commits a new version; the pointer swap is atomic") {
    val (corpus, queries) = corpusAndQueries()
    val idx = tmp("graft-ivf-idx3")
    IvfIndex.build(spark, corpus, fixedCentroids(), idx)
    val v1 = rows(IvfIndex.probe(spark, idx, queries))

    // retrain with a different codebook (first 4 centroids only): the
    // rebuild must land as v=2 and change what probes see
    assert(IvfIndex.build(spark, corpus, fixedCentroids().take(4), idx) === 2)
    assert(ChangesetStore.currentVersion(spark, idx) === Some(2))
    val v2 = rows(IvfIndex.probe(spark, idx, queries))
    assert(v2.forall(_._4 < 12), "probes must hit the 4-centroid codebook")
    assert(v2 !== v1)
  }

  test("lost pointer recovers from the _SUCCESS marker") {
    val (corpus, queries) = corpusAndQueries()
    val idx = tmp("graft-ivf-idx4")
    IvfIndex.build(spark, corpus, fixedCentroids(), idx)
    val before = rows(IvfIndex.probe(spark, idx, queries))
    java.nio.file.Files.delete(java.nio.file.Paths.get(idx, "current"))
    assert(rows(IvfIndex.probe(spark, idx, queries)) === before)
  }

  test("trained codebook: kmeansRounds output feeds the build directly") {
    val (corpus, queries) = corpusAndQueries()
    val trained = Ann.kmeansRounds(corpus, fixedCentroids().take(4), rounds = 2)
    val idx = tmp("graft-ivf-idx5")
    IvfIndex.build(spark, corpus, trained, idx)
    val out = rows(IvfIndex.probe(spark, idx, queries, nprobe = 2, k = 3))
    // every query answered with a full top-3 from the trained cells
    assert(out.map(_._1).distinct.size === 8)
    assert(out.groupBy(_._1).values.forall(_.map(_._3).sorted == Seq(1, 2, 3)))
  }
}
