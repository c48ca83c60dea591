package graft

import graft.sources.ChangesetStore
import org.apache.spark.sql.functions._

/** Versioned-snapshot upsert store lifecycle (ChangesetDB.java analog). */
class ChangesetStoreSpec extends SparkSpec {

  test("upsert: initial load, latest-wins refresh, version GC, crash-resume") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cs-spec").toString

    val b1 = Seq((1L, 0L, 10L), (2L, 0L, 20L), (3L, 0L, 30L))
      .toDF("user_id", "cs_seq", "closed_at")
    assert(ChangesetStore.upsert(spark, dir, b1, Seq("user_id", "cs_seq")) === 1)
    assert(ChangesetStore.currentVersion(spark, dir) === Some(1))

    // refresh: user 2's session extends, user 4 appears
    val b2 = Seq((2L, 0L, 25L), (4L, 0L, 40L))
      .toDF("user_id", "cs_seq", "closed_at")
    assert(ChangesetStore.upsert(spark, dir, b2, Seq("user_id", "cs_seq")) === 2)
    val rows = ChangesetStore.read(spark, dir)
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.toSeq === Seq((1L, 10L), (2L, 25L), (3L, 30L), (4L, 40L)))

    // third upsert GCs v=1 (keeps the previous snapshot only)
    assert(ChangesetStore.upsert(spark, dir,
      Seq((5L, 0L, 50L)).toDF("user_id", "cs_seq", "closed_at"),
      Seq("user_id", "cs_seq")) === 3)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "v=1")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "v=2")))

    // crash simulation: an orphan v=4 exists but the pointer still says 3 —
    // readers see 3, and the next upsert overwrites the orphan and commits 4
    val orphan = s"$dir/v=4"
    Seq((9L, 9L, 99L)).toDF("user_id", "cs_seq", "closed_at")
      .write.mode("overwrite").parquet(orphan)
    assert(ChangesetStore.currentVersion(spark, dir) === Some(3))
    assert(!ChangesetStore.read(spark, dir).collect().exists(_.getLong(0) == 9L))
    assert(ChangesetStore.upsert(spark, dir,
      Seq((6L, 0L, 60L)).toDF("user_id", "cs_seq", "closed_at"),
      Seq("user_id", "cs_seq")) === 4)
    val after = ChangesetStore.read(spark, dir).select("user_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after === Seq(1L, 2L, 3L, 4L, 5L, 6L), "orphan rows must not leak in")
  }

  test("bucketed upsert rewrites only touched buckets; untouched files stay put") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cs-bspec").toString
    val nb = 8

    val b1 = (1L to 20L).map(k => (k, 0L, k * 10)).toDF("user_id", "cs_seq", "closed_at")
    assert(ChangesetStore.upsertBucketed(spark, dir, b1, Seq("user_id", "cs_seq"), nb) === 1)
    val m1 = ChangesetStore.readManifest(spark, dir, 1)
    assert(m1.values.forall(_ === 1))

    // refresh exactly one key → only its bucket (and no other) moves to v2
    val b2 = Seq((7L, 0L, 777L)).toDF("user_id", "cs_seq", "closed_at")
    assert(ChangesetStore.upsertBucketed(spark, dir, b2, Seq("user_id", "cs_seq"), nb) === 2)
    val m2 = ChangesetStore.readManifest(spark, dir, 2)
    val movedBuckets = m2.filter(_._2 == 2).keySet
    assert(movedBuckets.size === 1, s"exactly one bucket should move, got $m2")
    assert(m2.filterNot(t => movedBuckets(t._1)).values.forall(_ === 1),
      "untouched buckets must keep their v1 entries")
    // untouched bucket DIRECTORIES were not rewritten — still only v=1
    m2.keys.filterNot(movedBuckets).foreach { b =>
      val vs = new java.io.File(s"$dir/b=$b").listFiles().map(_.getName).toSet
      assert(vs === Set("v=1"), s"bucket $b must be untouched, has $vs")
    }

    // content: latest-wins for key 7, everything else carried
    val rows = ChangesetStore.readBucketed(spark, dir)
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.toSeq === (1L to 20L).map(k => (k, if (k == 7) 777L else k * 10)))

    // crash immunity: an orphan staged bucket install without a pointer
    // bump is deleted and rewritten by the next upsert
    val orphanBucket = movedBuckets.head
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/b=$orphanBucket/v=3"))
    val b3 = Seq((7L, 0L, 7777L)).toDF("user_id", "cs_seq", "closed_at")
    assert(ChangesetStore.upsertBucketed(spark, dir, b3, Seq("user_id", "cs_seq"), nb) === 3)
    val after = ChangesetStore.readBucketed(spark, dir)
      .filter($"user_id" === 7L).collect()
    assert(after.length === 1 && after.head.getLong(2) === 7777L)
  }

  test("pointer loss recovers the committed store instead of discarding it") {
    import spark.implicits._
    // snapshot layout: kill `current` → recovery scans for the highest
    // v=N/_SUCCESS snapshot and the next upsert still merges, not restarts
    val dir = java.nio.file.Files.createTempDirectory("graft-cs-ptr").toString
    val b1 = Seq((1L, 0L, 10L), (2L, 0L, 20L)).toDF("user_id", "cs_seq", "closed_at")
    assert(ChangesetStore.upsert(spark, dir, b1, Seq("user_id", "cs_seq")) === 1)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "current"))
    assert(ChangesetStore.currentVersion(spark, dir) === Some(1),
      "recovery must find the committed snapshot")
    // the recovery healed the pointer file
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "current")))
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, "current"))
    val b2 = Seq((3L, 0L, 30L)).toDF("user_id", "cs_seq", "closed_at")
    assert(ChangesetStore.upsert(spark, dir, b2, Seq("user_id", "cs_seq")) === 2)
    val users = ChangesetStore.read(spark, dir)
      .select("user_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(users === Seq(1L, 2L, 3L), "upsert after pointer loss must keep old rows")

    // bucketed layout: recovery via the highest committed manifest
    val bdir = java.nio.file.Files.createTempDirectory("graft-cs-bptr").toString
    val bb1 = (1L to 8L).map(k => (k, 0L, k)).toDF("user_id", "cs_seq", "closed_at")
    assert(ChangesetStore.upsertBucketed(spark, bdir, bb1, Seq("user_id", "cs_seq"), 4) === 1)
    java.nio.file.Files.delete(java.nio.file.Paths.get(bdir, "current"))
    assert(ChangesetStore.currentVersion(spark, bdir) === Some(1))
    val bb2 = Seq((9L, 0L, 9L)).toDF("user_id", "cs_seq", "closed_at")
    java.nio.file.Files.delete(java.nio.file.Paths.get(bdir, "current"))
    assert(ChangesetStore.upsertBucketed(spark, bdir, bb2, Seq("user_id", "cs_seq"), 4) === 2)
    assert(ChangesetStore.readBucketed(spark, bdir).count() === 9)
  }

  test("cs_db_enrich equals the one-shot sessionization enrichment") {
    val out = operators.Changesets.csDbEnrich(spark, sfDir)
    val expected = operators.Changesets.csEnrich(spark, sfDir)
      .select("event_id", "user_id", "cs_seq", "created_at", "closed_at", "num_changes")
    assert(out.count() === expected.count())
    val diff = out
      .drop("cs_comments_count")
      .withColumnRenamed("cs_created_at", "created_at")
      .withColumnRenamed("cs_closed_at", "closed_at")
      .withColumnRenamed("cs_num_changes", "num_changes")
      .exceptAll(expected)
    assert(diff.isEmpty, "store-backed enrichment must equal the global rebuild")
  }

  /** Every data file under the store with its size — the byte-audit probe
    * for O(batch) append claims.
    */
  private def dataFiles(dir: String): Map[String, Long] = {
    val root = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Map[String, Long]()
    java.nio.file.Files.walk(root).forEach { p =>
      if (java.nio.file.Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        out(root.relativize(p).toString) = java.nio.file.Files.size(p)
    }
    out.toMap
  }

  test("appendBucketed: O(batch) delta writes, union reads, upsert + compact fold") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cs-delta").toString
    val nb = 4

    // base: 2000 rows spread over every bucket
    val base = (1L to 2000L).map(k => (k, s"v$k")).toDF("id", "value")
    assert(ChangesetStore.upsertBucketed(spark, dir, base, Seq("id"), nb) === 1)
    val before = dataFiles(dir)
    val baseBytes = before.values.sum

    // append 20 rows that hash into (essentially) all buckets
    val batch = (3001L to 3020L).map(k => (k, s"v$k")).toDF("id", "value")
    assert(ChangesetStore.appendBucketed(spark, dir, batch, Seq("id"), nb) === 2)

    // O(batch): every pre-existing file is untouched byte-for-byte, and
    // everything new lives in d= directories totalling a small fraction
    // of the base (parquet per-file overhead dominates 20 rows)
    val after = dataFiles(dir)
    before.foreach { case (p, sz) =>
      assert(after.get(p).contains(sz), s"append must not rewrite base file $p")
    }
    val newFiles = after -- before.keySet
    assert(newFiles.nonEmpty && newFiles.keySet.forall(_.contains("d=")),
      s"append may only add delta files, got ${newFiles.keySet}")
    assert(newFiles.values.sum < baseBytes / 2,
      s"delta bytes ${newFiles.values.sum} must be far below base $baseBytes")

    // reads see base ∪ deltas, full and pruned alike
    assert(ChangesetStore.readBucketed(spark, dir).count() === 2020)
    val got = ChangesetStore.readBucketsFor(spark, dir,
      Seq(3001L, 7L).toDF("id"), Seq("id"), nb).get
    assert(got.filter(col("id") === 3001L).count() === 1)
    assert(got.filter(col("id") === 7L).count() === 1)

    // a latest-wins upsert folds the deltas it touches: the appended key
    // must not survive twice
    val up = Seq((3001L, "NEW")).toDF("id", "value")
    assert(ChangesetStore.upsertBucketed(spark, dir, up, Seq("id"), nb) === 3)
    val r3001 = ChangesetStore.readBucketed(spark, dir)
      .filter(col("id") === 3001L).collect()
    assert(r3001.length === 1 && r3001.head.getString(1) === "NEW")

    // pile up deltas past the threshold, then compact: reads unchanged,
    // delta entries cleared, fan-in back to one dir per bucket
    (1 to 4).foreach { i =>
      val b = Seq((4000L + i, s"d$i")).toDF("id", "value")
      ChangesetStore.appendBucketed(spark, dir, b, Seq("id"), nb)
    }
    val preCompact = ChangesetStore.readBucketed(spark, dir)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val v = ChangesetStore.compactBucketed(spark, dir, minDeltas = 1)
    assert(v > 3, "compaction must commit a new version")
    assert(ChangesetStore.readDeltas(spark, dir, v).isEmpty,
      "compaction must clear the folded delta entries")
    val postCompact = ChangesetStore.readBucketed(spark, dir)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(postCompact === preCompact, "compaction must not change the table")
    // below threshold → no-op
    assert(ChangesetStore.compactBucketed(spark, dir, minDeltas = 1) === v)
  }

  test("bucket meta pins the layout: later writers and readers adopt it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cs-meta").toString
    // creation with 8 buckets pins numBuckets=8
    val b1 = (1L to 100L).map(k => (k, k)).toDF("id", "x")
    ChangesetStore.upsertBucketed(spark, dir, b1, Seq("id"), numBuckets = 8)
    assert(ChangesetStore.readBucketMeta(spark, dir)
      .exists(_.numBuckets === 8))

    // a second writer passing the (wrong) 64-bucket default must adopt 8:
    // the same id keeps hashing into the same bucket
    val b2 = Seq((7L, 777L)).toDF("id", "x")
    ChangesetStore.upsertBucketed(spark, dir, b2, Seq("id"), numBuckets = 64)
    val vs = ChangesetStore.currentVersion(spark, dir).get
    assert(ChangesetStore.readManifest(spark, dir, vs).keySet.forall(_ < 8),
      "adopted layout must keep every bucket id under the pinned count")
    val r7 = ChangesetStore.readBucketed(spark, dir)
      .filter(col("id") === 7L).collect()
    assert(r7.length === 1 && r7.head.getLong(1) === 777L,
      "divergent bucket counts would leave the id live in two buckets")

    // pruned reads with the wrong caller count still find the key
    val got = ChangesetStore.readBucketsFor(spark, dir,
      Seq(7L).toDF("id"), Seq("id"), numBuckets = 64).get
    assert(got.filter(col("id") === 7L).count() === 1)
  }

  test("readBucketsFor: point lookups equal the full read, pruned bucket set") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("graft-rbf").toString
    val rows = (1L to 500L).map(i => (i, s"v$i")).toDF("id", "value")
    ChangesetStore.upsertBucketed(spark, store, rows, Seq("id"), numBuckets = 16)

    val wanted = Seq(3L, 77L, 401L)
    val keyDf = wanted.toDF("id")
    val got = ChangesetStore.readBucketsFor(spark, store, keyDf, Seq("id"), 16).get
    // pruned read contains every wanted key with the right value...
    val byId = got.filter(col("id").isin(wanted: _*)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId === wanted.map(i => i -> s"v$i").toMap)
    // ...and strictly fewer rows than the store (buckets were pruned)
    assert(got.count() < 500, "lookup must not read the whole store")

    // keys hashing to unwritten buckets: still consistent (superset rule)
    val none = ChangesetStore.readBucketsFor(spark, store,
      Seq(9999L).toDF("id"), Seq("id"), 16)
    assert(none.forall(_.filter(col("id") === 9999L).isEmpty))

    // empty store → None
    assert(ChangesetStore.readBucketsFor(spark,
      java.nio.file.Files.createTempDirectory("graft-rbf-empty").toString,
      keyDf, Seq("id"), 16).isEmpty)
  }
}
