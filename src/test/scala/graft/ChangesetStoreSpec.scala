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
      .withColumnRenamed("cs_created_at", "created_at")
      .withColumnRenamed("cs_closed_at", "closed_at")
      .withColumnRenamed("cs_num_changes", "num_changes")
      .exceptAll(expected)
    assert(diff.isEmpty, "store-backed enrichment must equal the global rebuild")
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
