package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming contribution updater: each batch closes the previous latest
  * row (re-emission with valid_to + demoted status) and emits the new
  * classified row — the streaming face of Replication.updateContributions.
  */
class ContributionStreamSpec extends SparkSpec {

  test("edits stream into re-emitted version chains across batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[ContribEdit]
    val q = ContributionStream(input.toDS()).writeStream
      .format("memory").queryName("contrib_updates")
      .outputMode("append").start()

    // batch 1: entity 1 created, entity 2 created
    input.addData(
      ContribEdit(10L, 1000L, 1L, "create", """{"k":"1"}""", 1.0),
      ContribEdit(20L, 1500L, 2L, "create", """{"k":"9"}""", 2.0))
    q.processAllAvailable()
    val b1 = spark.table("contrib_updates").collect()
    assert(b1.length === 2)
    assert(b1.forall(r => r.getString(4) === "CREATION" && r.getString(5) === "latest"))

    // batch 2: entity 1 tag change then delete — closes v1, then v2
    input.addData(
      ContribEdit(11L, 2000L, 1L, "modify", """{"k":"2"}""", 1.0),
      ContribEdit(12L, 3000L, 1L, "delete-marker", """{"k":"2"}""", 1.0))
    q.processAllAvailable()
    val all = spark.table("contrib_updates")
      .orderBy("osm_id", "osm_version", "valid_from").collect()
      .map(r => (r.getLong(0), r.getInt(1), Option(r.get(3)), r.getString(4), r.getString(5)))
    q.stop()

    // entity 1 emissions: v1 CREATION latest (b1), v1 closed re-emit,
    // v2 TAG latest, v2 closed re-emit, v3 TAG (vs prev props equal so
    // only via delete-marker? no: event_type delete-marker != error →
    // visible, props equal, value equal → empty type) — use explicit rows:
    val e1 = all.filter(_._1 == 1L).toSeq
    assert(e1 === Seq(
      (1L, 1, None, "CREATION", "latest"),          // batch 1
      (1L, 1, Some(2000L), "CREATION", "history"),  // re-emitted close
      (1L, 2, None, "TAG", "latest"),               // tag change
      (1L, 2, Some(3000L), "TAG", "history"),       // re-emitted close
      (1L, 3, None, "", "latest")))                 // no tag/geom change
    // entity 2 untouched in batch 2: single creation row only
    assert(all.filter(_._1 == 2L).toSeq === Seq((2L, 1, None, "CREATION", "latest")))
  }

  test("true deletion demotes the closed row and marks the chain deleted") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[ContribEdit]
    val q = ContributionStream(input.toDS()).writeStream
      .format("memory").queryName("contrib_del")
      .outputMode("append").start()
    input.addData(ContribEdit(1L, 100L, 5L, "create", "{}", 0.5))
    q.processAllAvailable()
    input.addData(ContribEdit(2L, 200L, 5L, "error", "{}", 0.5))
    q.processAllAvailable()
    // stale edit (older than state): ignored
    input.addData(ContribEdit(3L, 150L, 5L, "modify", "{}", 0.7))
    q.processAllAvailable()
    val rows = spark.table("contrib_del")
      .orderBy("osm_version", "valid_from").collect()
      .map(r => (r.getInt(1), Option(r.get(3)), r.getString(4), r.getString(5)))
    q.stop()
    assert(rows.toSeq === Seq(
      (1, None, "CREATION", "latest"),
      (1, Some(200L), "CREATION", "history"),
      (2, None, "DELETION", "deleted")))
  }
}
