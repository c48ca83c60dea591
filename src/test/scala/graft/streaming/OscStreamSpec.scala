package graft.streaming

import graft.SparkSpec
import graft.operators.Replication
import graft.sources.OsmXml

/** The composed continuous pipeline: a watched directory of minutely
  * `.osc` files → streaming parse → event adaptation → the re-emitting
  * version-chain updater. The full streaming face of the reference's
  * replication loop: new diff file in, updated contribution rows out.
  */
class OscStreamSpec extends SparkSpec {

  private def osc(body: String): String =
    s"""<?xml version="1.0"?><osmChange version="0.6">$body</osmChange>"""

  test("osc directory stream drives incremental contribution updates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-osc-stream")

    val edits = Replication.oscAsEvents(OsmXml.streamOsc(spark, dir.toString))
      .as[ContribEdit]
    val q = ContributionStream(edits).writeStream
      .format("memory").queryName("osc_updates")
      .outputMode("append").start()

    // minutely diff #1: node 5 created
    java.nio.file.Files.writeString(dir.resolve("d1.osc"), osc(
      """<create><node id="5" version="1" timestamp="2024-01-21T00:00:00Z"
        | changeset="7" uid="9" user="bob" lat="52.5" lon="13.4">
        |  <tag k="amenity" v="cafe"/></node></create>""".stripMargin))
    q.processAllAvailable()
    val b1 = spark.table("osc_updates").collect()
    assert(b1.map(r => (r.getLong(0), r.getInt(1), r.getString(4), r.getString(5))).toSeq ===
      Seq((5L, 1, "CREATION", "latest")))

    // minutely diff #2: tag modified — closes v1, emits v2
    java.nio.file.Files.writeString(dir.resolve("d2.osc"), osc(
      """<modify><node id="5" version="2" timestamp="2024-01-21T00:01:00Z"
        | changeset="8" uid="9" user="bob" lat="52.5" lon="13.4">
        |  <tag k="amenity" v="bar"/></node></modify>""".stripMargin))
    q.processAllAvailable()
    val all = spark.table("osc_updates")
      .orderBy("osm_version", "valid_from").collect()
      .map(r => (r.getInt(1), Option(r.get(3)).isDefined, r.getString(4), r.getString(5)))
    q.stop()
    assert(all.toSeq === Seq(
      (1, false, "CREATION", "latest"),
      (1, true, "CREATION", "history"), // re-emitted close
      (2, false, "TAG", "latest")))
  }
}
