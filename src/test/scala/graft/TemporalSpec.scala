package graft

import graft.operators.{AsofJoin, MinorVersions}
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  test("asof join attaches the latest right row at or before each left ts") {
    import spark.implicits._
    val trades = Seq((1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 50L, "t3"))
      .toDF("key", "ts", "trade")
    val quotes = Seq((1L, 90L, 10.0), (1L, 200L, 11.0), (1L, 300L, 12.0),
      (2L, 60L, 5.0))
      .toDF("key", "qts", "price")
    val out = AsofJoin.asof(trades, quotes, "key", "ts", "qts", Seq("price"))
      .orderBy("key", "ts").collect()
    assert(out.map(r => (r.getAs[String]("trade"), Option(r.getAs[Any]("price")))) ===
      Seq(("t1", Some(10.0)), ("t2", Some(11.0)), ("t3", None)))
  }

  test("asof join: equal timestamps match (<= semantics)") {
    import spark.implicits._
    val l = Seq((1L, 100L)).toDF("key", "ts")
    val r = Seq((1L, 100L, "exact")).toDF("key", "qts", "v")
    val out = AsofJoin.asof(l, r, "key", "ts", "qts", Seq("v")).collect()
    assert(out.head.getAs[String]("v") === "exact")
  }

  test("minor versions: member edits within a version interval increment the counter") {
    import spark.implicits._
    val ways = Seq(
      (42L, 1, 100L, Seq(10L, 13L)),
      (42L, 2, 500L, Seq(10L, 13L, 14L)))
      .toDF("way_id", "osm_version", "valid_from", "refs")
    val nodeEdits = Seq(
      (10L, 200L), // member change in v1 window → v1 minor 1
      (13L, 300L), // member change in v1 window → v1 minor 2
      (10L, 600L), // member change in v2 window → v2 minor 1
      (99L, 250L)) // not a member → ignored
      .toDF("node_id", "ts")
    val out = MinorVersions.compute(ways, nodeEdits).collect()
    val rows = out.map(r => (r.getAs[Int]("osm_version"),
      r.getAs[Int]("osm_minor_version"), r.getAs[String]("trigger")))
    assert(rows.toSeq === Seq(
      (1, 0, "MAJOR"), (1, 1, "MINOR_GEOMETRY"), (1, 2, "MINOR_GEOMETRY"),
      (2, 0, "MAJOR"), (2, 1, "MINOR_GEOMETRY")))
  }
}
