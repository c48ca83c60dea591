package graft

import graft.operators.MinorVersions
import org.apache.spark.sql.DataFrame

/** Replays the REFERENCE'S OWN unit fixtures
  * (ohsome-contributions ContributionsWayTest.java) against
  * [[MinorVersions.computeChangesets]] — the changeset-granularity
  * grouping of ContributionsEntity.java: one minor per maximal
  * (ts, changeset)-ordered run of member edits sharing a changeset,
  * minor timestamp = last consumed edit, same-changeset-as-major edits
  * folded into the major row.
  */
class MinorVersionsParitySpec extends SparkSpec {

  /** ways: (way_id, osm_version, valid_from, changeset, refs);
    * edits: (node_id, ts, changeset)
    */
  private def run(ways: Seq[(Long, Int, Long, Long, Seq[Long])],
      edits: Seq[(Long, Long, Long)]): Seq[(Long, Int, Long, Long, Long, Int)] = {
    import spark.implicits._
    val w: DataFrame = ways
      .toDF("way_id", "osm_version", "valid_from", "changeset", "refs")
    val e: DataFrame = edits.toDF("node_id", "ts", "changeset")
    MinorVersions.computeChangesets(w, e).collect()
      .map(r => (r.getAs[Long]("way_id"), r.getAs[Int]("osm_version"),
        r.getAs[Long]("ts"), r.getAs[Long]("changeset"),
        r.getAs[Long]("n_edits"), r.getAs[Int]("osm_minor_version")))
      .sortBy(t => (t._1, t._2, t._6)).toSeq
  }

  test("two nodes moved in different changesets at the same timestamp " +
    "give two minors ordered by changeset (ContributionsWayTest" +
    ".testTwoNodesMovedInDifferentChangesets)") {
    val out = run(
      ways = Seq((12L, 1, 1L, 1L, Seq(1L, 2L))),
      edits = Seq((1L, 2L, 2L), (2L, 2L, 3L)))
    assert(out === Seq(
      (12L, 1, 1L, 1L, 0L, 0), // major
      (12L, 1, 2L, 2L, 1L, 1), // node 1's changeset 2 first
      (12L, 1, 2L, 3L, 1L, 2))) // node 2's changeset 3 second
  }

  test("different changesets at different timepoints (ContributionsWayTest" +
    ".testTwoNodesMovedInDifferentChangesetsAtDifferentTimepoints)") {
    val out = run(
      ways = Seq((12L, 1, 1L, 1L, Seq(1L, 2L))),
      edits = Seq((1L, 2L, 2L), (2L, 3L, 3L)))
    assert(out === Seq(
      (12L, 1, 1L, 1L, 0L, 0),
      (12L, 1, 2L, 2L, 1L, 1),
      (12L, 1, 3L, 3L, 1L, 2)))
  }

  test("node versions between two way versions each form a minor of the " +
    "FIRST version (ContributionsWayTest.testNodeVersionsBeforePlusMinorVersionWay)") {
    val out = run(
      ways = Seq((10L, 1, 2L, 1L, Seq(1L)), (10L, 2, 7L, 1L, Seq(1L))),
      edits = Seq((1L, 5L, 5L), (1L, 6L, 6L)))
    assert(out === Seq(
      (10L, 1, 2L, 1L, 0L, 0),
      (10L, 1, 5L, 5L, 1L, 1),
      (10L, 1, 6L, 6L, 1L, 2),
      (10L, 2, 7L, 1L, 0L, 0)))
  }

  test("a maximal same-changeset run collapses into ONE minor stamped with " +
    "the LAST consumed edit's timestamp (computeNext's queue loop)") {
    val out = run(
      ways = Seq((12L, 1, 1L, 1L, Seq(1L, 2L))),
      edits = Seq((1L, 2L, 5L), (2L, 3L, 5L)))
    assert(out === Seq(
      (12L, 1, 1L, 1L, 0L, 0),
      (12L, 1, 3L, 5L, 2L, 1))) // both edits, ts of the later one
  }

  test("an interleaved foreign changeset splits a run (queue order is " +
    "(timestamp, changeset), consumption stops at a different head)") {
    val out = run(
      ways = Seq((12L, 1, 1L, 1L, Seq(1L, 2L))),
      edits = Seq((1L, 2L, 5L), (2L, 3L, 4L), (1L, 4L, 5L)))
    assert(out === Seq(
      (12L, 1, 1L, 1L, 0L, 0),
      (12L, 1, 2L, 5L, 1L, 1),
      (12L, 1, 3L, 4L, 1L, 2),
      (12L, 1, 4L, 5L, 1L, 3)))
  }

  test("member edits in the SAME changeset as the major fold into the " +
    "major row and never form a minor (initMembers' changeset advancement)") {
    val out = run(
      ways = Seq((12L, 1, 1L, 1L, Seq(1L))),
      edits = Seq((1L, 2L, 1L)))
    assert(out === Seq((12L, 1, 1L, 1L, 0L, 0)))
  }

  test("relation cascade: a member-node edit one level down yields one " +
    "relation minor per changeset (ContributionsRelationTest" +
    ".testSingleNodeRelation)") {
    import spark.implicits._
    // relation 1 v1 at ts1 cs1 over member node 1; node v2 at ts2 cs2
    val rels = Seq((1L, 1, 1L, 1L, Seq(1L)))
      .toDF("rel_id", "osm_version", "valid_from", "changeset", "way_ids")
    val memberTimeline = Seq((1L, 2L, 2L)).toDF("way_id", "ts", "changeset")
    val out = MinorVersions.relationMinorsChangesets(rels, memberTimeline)
      .collect().map(r => (r.getAs[Long]("rel_id"), r.getAs[Long]("ts"),
        r.getAs[Long]("changeset"), r.getAs[Int]("osm_minor_version")))
      .sortBy(_._4).toSeq
    assert(out === Seq((1L, 1L, 1L, 0), (1L, 2L, 2L, 1)))
  }
}
