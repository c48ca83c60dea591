package graft

import graft.operators.RelationGeometry

class RelationGeometrySpec extends SparkSpec {

  private def way(pts: (Double, Double)*): (Array[Double], Array[Double]) =
    (pts.map(_._1).toArray, pts.map(_._2).toArray)

  test("stitch closes a ring from forward-oriented ways") {
    val rings = RelationGeometry.stitch(Seq(
      way((0, 0), (1, 0), (1, 1)),
      way((1, 1), (0, 1), (0, 0))))
    assert(rings.length === 1)
    val (xs, ys, closed) = rings.head
    assert(closed)
    assert(xs.length === 5) // square + closing point
    assert(xs.head === xs.last && ys.head === ys.last)
  }

  test("stitch reverses a way when its end matches the chain") {
    val rings = RelationGeometry.stitch(Seq(
      way((0, 0), (1, 0), (1, 1)),
      way((0, 0), (0, 1), (1, 1)))) // reversed orientation
    assert(rings.length === 1)
    assert(rings.head._3, "ring should close via reversal")
  }

  test("stitch leaves an open chain unclosed and separates disjoint rings") {
    val rings = RelationGeometry.stitch(Seq(
      way((0, 0), (1, 0)),                             // open segment
      way((5, 5), (6, 5), (6, 6)), way((6, 6), (5, 6), (5, 5)))) // closed square
    assert(rings.length === 2)
    assert(rings.count(_._3) === 1)
  }

  test("classify: shell with hole subtracts the hole area") {
    import scala.collection.mutable.ArrayBuffer
    def ring(pts: (Double, Double)*): (ArrayBuffer[Double], ArrayBuffer[Double]) =
      (ArrayBuffer.from(pts.map(_._1)), ArrayBuffer.from(pts.map(_._2)))
    // 10×10 shell with a 2×2 hole
    val shell = ring((0, 0), (10, 0), (10, 10), (0, 10), (0, 0))
    val hole = ring((4, 4), (6, 4), (6, 6), (4, 6), (4, 4))
    val shells = RelationGeometry.classify(Seq(hole, shell))
    assert(shells.length === 1)
    assert(shells.head.holes.length === 1)
    assert(shells.head.shell._1.head === 0.0)

    // nested island: a shell inside the hole is its own shell again
    val island = ring((4.5, 4.5), (5.5, 4.5), (5.5, 5.5), (4.5, 5.5), (4.5, 4.5))
    val withIsland = RelationGeometry.classify(Seq(island, hole, shell))
    assert(withIsland.length === 2)
    assert(withIsland.map(_.holes.length).sum === 1)
  }

  test("assemble: shell-with-hole relation gets classified area and rings") {
    import spark.implicits._
    val members = Seq((200L, 1L), (200L, 2L), (200L, 3L), (200L, 4L)).toDF("rel_id", "way_id")
    val wayGeoms = Seq(
      // outer 10×10 square, two half-ways
      (1L, Array(0.0, 10.0, 10.0), Array(0.0, 0.0, 10.0)),
      (2L, Array(10.0, 0.0, 0.0), Array(10.0, 10.0, 0.0)),
      // inner 2×2 hole, two half-ways
      (3L, Array(4.0, 6.0, 6.0), Array(4.0, 4.0, 6.0)),
      (4L, Array(6.0, 4.0, 4.0), Array(6.0, 6.0, 4.0)))
      .toDF("way_id", "lons", "lats")
    val out = RelationGeometry.assemble(members, wayGeoms).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.n_rings === 2 && r.n_shells === 1 && r.n_holes === 1 && r.closed)
    assert(r.area_deg2 === 96.0) // 100 − 4
    assert(r.wkb.startsWith("0103000000" + "02000000"), "polygon WKB with 2 rings")
    assert(r.valid, "a clean shell-with-hole relation is valid")
  }

  test("assemble: a bowtie (self-intersecting) ring flags valid=false") {
    import spark.implicits._
    val members = Seq((600L, 1L), (600L, 2L)).toDF("rel_id", "way_id")
    // (0,0)→(2,0)→(0,2)→(2,2)→(0,0): edges (2,0)-(0,2) and (2,2)-(0,0) cross
    val wayGeoms = Seq(
      (1L, Array(0.0, 2.0, 0.0), Array(0.0, 0.0, 2.0)),
      (2L, Array(0.0, 2.0, 0.0), Array(2.0, 2.0, 0.0)))
      .toDF("way_id", "lons", "lats")
    val r = RelationGeometry.assemble(members, wayGeoms).collect().head
    assert(r.closed, "the bowtie still closes — it is the geometry that is bad")
    assert(!r.valid, "self-intersecting ring must flag invalid")
  }

  test("assemble: single-point ring contact is valid, line overlap is not") {
    import spark.implicits._
    // unit square (0,0)..(1,1) and square (1,1)..(2,2): corner contact at
    // (1,1) — OGC-legal and the reference's 706_mod fixture verdict
    val members = Seq((700L, 1L), (700L, 2L), (700L, 3L), (700L, 4L))
      .toDF("rel_id", "way_id")
    val wayGeoms = Seq(
      (1L, Array(0.0, 1.0, 1.0), Array(0.0, 0.0, 1.0)),
      (2L, Array(1.0, 0.0, 0.0), Array(1.0, 1.0, 0.0)),
      (3L, Array(1.0, 2.0, 2.0), Array(1.0, 1.0, 2.0)),
      (4L, Array(2.0, 1.0, 1.0), Array(2.0, 2.0, 1.0)))
      .toDF("way_id", "lons", "lats")
    val r = RelationGeometry.assemble(members, wayGeoms).collect().head
    assert(r.n_rings === 2 && r.closed)
    assert(r.valid, "corner-touching shells are valid multipolygon geometry")
    // squares (0,0)..(2,2) and (2,0)..(4,2): full shared edge at x=2 —
    // line contact, interiors' closures overlap → invalid (756_mod rule)
    val members2 = Seq((701L, 5L), (701L, 6L)).toDF("rel_id", "way_id")
    val wayGeoms2 = Seq(
      (5L, Array(0.0, 2.0, 2.0, 0.0, 0.0), Array(0.0, 0.0, 2.0, 2.0, 0.0)),
      (6L, Array(2.0, 4.0, 4.0, 2.0, 2.0), Array(0.0, 0.0, 2.0, 2.0, 0.0)))
      .toDF("way_id", "lons", "lats")
    val r2 = RelationGeometry.assemble(members2, wayGeoms2).collect().head
    assert(!r2.valid, "edge-sharing rings must flag invalid")
  }

  test("assemble: disjoint shells and separated holes stay valid") {
    import spark.implicits._
    val members = Seq((800L, 1L), (800L, 2L), (800L, 3L), (800L, 4L))
      .toDF("rel_id", "way_id")
    val wayGeoms = Seq(
      (1L, Array(0.0, 1.0, 1.0), Array(0.0, 0.0, 1.0)),
      (2L, Array(1.0, 0.0, 0.0), Array(1.0, 1.0, 0.0)),
      (3L, Array(5.0, 8.0, 8.0), Array(5.0, 5.0, 8.0)),
      (4L, Array(8.0, 5.0, 5.0), Array(8.0, 8.0, 5.0)))
      .toDF("way_id", "lons", "lats")
    val r = RelationGeometry.assemble(members, wayGeoms).collect().head
    assert(r.n_shells === 2 && r.valid)
  }

  test("member limit skips oversized relations; tag-key filter selects relations") {
    import spark.implicits._
    val members = Seq((900L, 1L), (900L, 2L), (901L, 3L), (901L, 4L), (901L, 5L))
      .toDF("rel_id", "way_id")
    val wayGeoms = Seq(
      (1L, Array(0.0, 1.0, 1.0), Array(0.0, 0.0, 1.0)),
      (2L, Array(1.0, 0.0, 0.0), Array(1.0, 1.0, 0.0)),
      (3L, Array(5.0, 8.0, 8.0), Array(5.0, 5.0, 8.0)),
      (4L, Array(8.0, 5.0, 5.0), Array(8.0, 8.0, 5.0)),
      (5L, Array(20.0, 21.0), Array(20.0, 20.0)))
      .toDF("way_id", "lons", "lats")
    // limit 2: relation 901 (3 member ways) is skipped with a marker row
    val out = RelationGeometry.assemble(members, wayGeoms, memberLimit = 2)
      .collect().map(r => r.rel_id -> r).toMap
    assert(out(900L).closed && out(900L).n_rings === 1)
    assert(out(901L).n_ways === 3 && out(901L).n_rings === 0 && !out(901L).valid)
    // limit 0 assembles nothing; -1 assembles everything
    assert(RelationGeometry.assemble(members, wayGeoms, memberLimit = 0)
      .collect().forall(_.n_rings === 0))
    assert(RelationGeometry.assemble(members, wayGeoms)
      .collect().exists(_.n_rings > 0))

    val relTags = Seq(
      (900L, Map("building" -> "yes")),
      (901L, Map("natural" -> "water")))
      .toDF("rel_id", "tags")
    val kept = RelationGeometry.filterByTagKeys(members, relTags, Seq("building"))
      .select("rel_id").distinct().collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(900L))
    assert(RelationGeometry.filterByTagKeys(members, relTags, Nil).count() === 5)
  }

  test("assemble: two disjoint shells emit a multipolygon with summed area") {
    import spark.implicits._
    val members = Seq((300L, 1L), (300L, 2L), (300L, 3L), (300L, 4L)).toDF("rel_id", "way_id")
    val wayGeoms = Seq(
      (1L, Array(0.0, 1.0, 1.0), Array(0.0, 0.0, 1.0)),
      (2L, Array(1.0, 0.0, 0.0), Array(1.0, 1.0, 0.0)),
      (3L, Array(5.0, 8.0, 8.0), Array(5.0, 5.0, 8.0)),
      (4L, Array(8.0, 5.0, 5.0), Array(8.0, 8.0, 5.0)))
      .toDF("way_id", "lons", "lats")
    val out = RelationGeometry.assemble(members, wayGeoms).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.n_shells === 2 && r.n_holes === 0)
    assert(r.area_deg2 === 10.0) // 1 + 9 — the old 2·max−sum heuristic gave 8
    assert(r.wkb.startsWith("0106000000" + "02000000"), "multipolygon WKB with 2 polys")
  }

  test("assemble: open chains are excluded from WKB in both shell-count branches") {
    import spark.implicits._
    // single-shell case: one closed unit square + one dangling segment
    val members = Seq((400L, 1L), (400L, 2L), (400L, 3L)).toDF("rel_id", "way_id")
    val wayGeoms = Seq(
      (1L, Array(0.0, 1.0, 1.0), Array(0.0, 0.0, 1.0)),
      (2L, Array(1.0, 0.0, 0.0), Array(1.0, 1.0, 0.0)),
      (3L, Array(20.0, 21.0), Array(20.0, 20.0))) // open segment
      .toDF("way_id", "lons", "lats")
    val r1 = RelationGeometry.assemble(members, wayGeoms).collect().head
    assert(!r1.closed && r1.n_rings === 2)
    assert(r1.wkb.startsWith("0103000000" + "01000000"),
      "open chain must not appear as a polygon ring")

    // two-shell case: same dangling segment + two disjoint squares
    val members2 = Seq((500L, 1L), (500L, 2L), (500L, 3L), (500L, 4L), (500L, 5L))
      .toDF("rel_id", "way_id")
    val wayGeoms2 = Seq(
      (1L, Array(0.0, 1.0, 1.0), Array(0.0, 0.0, 1.0)),
      (2L, Array(1.0, 0.0, 0.0), Array(1.0, 1.0, 0.0)),
      (3L, Array(5.0, 8.0, 8.0), Array(5.0, 5.0, 8.0)),
      (4L, Array(8.0, 5.0, 5.0), Array(8.0, 8.0, 5.0)),
      (5L, Array(20.0, 21.0), Array(20.0, 20.0))) // open segment
      .toDF("way_id", "lons", "lats")
    val r2 = RelationGeometry.assemble(members2, wayGeoms2).collect().head
    assert(!r2.closed && r2.n_shells === 2)
    assert(r2.wkb.startsWith("0106000000" + "02000000"),
      "multipolygon carries exactly the two closed shells")
  }

  test("assemble: distributed ring assembly emits polygon WKB") {
    import spark.implicits._
    val members = Seq((100L, 1L), (100L, 2L)).toDF("rel_id", "way_id")
    val wayGeoms = Seq(
      (1L, Array(0.0, 1.0, 1.0), Array(0.0, 0.0, 1.0)),
      (2L, Array(1.0, 0.0, 0.0), Array(1.0, 1.0, 0.0)))
      .toDF("way_id", "lons", "lats")
    val out = RelationGeometry.assemble(members, wayGeoms).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.rel_id === 100L)
    assert(r.n_ways === 2 && r.n_rings === 1 && r.closed)
    assert(r.n_points === 5)
    assert(r.area_deg2 === 1.0) // unit square

    val buf = java.nio.ByteBuffer.allocate(9 + 4 + 5 * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(3).putInt(1).putInt(5)
    for ((x, y) <- Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0))) {
      buf.putDouble(x); buf.putDouble(y)
    }
    assert(r.wkb === buf.array().map(b => f"${b & 0xff}%02x").mkString)
  }

  test("repair: a spike vertex is removed and the ring becomes valid") {
    import spark.implicits._
    // square with a spike at the top edge: ...(5,10)->(5,15)->(5,10)...
    // — the doubled-back vertex the reference's mergeSegments drops
    val members = Seq((900L, 1L)).toDF("rel_id", "way_id")
    val wayGeoms = Seq(
      (1L, Array(0.0, 10.0, 10.0, 5.0, 5.0, 5.0, 0.0, 0.0),
        Array(0.0, 0.0, 10.0, 10.0, 15.0, 10.0, 10.0, 0.0)))
      .toDF("way_id", "lons", "lats")
    val r = RelationGeometry.assemble(members, wayGeoms).collect().head
    assert(r.valid, "spike must repair away")
    assert(r.n_repaired >= 1)
    assert(r.area_deg2 === 100.0, "area of the de-spiked square")
    assert(r.n_points === 6, "5 distinct corners + closing vertex" +
      " (the spike tip and its duplicate base vertex are gone)")
  }

  test("repair: duplicate member ways collapse to one") {
    import spark.implicits._
    // the same closing half-square appears twice under different way ids
    val members = Seq((901L, 1L), (901L, 2L), (901L, 3L)).toDF("rel_id", "way_id")
    val wayGeoms = Seq(
      (1L, Array(0.0, 10.0, 10.0), Array(0.0, 0.0, 10.0)),
      (2L, Array(10.0, 0.0, 0.0), Array(10.0, 10.0, 0.0)),
      (3L, Array(10.0, 0.0, 0.0), Array(10.0, 10.0, 0.0)))
      .toDF("way_id", "lons", "lats")
    val r = RelationGeometry.assemble(members, wayGeoms).collect().head
    assert(r.n_rings === 1 && r.closed)
    assert(r.valid, "after dropping the duplicate way the ring is clean")
    assert(r.n_repaired === 1, "one duplicate way dropped")
    assert(r.area_deg2 === 100.0)
  }

  test("repair: crossing bowtie is NOT repairable and stays invalid") {
    // spike removal only handles collinear backtracks; a true
    // self-crossing survives repair and keeps the invalid flag
    import spark.implicits._
    val members = Seq((902L, 1L), (902L, 2L)).toDF("rel_id", "way_id")
    val wayGeoms = Seq(
      (1L, Array(0.0, 2.0, 0.0), Array(0.0, 0.0, 2.0)),
      (2L, Array(0.0, 2.0, 0.0), Array(2.0, 2.0, 0.0)))
      .toDF("way_id", "lons", "lats")
    val r = RelationGeometry.assemble(members, wayGeoms).collect().head
    assert(!r.valid)
    assert(r.n_repaired === 0)
  }

  test("removeSpikes: straight-through collinear vertices survive") {
    val (xs, ys, rem) = RelationGeometry.removeSpikes(
      Seq(0.0, 5.0, 10.0, 10.0, 0.0, 0.0), Seq(0.0, 0.0, 0.0, 10.0, 10.0, 0.0))
    assert(rem === 0, "a mid-edge vertex is not a spike")
    assert(xs.length === 6)
  }

  test("removeSpikes properties: idempotent, spike-free postcondition") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 50) {
      // random convex-ish ring on a coarse grid, then inject spikes
      val n = 4 + rnd.nextInt(5)
      val base = (0 until n).map { i =>
        val ang = 2 * math.Pi * i / n
        (math.rint(10 + 8 * math.cos(ang)), math.rint(10 + 8 * math.sin(ang)))
      }.distinct
      if (base.length >= 3) {
        var tip = 100.0
        val withSpikes = base.flatMap { case (x, y) =>
          if (rnd.nextBoolean()) { tip += 7 ; Seq((x, y), (tip, y), (x, y)) } // out-and-back
          else Seq((x, y))
        }
        val xs = (withSpikes.map(_._1) :+ withSpikes.head._1).map(_.toDouble)
        val ys = (withSpikes.map(_._2) :+ withSpikes.head._2).map(_.toDouble)
        val (rx, ry, removed) = RelationGeometry.removeSpikes(xs, ys)
        if (rx.nonEmpty) {
          // postcondition: repairing again removes nothing
          val (rx2, _, removed2) = RelationGeometry.removeSpikes(rx.toSeq, ry.toSeq)
          assert(removed2 === 0, s"trial $trial: repair not idempotent")
          assert(rx2.length === rx.length)
          // every injected spike tip is gone (no vertex appears with its
          // out-and-back neighbors)
          if (withSpikes.length > base.length)
            assert(removed >= withSpikes.length - base.length,
              s"trial $trial: spikes survived repair")
        }
      }
    }
  }

  test("assembleTyped: type gate routes multipolygons to ring assembly, " +
    "everything else to a GeometryCollection of member lines") {
    import spark.implicits._
    val members = Seq(
      (200L, 1L), (200L, 2L),  // type=multipolygon → ring assembly
      (300L, 1L), (300L, 2L),  // type=route → collection
      (400L, 1L)).toDF("rel_id", "way_id") // no tags row → collection
    val wayGeoms = Seq(
      (1L, Array(0.0, 10.0, 10.0), Array(0.0, 0.0, 10.0)),
      (2L, Array(10.0, 0.0, 0.0), Array(10.0, 10.0, 0.0)))
      .toDF("way_id", "lons", "lats")
    val relTags = Seq(
      (200L, Map("type" -> "MultiPolygon")), // case-insensitive like the ref
      (300L, Map("type" -> "route")))
      .toDF("rel_id", "tags")
    val out = RelationGeometry.assembleTyped(members, wayGeoms, relTags)
      .collect().map(r => r.getAs[Long]("rel_id") ->
        (r.getAs[String]("wkb"), r.getAs[String]("geometry_type"),
          r.getAs[Int]("n_ways"))).toMap
    assert(out(200L)._2 === "Polygon" && out(200L)._1.startsWith("0103"))
    // collection: 0107 header + LE count 2 + both member line WKBs
    val lineWkb1 = graft.functions.Geo.wkbLineHex(
      Array(0.0, 10.0, 10.0), Array(0.0, 0.0, 10.0))
    assert(out(300L)._2 === "GeometryCollection")
    assert(out(300L)._1 === "010700000002000000" + lineWkb1 +
      graft.functions.Geo.wkbLineHex(Array(10.0, 0.0, 0.0), Array(10.0, 10.0, 0.0)))
    assert(out(300L)._3 === 2)
    // a relation with no tags row is NOT a multipolygon → collection
    assert(out(400L)._2 === "GeometryCollection")
    assert(out(400L)._1 === "010700000001000000" + lineWkb1)
  }
}
