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
}
