package graft

import graft.functions.Geo
import org.scalatest.funsuite.AnyFunSuite

class GeometryExprSpec extends AnyFunSuite {

  test("geodesic length: flattening-corrected formula against fixtures") {
    // one degree of longitude along the equator with the reference's mean
    // radius: 6371000·π/180 ≈ 111.195 km
    val eq = Geo.geodesicLengthMm(Array(0.0, 1.0), Array(0.0, 0.0)) / 1e6
    assert(math.abs(eq - 111.195) < 0.01, s"equator degree was $eq km")
    // at 60°N a degree of longitude shrinks ~ cos(spherical 60°) ≈ half
    val n60 = Geo.geodesicLengthMm(Array(0.0, 1.0), Array(60.0, 60.0)) / 1e6
    assert(n60 < 56.0 && n60 > 55.0, s"60N degree was $n60 km")
    // flattening correction: a meridian degree near the pole is LONGER than
    // near the equator on the WGS84 spheroid
    val mEq = Geo.geodesicLengthMm(Array(0.0, 0.0), Array(0.0, 1.0))
    val mPole = Geo.geodesicLengthMm(Array(0.0, 0.0), Array(88.0, 89.0))
    assert(mPole > mEq, s"meridian degree pole=$mPole vs equator=$mEq")
    // degenerate inputs
    assert(Geo.geodesicLengthMm(Array(1.0), Array(1.0)) === 0L)
    assert(Geo.geodesicLengthMm(Array.empty[Double], Array.empty[Double]) === 0L)
    // additivity: per-step rounding sums exactly
    val ab = Geo.geodesicLengthMm(Array(0.0, 1.0), Array(0.0, 0.0))
    val bc = Geo.geodesicLengthMm(Array(1.0, 2.0), Array(0.0, 0.0))
    val abc = Geo.geodesicLengthMm(Array(0.0, 1.0, 2.0), Array(0.0, 0.0, 0.0))
    assert(abc === ab + bc)
  }

  test("geodesic area: Chamberlain-Duquette ring area against fixtures") {
    // 1°×1° "square" at the equator ≈ 111.32 km × 110.57 km ≈ 1.231e10 m²
    val sq = Geo.geodesicAreaM2(
      Array(0.0, 1.0, 1.0, 0.0), Array(0.0, 0.0, 1.0, 1.0))
    assert(math.abs(sq - 1.2308e10) / 1.2308e10 < 0.005, s"equator square was $sq")
    // orientation-independent (absolute area)
    val sqCw = Geo.geodesicAreaM2(
      Array(0.0, 0.0, 1.0, 1.0), Array(0.0, 1.0, 1.0, 0.0))
    assert(sqCw === sq)
    // same square at 60°N covers ~cos(60°) ≈ half the area
    val n60 = Geo.geodesicAreaM2(
      Array(0.0, 1.0, 1.0, 0.0), Array(60.0, 60.0, 61.0, 61.0))
    assert(n60 < sq * 0.55 && n60 > sq * 0.4, s"60N square was $n60 vs $sq")
    // degenerate: fewer than 3 points
    assert(Geo.geodesicAreaM2(Array(0.0, 1.0), Array(0.0, 1.0)) === 0L)
  }

  test("point_in_poly: integer ray-cast against square and hexagon") {
    val sqx = Array(0L, 10L, 10L, 0L)
    val sqy = Array(0L, 0L, 10L, 10L)
    assert(Geo.pointInPoly(5, 5, sqx, sqy))
    assert(!Geo.pointInPoly(15, 5, sqx, sqy))
    assert(!Geo.pointInPoly(-5, 5, sqx, sqy))
    assert(!Geo.pointInPoly(5, 15, sqx, sqy))
    // half-open boundary rule is consistent: left/bottom in, right/top out
    assert(Geo.pointInPoly(0, 5, sqx, sqy))
    assert(!Geo.pointInPoly(10, 5, sqx, sqy))
    // hexagon as in geo_poly_join: cx=cy=0, r=5 → (±10,0),(±5,±10)
    val hx = Array(10L, 5L, -5L, -10L, -5L, 5L)
    val hy = Array(0L, 10L, 10L, 0L, -10L, -10L)
    assert(Geo.pointInPoly(0, 0, hx, hy))
    assert(Geo.pointInPoly(7, 3, hx, hy))   // inside the slanted edge (x+y/2<10)
    assert(!Geo.pointInPoly(9, 4, hx, hy))  // outside it (9+2=11>10)
    assert(!Geo.pointInPoly(0, 11, hx, hy))
    assert(!Geo.pointInPoly(11, 0, hx, hy))
  }

  test("point_in_poly full-cell argument: all-corners-in implies cell in (convex)") {
    // convex hexagon, random cells: whenever 4 corners test inside, every
    // lattice point of the cell must test inside too
    val r = 401L
    val hx = Array(2 * r, r, -r, -2 * r, -r, r)
    val hy = Array(0L, 2 * r, 2 * r, 0L, -2 * r, -2 * r)
    val rnd = new scala.util.Random(7)
    var fullCells = 0
    for (_ <- 0 until 200) {
      val x0 = rnd.between(-900L, 700L); val y0 = rnd.between(-900L, 700L)
      val corners = Seq((x0, y0), (x0 + 200, y0), (x0, y0 + 100), (x0 + 200, y0 + 100))
      if (corners.forall { case (x, y) => Geo.pointInPoly(x, y, hx, hy) }) {
        fullCells += 1
        for (x <- x0 to (x0 + 200) by 40; y <- y0 to (y0 + 100) by 20)
          assert(Geo.pointInPoly(x, y, hx, hy), s"($x,$y) in full cell tested outside")
      }
    }
    assert(fullCells > 0, "test corpus never produced a full cell")
  }

  test("wkb point hex matches java.nio little-endian encoding") {
    val cases = Seq((0.0, 0.0), (-180.0, -90.0), (179.0, 89.0), (13.4, 52.52), (-0.1, 0.1))
    for ((lon, lat) <- cases) {
      val buf = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(1.toByte).putInt(1).putDouble(lon).putDouble(lat)
      val expected = buf.array().map(b => f"${b & 0xff}%02x").mkString
      assert(Geo.wkbPointHex(lon, lat) === expected)
    }
  }

  /** Independent naive XZ: descend the quadtree re-deriving |subtree| from
    * the closed form at every step with BigInt — cross-checks Geo's
    * incremental longs.
    */
  private def naiveXz(xmin: Double, ymin: Double, xmax: Double, ymax: Double, g: Int): (Int, BigInt) = {
    val (x0, y0) = ((180.0 + xmin) / 360.0, (90.0 + ymin) / 360.0)
    val (x1, y1) = ((180.0 + xmax) / 360.0, (90.0 + ymax) / 360.0)
    val l1 = math.floor(math.log(math.max(x1 - x0, y1 - y0)) / math.log(0.5)).toInt
    val length =
      if (l1 >= g) g
      else {
        val w2 = math.pow(0.5, l1 + 1)
        def ok(a: Double, b: Double) = b <= math.floor(a / w2) * w2 + 2 * w2
        if (ok(x0, x1) && ok(y0, y1)) l1 + 1 else l1
      }
    var code = BigInt(0)
    var (xl, xh, yl, yh) = (0.0, 1.0, 0.0, 1.0)
    for (i <- 0 until length) {
      val n = (BigInt(4).pow(g - i) - 1) / 3
      var q = BigInt(0)
      val xc = (xl + xh) / 2; val yc = (yl + yh) / 2
      if (x0 >= xc) { q += 1; xl = xc } else xh = xc
      if (y0 >= yc) { q += 2; yl = yc } else yh = yc
      code += q * n + 1
    }
    (length, code)
  }

  test("xz code/level match an independent BigInt implementation") {
    val boxes = Seq(
      (-180.0, -90.0, 180.0, 90.0),   // world → level 0
      (0.0, 0.0, 0.0, 0.0),           // degenerate point → level g
      (13.1, 52.3, 13.6, 52.7),       // city-sized
      (-122.6, 37.2, -121.7, 38.0),   // bay-sized
      (10.0, 10.0, 10.0001, 10.0001), // tiny way
      (-1.0, -1.0, 1.0, 1.0))
    for ((a, b, c, d) <- boxes) {
      val (lvl, code) = naiveXz(a, b, c, d, 16)
      assert(Geo.xzLevel(a, b, c, d, 16) === lvl, s"level of ($a,$b,$c,$d)")
      assert(BigInt(Geo.xzCode(a, b, c, d, 16)) === code, s"code of ($a,$b,$c,$d)")
      assert(lvl >= 0 && lvl <= 16)
    }
  }

  test("xz codes of disjoint same-level cells differ") {
    val c1 = Geo.xzCode(10.0, 10.0, 10.01, 10.01, 16)
    val c2 = Geo.xzCode(-10.0, -10.0, -9.99, -9.99, 16)
    assert(c1 !== c2)
  }

  test("integer-box xz kernel agrees with the generic kernel on integer boxes") {
    // sweep includes the hazardous extents (45/90/180 → exact powers of
    // 0.5 after normalization) where only the ORDER of computation differs:
    // the log-free level must equal the naive BigInt level everywhere
    val boxes = Seq(
      (-180L, -90L, 179L, 89L), (0L, 0L, 0L, 0L), (10L, 10L, 55L, 20L),
      (0L, 0L, 45L, 10L), (0L, 0L, 90L, 30L), (-90L, -45L, 90L, 45L),
      (-180L, -90L, 0L, 90L), (7L, 3L, 8L, 4L), (-1L, -1L, 1L, 1L))
    for ((a, b, c, d) <- boxes) {
      val (lvl, code) = naiveXz(a.toDouble, b.toDouble, c.toDouble, d.toDouble, 16)
      assert(Geo.xzLevelInt(a, b, c, d, 16) === lvl, s"level of ($a,$b,$c,$d)")
      assert(BigInt(Geo.xzCodeInt(a, b, c, d, 16)) === code, s"code of ($a,$b,$c,$d)")
    }
    // random sweep over the full signed-degree domain (seeded)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val x0 = rnd.between(-180L, 180L); val y0 = rnd.between(-90L, 90L)
      val (a, c) = (x0, math.min(179L, x0 + rnd.between(0L, 360L)))
      val (b, d) = (y0, math.min(89L, y0 + rnd.between(0L, 180L)))
      val (lvl, code) = naiveXz(a.toDouble, b.toDouble, c.toDouble, d.toDouble, 16)
      assert(Geo.xzLevelInt(a, b, c, d, 16) === lvl, s"level of ($a,$b,$c,$d)")
      assert(BigInt(Geo.xzCodeInt(a, b, c, d, 16)) === code, s"code of ($a,$b,$c,$d)")
    }
  }

  test("dpKeep matches an independent recursive Douglas-Peucker on seeded polylines") {
    // independent slant: DFS recursion carrying explicit depth (the
    // kernel runs BFS levels over a worklist) — the kept SET must agree
    // because a segment's depth is traversal-order-independent
    def dpRec(xs: Array[Long], ys: Array[Long]): Set[Int] = {
      var kept = Set(0, xs.length - 1)
      def go(i: Int, j: Int, depth: Int): Unit = {
        if (j - i < 2 || depth >= Geo.DpDepth) return
        val den = (xs(j) - xs(i)) * (xs(j) - xs(i)) + (ys(j) - ys(i)) * (ys(j) - ys(i))
        val scored = ((i + 1) until j).map { k =>
          val num =
            if (den == 0L) (xs(k) - xs(i)) * (xs(k) - xs(i)) + (ys(k) - ys(i)) * (ys(k) - ys(i))
            else {
              val cr = (xs(j) - xs(i)) * (ys(i) - ys(k)) - (xs(i) - xs(k)) * (ys(j) - ys(i))
              cr * cr
            }
          (k, num)
        }
        val (bk, bn) = scored.maxBy { case (k, num) => (num, -k) }
        if (bn > Geo.DpEps * Geo.DpEps * (if (den == 0L) 1L else den)) {
          kept += bk
          go(i, bk, depth + 1); go(bk, j, depth + 1)
        }
      }
      go(0, xs.length - 1, 0)
      kept
    }
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 100) {
      val n = 2 + rnd.nextInt(60)
      val xs = Array.fill(n)(rnd.nextLong(36000))
      val ys = Array.fill(n)(rnd.nextLong(18000))
      val kept = dpRec(xs, ys)
      val want = Array(kept.size.toLong, kept.toSeq.map(_.toLong).sum,
        kept.toSeq.map(xs(_)).sum, kept.toSeq.map(ys(_)).sum)
      assert(Geo.dpKeep(xs, ys).toSeq == want.toSeq, s"trial $trial n=$n")
    }
    // degenerate shapes: all-identical points (zero-length root segment)
    // and a collinear run (nothing past tolerance)
    assert(Geo.dpKeep(Array(5L, 5L, 5L, 5L), Array(7L, 7L, 7L, 7L)).toSeq ==
      Seq(2L, 3L, 10L, 14L))
    val colX = Array.tabulate(10)(i => i * 10L)
    assert(Geo.dpKeep(colX, colX).toSeq == Seq(2L, 9L, 90L, 90L))
  }
}
