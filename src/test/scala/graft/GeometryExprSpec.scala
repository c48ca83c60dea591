package graft

import graft.functions.Geo
import org.scalatest.funsuite.AnyFunSuite

class GeometryExprSpec extends AnyFunSuite {

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
}
