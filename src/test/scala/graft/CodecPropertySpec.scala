package graft

import graft.functions.{Geo, TextKernels}
import graft.sources.PbCursor
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream

/** Property-style checks over the codec kernels (seeded sampling — the
  * scalatest/scalacheck bridge isn't in the offline cache).
  */
class CodecPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private val Samples = 500

  private def encodeVarint(v0: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
    out.toByteArray
  }

  test("varint decode inverts encode for random longs") {
    val edge = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 127L, 128L, 300L)
    for (v <- edge ++ Seq.fill(Samples)(rnd.nextLong())) {
      val bytes = encodeVarint(v)
      val c = new PbCursor(bytes, 0, bytes.length)
      assert(c.readVarint() === v, s"varint $v")
      assert(c.pos === bytes.length)
    }
  }

  test("zigzag decode inverts encode for random longs") {
    val edge = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue)
    for (v <- edge ++ Seq.fill(Samples)(rnd.nextLong())) {
      val zz = (v << 1) ^ (v >> 63)
      val bytes = encodeVarint(zz)
      val c = new PbCursor(bytes, 0, bytes.length)
      assert(c.readSVarint() === v, s"zigzag $v")
    }
  }

  test("wkb point hex round-trips the coordinate bits") {
    for (_ <- 1 to Samples) {
      val a = rnd.nextDouble() * 360 - 180
      val b = rnd.nextDouble() * 180 - 90
      val h = Geo.wkbPointHex(a, b)
      assert(h.length === 42)
      assert(h.startsWith("0101000000"))
      val lonBits = (0 until 8).map { i =>
        java.lang.Long.parseLong(h.substring(10 + 2 * i, 12 + 2 * i), 16) << (8 * i)
      }.reduce(_ | _)
      assert(java.lang.Double.longBitsToDouble(lonBits) === a)
    }
  }

  test("xz level stays in [0, g] and code in range for random boxes") {
    for (_ <- 1 to Samples) {
      val x = rnd.nextDouble() * 359 - 180
      val y = rnd.nextDouble() * 179 - 90
      val x2 = math.min(x + rnd.nextDouble(), 180.0)
      val y2 = math.min(y + rnd.nextDouble(), 90.0)
      val lvl = Geo.xzLevel(x, y, x2, y2, 16)
      assert(lvl >= 0 && lvl <= 16, s"level $lvl for ($x,$y,$x2,$y2)")
      val code = Geo.xzCode(x, y, x2, y2, 16)
      assert(code >= 0L && code <= (BigInt(4).pow(17) - 1) / 3)
    }
  }

  test("skip(len-delimited) lands exactly at the next field key") {
    for (_ <- 1 to Samples) {
      val payload = Array.fill(rnd.nextInt(300))(rnd.nextInt(256).toByte)
      val out = new ByteArrayOutputStream()
      out.write(encodeVarint((1 << 3) | 2))       // field 1, wire 2
      out.write(encodeVarint(payload.length.toLong))
      out.write(payload)
      out.write(encodeVarint((2 << 3) | 0))       // field 2, wire 0
      out.write(encodeVarint(99L))
      val bytes = out.toByteArray
      val c = new PbCursor(bytes, 0, bytes.length)
      var seen = List.empty[(Int, Long)]
      c.fields { (f, w) =>
        if (w == 2) c.skip(w) else seen ::= (f, c.readVarint())
      }
      assert(seen === List((2, 99L)), s"skip desync for len=${payload.length}")
    }
  }

  test("simhash is permutation-invariant over the token multiset") {
    for (_ <- 1 to 50) {
      val toks = Seq.fill(rnd.nextInt(40) + 1)(s"w${rnd.nextInt(50)}")
      val a = TextKernels.simHash64Hex(toks.mkString(" "))
      val b = TextKernels.simHash64Hex(rnd.shuffle(toks).mkString(" "))
      assert(a === b)
    }
  }
}
