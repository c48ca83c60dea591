package graft

import graft.operators.{MediaCodec, Raster}
import org.scalatest.funsuite.AnyFunSuite

/** Real-codec contracts: encode→decode identity, spec edge cases the
  * encoder never produces (comments, padding, top-down BMP, extra RIFF
  * chunks), and malformed-input rejection.
  */
class MediaCodecSpec extends AnyFunSuite {

  private def rgb(n: Int): Array[Byte] = Array.tabulate(n * 3)(i => (i * 7 + 3).toByte)

  test("ppm roundtrip and header tokenization with comments") {
    val px = rgb(16 * 4)
    val enc = MediaCodec.encodePpm(16, 4, px)
    assert(new String(enc.take(11), "US-ASCII") === "P6\n16 4\n255")
    val dec = MediaCodec.decodePpm(enc).get
    assert((dec.w, dec.h) === (16, 4))
    assert(dec.rgb.toSeq === px.toSeq)
    // netpbm allows comments and arbitrary whitespace in the header
    val weird = "P6 #comment\n#another\n 2\t1 #w h\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    val d2 = MediaCodec.decodePpm(weird).get
    assert((d2.w, d2.h) === (2, 1))
    assert(d2.rgb.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6))
    // truncated pixel plane / wrong magic / non-255 maxval → None
    assert(MediaCodec.decodePpm(enc.dropRight(1)).isEmpty)
    assert(MediaCodec.decodePpm("P5\n1 1\n255\nxxx".getBytes("US-ASCII")).isEmpty)
    assert(MediaCodec.decodePpm("P6\n1 1\n65535\n".getBytes("US-ASCII") ++ rgb(1)).isEmpty)
  }

  test("bmp roundtrip inverts bottom-up BGR rows; padded widths; top-down variant") {
    val px = rgb(16 * 3)
    val enc = MediaCodec.encodeBmp(16, 3, px)
    assert(enc(0) === 'B'.toByte && enc(1) === 'M'.toByte)
    val dec = MediaCodec.decodeBmp(enc).get
    assert((dec.w, dec.h) === (16, 3))
    assert(dec.rgb.toSeq === px.toSeq, "bottom-up BGR must invert to row-major RGB")
    // width 3 → row size 12 with 3 pad bytes per row
    val px3 = rgb(3 * 2)
    val enc3 = MediaCodec.encodeBmp(3, 2, px3)
    assert(enc3.length === 54 + 12 * 2)
    assert(MediaCodec.decodeBmp(enc3).get.rgb.toSeq === px3.toSeq)
    // top-down: negative biHeight, rows NOT flipped
    val td = enc3.clone()
    val negH = -2
    td(22) = (negH & 0xff).toByte; td(23) = ((negH >> 8) & 0xff).toByte
    td(24) = ((negH >> 16) & 0xff).toByte; td(25) = ((negH >> 24) & 0xff).toByte
    val dtd = MediaCodec.decodeBmp(td).get
    // the encoder wrote bottom-up, so a top-down read sees flipped rows
    assert(dtd.rgb.toSeq === (px3.slice(9, 18) ++ px3.slice(0, 9)).toSeq)
    // truncated / non-24bpp rejected
    assert(MediaCodec.decodeBmp(enc.take(53)).isEmpty)
    val bad = enc.clone(); bad(28) = 8
    assert(MediaCodec.decodeBmp(bad).isEmpty)
  }

  test("wav roundtrip walks chunks; rejects non-PCM and missing fmt") {
    val samples = Array.tabulate(100)(i => (i * 13).toByte)
    val enc = MediaCodec.encodeWav(samples)
    assert(enc.length === 44 + 100)
    assert(new String(enc.take(4), "US-ASCII") === "RIFF")
    val dec = MediaCodec.decodeWav(enc).get
    assert((dec.w, dec.h) === (100, 1))
    assert((0 until 100).forall(i => dec.rgb(3 * i) === samples(i) &&
      dec.rgb(3 * i + 1) === samples(i) && dec.rgb(3 * i + 2) === samples(i)))
    // an extra chunk between fmt and data must be skipped (odd size → word
    // alignment padding too)
    val extra = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0) ++
      Array[Byte](9, 9, 9, 0) // 3 data bytes + 1 alignment pad
    val spliced = enc.take(36) ++ extra ++ enc.drop(36)
    // patch RIFF size (bytes 4..7) to cover the insertion
    val riffSize = spliced.length - 8
    spliced(4) = (riffSize & 0xff).toByte
    spliced(5) = ((riffSize >> 8) & 0xff).toByte
    spliced(6) = ((riffSize >> 16) & 0xff).toByte
    spliced(7) = ((riffSize >> 24) & 0xff).toByte
    assert(MediaCodec.decodeWav(spliced).get.rgb.toSeq === dec.rgb.toSeq)
    // 16-bit PCM (unsupported here) rejected: patch bits-per-sample
    val b16 = enc.clone(); b16(34) = 16
    assert(MediaCodec.decodeWav(b16).isEmpty)
    assert(MediaCodec.decodeWav("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
  }

  test("raster feature invariants: decode(encode(x)) identical across formats") {
    // same pixel source through PPM and BMP must decode to the same plane
    val px = rgb(16 * 5)
    val viaPpm = MediaCodec.decodePpm(MediaCodec.encodePpm(16, 5, px)).get
    val viaBmp = MediaCodec.decodeBmp(MediaCodec.encodeBmp(16, 5, px)).get
    assert(viaPpm === Raster(16, 5, viaPpm.rgb))
    assert(viaPpm.rgb.toSeq === viaBmp.rgb.toSeq)
  }

  // ---- PNG --------------------------------------------------------------

  /** Hand-assembled chunk (independent of the encoder's own framing). */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    def be32(v: Int) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(); d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](512)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  private val pngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  test("png byte-level fixture: hand-built 2x2 grey with Sub filter decodes exactly") {
    // scanlines: row0 filter None → pixels 10, 20;
    //            row1 filter Sub  → recon 5, then 7+5=12
    val raw = Array[Byte](0, 10, 20, 1, 5, 7)
    def be32(v: Int) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    val ihdr = be32(2) ++ be32(2) ++ Array[Byte](8, 0, 0, 0, 0) // grey, depth 8
    val png = pngSig ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", deflate(raw)) ++ pngChunk("IEND", Array.empty[Byte])
    val dec = MediaCodec.decodePng(png).get
    assert((dec.w, dec.h) === (2, 2))
    // grey triples into the RGB plane
    assert(dec.rgb.toSeq === Seq[Byte](10, 10, 10, 20, 20, 20, 5, 5, 5, 12, 12, 12))
  }

  test("png roundtrip: all five filters on the wire, rgb and grey, multi-IDAT") {
    val px = rgb(16 * 6) // 6 rows: filters 0..4 then 0 again
    val enc = MediaCodec.encodePng(16, 6, px, rgb = true)
    assert(enc.take(8).toSeq === pngSig.toSeq)
    // the encoder must split the stream across two IDAT chunks
    val idatCount = enc.sliding(4).count(_.sameElements("IDAT".getBytes("US-ASCII")))
    assert(idatCount === 2, "multi-IDAT concatenation must be load-bearing")
    val dec = MediaCodec.decodePng(enc).get
    assert((dec.w, dec.h) === (16, 6))
    assert(dec.rgb.toSeq === px.toSeq)
    // greyscale: plane comes back tripled
    val g = Array.tabulate[Byte](16 * 7)(i => (i * 13 + 1).toByte)
    val gdec = MediaCodec.decodePng(MediaCodec.encodePng(16, 7, g, rgb = false)).get
    assert((gdec.w, gdec.h) === (16, 7))
    assert((0 until 16 * 7).forall(i => gdec.rgb(3 * i) === g(i) &&
      gdec.rgb(3 * i + 1) === g(i) && gdec.rgb(3 * i + 2) === g(i)))
  }

  test("png rejects malformed input: truncation, bad CRC, bad filter, interlace") {
    val enc = MediaCodec.encodePng(4, 4, rgb(4 * 4), rgb = true)
    assert(MediaCodec.decodePng(enc.dropRight(1)).isEmpty, "truncated IEND")
    assert(MediaCodec.decodePng(enc.take(20)).isEmpty, "truncated header")
    // flip one byte inside the first IDAT payload → CRC mismatch
    val bad = enc.clone()
    val idatPos = bad.indexOfSlice("IDAT".getBytes("US-ASCII"))
    bad(idatPos + 5) = (bad(idatPos + 5) ^ 0x7f).toByte
    assert(MediaCodec.decodePng(bad).isEmpty, "corrupt IDAT must fail its CRC")
    def be32(v: Int) = Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    // unknown filter type 5
    val rawBadFilter = Array[Byte](5, 1, 2)
    val png1 = pngSig ++
      pngChunk("IHDR", be32(2) ++ be32(1) ++ Array[Byte](8, 0, 0, 0, 0)) ++
      pngChunk("IDAT", deflate(rawBadFilter)) ++ pngChunk("IEND", Array.empty[Byte])
    assert(MediaCodec.decodePng(png1).isEmpty, "filter type 5 must be rejected")
    // interlaced flag set
    val png2 = pngSig ++
      pngChunk("IHDR", be32(1) ++ be32(1) ++ Array[Byte](8, 0, 0, 0, 1)) ++
      pngChunk("IDAT", deflate(Array[Byte](0, 9))) ++ pngChunk("IEND", Array.empty[Byte])
    assert(MediaCodec.decodePng(png2).isEmpty, "Adam7 interlace is out of scope → None")
    // 16-bit depth
    val png3 = pngSig ++
      pngChunk("IHDR", be32(1) ++ be32(1) ++ Array[Byte](16, 0, 0, 0, 0)) ++
      pngChunk("IDAT", deflate(Array[Byte](0, 9, 9))) ++ pngChunk("IEND", Array.empty[Byte])
    assert(MediaCodec.decodePng(png3).isEmpty, "16-bit depth is out of scope → None")
  }

  private def greyPal: Array[Byte] = {
    val p = new Array[Byte](768)
    var i = 0
    while (i < 256) { p(3 * i) = i.toByte; p(3 * i + 1) = i.toByte; p(3 * i + 2) = i.toByte; i += 1 }
    p
  }

  test("GIF: exact wire bytes of a tiny image (hand-computed LZW stream)") {
    // indices [1,2,1,2,1]: codes 256,1,2,258,1,257 at 9 bits, LSB-first
    // packing → 00 03 08 10 18 20 20 (derived by hand from the GIF LZW
    // spec; a wrong clear code, width, or packing order changes these)
    val enc = MediaCodec.encodeGif(5, 1, Array[Byte](1, 2, 1, 2, 1), greyPal)
    val hex = enc.map(b => f"${b & 0xff}%02x").mkString
    assert(hex.startsWith("474946383961" + "05000100" + "f7" + "0000"),
      "GIF89a header + LE screen dims + GCT flags")
    val afterPal = hex.drop(2 * (13 + 768))
    assert(afterPal === "2c" + "00000000" + "05000100" + "00" + // image descriptor
      "08" + // LZW min code size
      "07" + "00030810182020" + // one 7-byte sub-block, hand-packed codes
      "00" + "3b")
    val r = MediaCodec.decodeGif(enc).get
    assert(r.w === 5 && r.h === 1)
    assert((0 until 5).map(i => r.rgb(3 * i) & 0xff) === Seq(1, 2, 1, 2, 1))
  }

  test("GIF: round-trips survive width growth, dict reset and multi-sub-block framing") {
    // incompressible pseudo-random indices force the 9→10→11→12 width
    // ladder AND a dictionary reset (≳4096 fresh pairs), and the LZW
    // stream spans many 255-byte sub-blocks
    val n = 16 * 64 * 12 // codec-level test beyond the pipeline's h cap
    val idx = Array.tabulate(n)(i => ((i * 37 + (i * i % 251) + 11) % 256).toByte)
    val enc = MediaCodec.encodeGif(16, n / 16, idx, greyPal)
    assert(enc.length > 255 + 791, "stream must span multiple sub-blocks")
    val r = MediaCodec.decodeGif(enc).get
    assert(r.w === 16 && r.h === n / 16)
    var i = 0
    while (i < n) {
      assert((r.rgb(3 * i) & 0xff) === (idx(i) & 0xff), s"pixel $i")
      i += 1
    }
    // highly repetitive data exercises the cScSc (code == next) path
    val rep = Array.tabulate(2048)(i => (i % 3).toByte)
    val enc2 = MediaCodec.encodeGif(16, 128, rep, greyPal)
    val r2 = MediaCodec.decodeGif(enc2).get
    assert((0 until 2048).forall(i => (r2.rgb(3 * i) & 0xff) === i % 3))
  }

  test("GIF: palette indirection, GIF87a, extension skipping, corrupt rejection") {
    val pal = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      pal(3 * i) = ((i * 7 + 13) % 256).toByte
      pal(3 * i + 1) = ((i * 11 + 29) % 256).toByte
      pal(3 * i + 2) = ((i * 13 + 37) % 256).toByte
      i += 1
    }
    val enc = MediaCodec.encodeGif(4, 1, Array[Byte](0, 1, 2, -1), pal)
    val r = MediaCodec.decodeGif(enc).get
    assert((r.rgb(0) & 0xff, r.rgb(1) & 0xff, r.rgb(2) & 0xff) === ((13, 29, 37)))
    assert((r.rgb(9) & 0xff) === (255 * 7 + 13) % 256, "index 255 resolves through the table")
    // GIF87a signature is accepted; an injected comment extension is skipped
    val v87 = enc.clone(); v87(4) = '7'.toByte
    assert(MediaCodec.decodeGif(v87).isDefined)
    val hdrLen = 13 + 768
    val ext = Array[Byte](0x21, 0xfe.toByte, 3, 'h', 'i', '!', 0)
    val withExt = enc.take(hdrLen) ++ ext ++ enc.drop(hdrLen)
    val re = MediaCodec.decodeGif(withExt).get
    assert((re.rgb(3) & 0xff) === 20, "image after a skipped extension still decodes")
    // truncated sub-block, bad signature, interlace flag → None
    assert(MediaCodec.decodeGif(enc.dropRight(6)).isEmpty)
    val badSig = enc.clone(); badSig(0) = 'X'.toByte
    assert(MediaCodec.decodeGif(badSig).isEmpty)
    val inter = enc.clone(); inter(hdrLen + 9) = 0x40.toByte
    assert(MediaCodec.decodeGif(inter).isEmpty, "interlace is out of scope → None")
  }
}
