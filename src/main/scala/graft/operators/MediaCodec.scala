package graft.operators

import java.nio.charset.StandardCharsets.US_ASCII

/** Decoded pixel/sample plane: row-major top-down RGB, 3 bytes per pixel
  * (audio decodes as a 1-row plane with each sample tripled).
  */
case class Raster(w: Int, h: Int, rgb: Array[Byte])

/** Pure-JVM codecs for the multimodal pipeline: PPM (P6, binary, maxval
  * 255), BMP (uncompressed 24-bit, bottom-up or top-down, padded rows) and
  * WAV (RIFF PCM 8-bit mono, proper chunk walking). These are REAL
  * decoders — header tokenization, dimension/offset fields, row padding,
  * bottom-up row order and BGR→RGB conversion are all parsed from the
  * bytes, not assumed — replacing the md5 decode stub the container's
  * missing image libraries previously forced (the reference treats media
  * payloads as opaque blobs; a training pipeline must not).
  *
  * Every decoder returns None on malformed input instead of throwing: a
  * 100 TB corpus always contains truncated/corrupt payloads and one bad
  * blob must not kill a 1000-executor stage.
  */
object MediaCodec {

  // ---- little-endian helpers -------------------------------------------

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  // ---- PPM (P6) ----------------------------------------------------------

  /** `P6\n<w> <h>\n255\n` + row-major RGB triples. */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length >= w * h * 3, "pixel data shorter than w*h*3")
    s"P6\n$w $h\n255\n".getBytes(US_ASCII) ++ rgb.take(w * h * 3)
  }

  /** Tokenizing P6 parser: arbitrary whitespace between header fields,
    * `#` comments to end-of-line (the netpbm spec), exactly ONE whitespace
    * byte after maxval before the pixel plane.
    */
  def decodePpm(bytes: Array[Byte]): Option[Raster] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    // next header integer, skipping whitespace and # comments
    def nextInt(): Option[Int] = {
      while (pos < bytes.length && (isWs(bytes(pos)) || bytes(pos) == '#')) {
        if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      var v = 0L
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0')
        if (v > Int.MaxValue) return None
        any = true
        pos += 1
      }
      if (any) Some(v.toInt) else None
    }
    for {
      w <- nextInt()
      h <- nextInt()
      maxval <- nextInt()
      if w > 0 && h > 0 && maxval == 255
      if pos < bytes.length && isWs(bytes(pos)) // the single post-maxval ws
      data = pos + 1
      if bytes.length - data >= w * h * 3
    } yield Raster(w, h, java.util.Arrays.copyOfRange(bytes, data, data + w * h * 3))
  }

  // ---- BMP (24 bpp, BITMAPINFOHEADER) -------------------------------------

  /** Rows padded to 4 bytes, stored bottom-up in BGR order (the standard
    * positive-height layout).
    */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length >= w * h * 3, "pixel data shorter than w*h*3")
    val rowSize = ((w * 3 + 3) / 4) * 4
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    le32(54 + dataSize).copyToArray(out, 2)
    le32(54).copyToArray(out, 10) // pixel data offset
    le32(40).copyToArray(out, 14) // BITMAPINFOHEADER size
    le32(w).copyToArray(out, 18)
    le32(h).copyToArray(out, 22) // positive = bottom-up
    le16(1).copyToArray(out, 26) // planes
    le16(24).copyToArray(out, 28) // bpp
    le32(dataSize).copyToArray(out, 34)
    var y = 0
    while (y < h) {
      val dstRow = 54 + (h - 1 - y) * rowSize // bottom-up
      var x = 0
      while (x < w) {
        val src = (y * w + x) * 3
        out(dstRow + x * 3) = rgb(src + 2)     // B
        out(dstRow + x * 3 + 1) = rgb(src + 1) // G
        out(dstRow + x * 3 + 2) = rgb(src)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parses the header fields it relies on (data offset, dimensions, bpp,
    * compression), honors negative biHeight (top-down) and row padding,
    * converts BGR back to row-major top-down RGB.
    */
  def decodeBmp(bytes: Array[Byte]): Option[Raster] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOff = readLe32(bytes, 10)
    val w = readLe32(bytes, 18)
    val hRaw = readLe32(bytes, 22)
    val bpp = readLe16(bytes, 28)
    val compression = readLe32(bytes, 30)
    if (w <= 0 || hRaw == 0 || bpp != 24 || compression != 0) return None
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (dataOff < 54 || bytes.length.toLong < dataOff.toLong + rowSize.toLong * h)
      return None
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOff + (if (topDown) y else h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val dst = (y * w + x) * 3
        rgb(dst) = bytes(srcRow + x * 3 + 2)     // R
        rgb(dst + 1) = bytes(srcRow + x * 3 + 1) // G
        rgb(dst + 2) = bytes(srcRow + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Some(Raster(w, h, rgb))
  }

  // ---- WAV (RIFF PCM, 8-bit mono) -----------------------------------------

  /** Canonical 44-byte RIFF/WAVE header + unsigned 8-bit samples. */
  def encodeWav(samples: Array[Byte]): Array[Byte] = {
    val n = samples.length
    "RIFF".getBytes(US_ASCII) ++ le32(36 + n) ++ "WAVE".getBytes(US_ASCII) ++
      "fmt ".getBytes(US_ASCII) ++ le32(16) ++
      le16(1) ++ le16(1) ++ // PCM, mono
      le32(8000) ++ le32(8000) ++ // sample rate, byte rate
      le16(1) ++ le16(8) ++ // block align, bits per sample
      "data".getBytes(US_ASCII) ++ le32(n) ++ samples
  }

  /** Walks RIFF chunks (arbitrary chunks may precede `data`), requires a
    * PCM 8-bit mono `fmt ` chunk, returns the samples as a 1-row plane
    * with each sample tripled to RGB.
    */
  def decodeWav(bytes: Array[Byte]): Option[Raster] = {
    if (bytes.length < 12) return None
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')) return None
    var pos = 12
    var fmtOk = false
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, US_ASCII)
      val size = readLe32(bytes, pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      if (id == "fmt ") {
        if (size < 16) return None
        val audioFormat = readLe16(bytes, pos + 8)
        val channels = readLe16(bytes, pos + 10)
        val bits = readLe16(bytes, pos + 22)
        fmtOk = audioFormat == 1 && channels == 1 && bits == 8
      } else if (id == "data") {
        if (!fmtOk || size == 0) return None
        val rgb = new Array[Byte](size * 3)
        var i = 0
        while (i < size) {
          val s = bytes(pos + 8 + i)
          rgb(3 * i) = s; rgb(3 * i + 1) = s; rgb(3 * i + 2) = s
          i += 1
        }
        return Some(Raster(size, 1, rgb))
      }
      pos += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    None
  }
}
