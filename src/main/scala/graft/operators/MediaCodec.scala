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

  // ---- PNG (RFC 2083; bit depth 8, color types 0 grey / 2 RGB) ---------

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** `length ∥ type ∥ data ∥ CRC32(type ∥ data)` — the PNG chunk frame. */
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(US_ASCII)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** Paeth predictor (RFC 2083 §6.6): nearest of left/above/upper-left to
    * the linear estimate `a + b − c`, ties a > b > c.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** PNG encoder, bit depth 8, color type 2 (RGB) or 0 (greyscale).
    * Row `y` uses filter type `y % 5` — every filter (None/Sub/Up/
    * Average/Paeth) is on the wire for any image of ≥ 5 rows, so a
    * decoder that mishandles one cannot round-trip. The filtered scanline
    * stream deflates into a zlib stream split across TWO IDAT chunks
    * (multi-IDAT concatenation is part of the format; single-IDAT-only
    * readers are a classic PNG bug).
    */
  def encodePng(w: Int, h: Int, data: Array[Byte], rgb: Boolean): Array[Byte] = {
    val bpp = if (rgb) 3 else 1
    require(data.length >= w * h * bpp, "pixel data shorter than w*h*bpp")
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = data(y * stride + x) & 0xff
        val left = if (x >= bpp) data(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) data((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) data((y - 1) * stride + x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val z = out.toByteArray
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](8, if (rgb) 2 else 0, 0, 0, 0)
    val cut = z.length / 2
    PngSig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", java.util.Arrays.copyOfRange(z, 0, cut)) ++
      chunk("IDAT", java.util.Arrays.copyOfRange(z, cut, z.length)) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** PNG decoder: signature + chunk walk (CRC-verified), IHDR dimension/
    * type gates (bit depth 8, color type 0/2, no interlace), ALL IDAT
    * chunks concatenated then inflated as one zlib stream, and the five
    * scanline filters reversed in place. Greyscale triples into the RGB
    * plane (the WAV convention). None on any malformation — truncated
    * stream, bad CRC, wrong inflated length, unknown filter type.
    */
  def decodePng(bytes: Array[Byte]): Option[Raster] = {
    if (bytes.length < PngSig.length + 12) return None
    var i = 0
    while (i < PngSig.length) {
      if (bytes(i) != PngSig(i)) return None
      i += 1
    }
    var pos = PngSig.length
    var w = 0; var h = 0; var bpp = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend && pos + 12 <= bytes.length) {
      val len = readBe32(bytes, pos)
      if (len < 0 || pos + 12 + len > bytes.length) return None
      val typ = new String(bytes, pos + 4, 4, US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != readBe32(bytes, pos + 8 + len)) return None
      typ match {
        case "IHDR" =>
          if (len != 13 || seenIhdr) return None
          w = readBe32(bytes, pos + 8); h = readBe32(bytes, pos + 12)
          val depth = bytes(pos + 16); val ct = bytes(pos + 17)
          val interlace = bytes(pos + 20)
          if (w <= 0 || h <= 0 || depth != 8 || interlace != 0) return None
          bpp = ct match { case 0 => 1; case 2 => 3; case _ => return None }
          seenIhdr = true
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(bytes, pos + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks skipped
      }
      pos += 12 + len
    }
    if (!seenIhdr || !seenIend) return None
    val stride = w * bpp
    val raw = new Array[Byte]((stride + 1) * h)
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !infl.finished()) {
        val n = infl.inflate(raw, got, raw.length - got)
        if (n == 0 && infl.needsInput()) return None // truncated stream
        got += n
      }
      if (got != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally infl.end()
    // reverse the per-row filters in place on the recon plane
    val recon = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xff
      if (ft > 4) return None
      var x = 0
      while (x < stride) {
        val f = raw(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) recon(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) recon((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) recon((y - 1) * stride + x - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        recon(y * stride + x) = ((f + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    if (bpp == 3) Some(Raster(w, h, recon))
    else {
      val rgb = new Array[Byte](w * h * 3)
      var j = 0
      while (j < w * h) {
        val v = recon(j)
        rgb(3 * j) = v; rgb(3 * j + 1) = v; rgb(3 * j + 2) = v
        j += 1
      }
      Some(Raster(w, h, rgb))
    }
  }

  // ---- GIF (89a; single image, 256-entry global color table, LZW) ------

  /** GIF-variant LZW compression of an 8-bit index stream (min code size
    * 8): variable code width 9→12 growing as the dictionary fills, a
    * Clear code emitted up front and whenever the table reaches 4096
    * (resetting to the 258-entry base), End-of-Information last, codes
    * packed LSB-first.
    */
  private def lzwCompress(data: Array[Byte]): Array[Byte] = {
    val clear = 256; val eoi = 257
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var width = 9
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8; bitCnt -= 8
      }
    }
    var dict = scala.collection.mutable.HashMap[Long, Int]()
    var next = 258
    emit(clear)
    if (data.nonEmpty) {
      var prefix = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = (prefix.toLong << 8) | k
        dict.get(key) match {
          case Some(code) => prefix = code
          case None =>
            emit(prefix)
            dict(key) = next
            next += 1
            if (next - 1 == (1 << width) && width < 12) width += 1
            if (next == 4096) {
              emit(clear)
              dict = scala.collection.mutable.HashMap[Long, Int]()
              next = 258; width = 9
            }
            prefix = k
        }
        i += 1
      }
      emit(prefix)
    }
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-variant LZW decompression — the inverse of [[lzwCompress]]:
    * (prefix-code, last-byte) dictionary entries, the cScSc case (code ==
    * next free slot) handled, width growth and Clear resets mirrored.
    * Returns None on a corrupt code stream.
    */
  private def lzwDecompress(data: Array[Byte], expected: Int): Option[Array[Byte]] = {
    val clear = 256; val eoi = 257
    val out = new java.io.ByteArrayOutputStream(expected)
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    var width = 9
    def read(): Int = {
      while (bitCnt < width && pos < data.length) {
        bitBuf |= (data(pos) & 0xffL) << bitCnt
        pos += 1; bitCnt += 8
      }
      if (bitCnt < width) return -1
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      code
    }
    // entry i ≥ 258: (prefix code, appended byte); first 256 are literals
    val prefixOf = new Array[Int](4096); val byteOf = new Array[Int](4096)
    var next = 258
    def expand(code: Int): Array[Byte] = {
      var c = code; var n = 0
      val buf = new Array[Byte](4096)
      while (c >= 258) { buf(n) = byteOf(c).toByte; n += 1; c = prefixOf(c) }
      buf(n) = c.toByte; n += 1
      val res = new Array[Byte](n)
      var j = 0
      while (j < n) { res(j) = buf(n - 1 - j); j += 1 }
      res
    }
    var prev = -1
    var code = read()
    while (code != eoi) {
      if (code < 0 || code > next || code == next && prev < 0) return None
      if (code == clear) { next = 258; width = 9; prev = -1 }
      else if (prev < 0) {
        if (code >= 258) return None
        out.write(code); prev = code
      } else {
        val seq =
          if (code < next) expand(code)
          else expand(prev) :+ expand(prev)(0) // cScSc: code == next
        out.write(seq, 0, seq.length)
        // the decoder trails the encoder's dictionary by one entry, so
        // its width bump fires one entry EARLY relative to the encoder's
        // (encoder: after creating entry 2^w; decoder: when next reaches
        // 2^w) — the classic GIF "early change" synchronization
        if (next < 4096) {
          prefixOf(next) = prev; byteOf(next) = seq(0) & 0xff
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
      code = read()
    }
    Some(out.toByteArray)
  }

  /** GIF89a encoder: header + logical screen descriptor with a 256-entry
    * global color table, one image descriptor (no interlace, no local
    * table), the LZW stream framed in ≤255-byte sub-blocks, trailer.
    * `indices` are row-major top-down palette indices; `palette` is
    * 256·3 RGB bytes.
    */
  def encodeGif(w: Int, h: Int, indices: Array[Byte],
      palette: Array[Byte]): Array[Byte] = {
    require(palette.length == 768, "GIF global color table must be 256*3 bytes")
    val out = new java.io.ByteArrayOutputStream(791 + indices.length)
    out.write("GIF89a".getBytes(US_ASCII))
    out.write(le16(w)); out.write(le16(h))
    out.write(0xf7) // GCT present, color res 8, GCT size 2^(7+1)=256
    out.write(0); out.write(0) // background index, aspect
    out.write(palette)
    out.write(0x2c) // image descriptor
    out.write(le16(0)); out.write(le16(0)) // left, top
    out.write(le16(w)); out.write(le16(h))
    out.write(0) // no local table, no interlace
    out.write(8) // LZW minimum code size
    val lzw = lzwCompress(indices)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF decoder: 87a/89a signature, screen descriptor + global color
    * table walk, extension blocks skipped by their sub-block framing, the
    * first image descriptor's LZW stream reassembled from its sub-blocks
    * and decompressed, indices resolved through the color table into an
    * RGB [[Raster]]. Interlaced images and local color tables are
    * rejected (None), as is any truncated or over/under-full pixel
    * stream.
    */
  def decodeGif(bytes: Array[Byte]): Option[Raster] = {
    if (bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, US_ASCII)
    if (sig != "GIF89a" && sig != "GIF87a") return None
    var pos = 6
    val sw = readLe16(bytes, pos); val sh = readLe16(bytes, pos + 2)
    val flags = bytes(pos + 4) & 0xff
    pos += 7
    var palette: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 3 * (1 << ((flags & 7) + 1))
      if (pos + n > bytes.length) return None
      palette = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
    }
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: label byte then sub-blocks to a 0 byte
          pos += 2
          while (pos < bytes.length && (bytes(pos) & 0xff) != 0)
            pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x2c =>
          if (pos + 10 > bytes.length) return None
          val iw = readLe16(bytes, pos + 5); val ih = readLe16(bytes, pos + 7)
          val iflags = bytes(pos + 9) & 0xff
          pos += 10
          if ((iflags & 0xc0) != 0) return None // local table / interlace
          if (palette == null || iw <= 0 || ih <= 0 ||
            iw > sw || ih > sh) return None
          if (pos >= bytes.length) return None
          val minCode = bytes(pos) & 0xff
          if (minCode != 8) return None
          pos += 1
          val lzw = new java.io.ByteArrayOutputStream()
          var bs = if (pos < bytes.length) bytes(pos) & 0xff else -1
          while (bs > 0) {
            if (pos + 1 + bs > bytes.length) return None
            lzw.write(bytes, pos + 1, bs)
            pos += 1 + bs
            bs = if (pos < bytes.length) bytes(pos) & 0xff else -1
          }
          if (bs != 0) return None
          return lzwDecompress(lzw.toByteArray, iw * ih).flatMap { idx =>
            if (idx.length != iw * ih) None
            else {
              val rgb = new Array[Byte](iw * ih * 3)
              var i = 0
              while (i < idx.length) {
                val p = 3 * (idx(i) & 0xff)
                if (p + 2 >= palette.length) return None
                rgb(3 * i) = palette(p)
                rgb(3 * i + 1) = palette(p + 1)
                rgb(3 * i + 2) = palette(p + 2)
                i += 1
              }
              Some(Raster(iw, ih, rgb))
            }
          }
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }
}
