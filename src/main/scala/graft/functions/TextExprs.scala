package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.nio.charset.StandardCharsets

/** Text-pipeline kernels callable from generated code. */
object TextKernels {

  /** Banded Levenshtein at the NEAR-DUP BOUND — edit distance between
    * two strings, computed only when it can be ≤ k = (20·max(la,lb))
    * div 100 (the 20 % duplicate threshold), else −1. Two exact
    * shortcuts make LSH-candidate verification cheap: (1) COMMON
    * PREFIX/SUFFIX TRIM — edit distance is invariant under shared
    * ends, and near-dup pairs (the candidates LSH surfaces) share
    * almost everything, so the DP runs on the small differing middle;
    * (2) the UKKONEN BAND — only the 2k+1 diagonal is filled, with an
    * early exit when a whole row exceeds k. Cost per pair
    * O(k·middle) instead of O(la·lb); a length gap > k returns −1
    * with no DP at all. Works on Unicode code units (the corpus is
    * ASCII; semantics match java-level char edit distance).
    */
  def levBand(sa: String, sb: String): Int = {
    val la0 = sa.length; val lb0 = sb.length
    val k = (20 * math.max(la0, lb0)) / 100
    if (math.abs(la0 - lb0) > k) return -1
    // trim common prefix/suffix (edit-distance invariant)
    var p = 0
    val minL = math.min(la0, lb0)
    while (p < minL && sa.charAt(p) == sb.charAt(p)) p += 1
    var qa = la0; var qb = lb0
    while (qa > p && qb > p && sa.charAt(qa - 1) == sb.charAt(qb - 1)) {
      qa -= 1; qb -= 1
    }
    val la = qa - p; val lb = qb - p
    if (la == 0) return if (lb <= k) lb else -1
    if (lb == 0) return if (la <= k) la else -1
    // ASCII middles (the corpus) take the bit-parallel path: 64 DP cells
    // per word op vs one per char op in the banded DP — the shorter middle
    // is the pattern so the block count is minimal. Non-ASCII falls back
    // to the banded DP (identical result, spec-pinned).
    var ascii = true
    var t = p
    while (ascii && t < qa) { if (sa.charAt(t) >= 128) ascii = false; t += 1 }
    t = p
    while (ascii && t < qb) { if (sb.charAt(t) >= 128) ascii = false; t += 1 }
    if (ascii) {
      if (la <= lb) levMyersAscii(sa, p, la, sb, p, lb, k)
      else levMyersAscii(sb, p, lb, sa, p, la, k)
    } else levBandDp(sa, sb, p, la, lb, k)
  }

  /** Myers' bit-parallel edit distance (Myers 1999 bit-vector algorithm;
    * multi-word block chaining per Hyyrö 2003 / the edlib formulation) at
    * the same near-dup bound as [[levBand]]: exact distance when ≤ k, −1
    * past it. Pattern `a` (the SHORTER middle, offset `ap`, length m) is
    * encoded once into per-block match masks; each text column then costs
    * ⌈m/64⌉ word ops — 64 DP cells per op. Early exit when even a
    * match-only tail cannot bring the bottom-row score back within k.
    * ASCII only (dense 128-entry Peq table); callers pre-check.
    */
  private def levMyersAscii(a: String, ap: Int, m: Int,
      b: String, bp: Int, n: Int, k: Int): Int = {
    val nb = (m + 63) >>> 6
    val peq = new Array[Long](128 * nb)
    var i = 0
    while (i < m) {
      peq(a.charAt(ap + i) * nb + (i >>> 6)) |= 1L << (i & 63)
      i += 1
    }
    val vp = new Array[Long](nb)
    val vn = new Array[Long](nb)
    java.util.Arrays.fill(vp, -1L)
    val lastMask = 1L << ((m - 1) & 63)
    var score = m
    var j = 0
    while (j < n) {
      val c = b.charAt(bp + j)
      var hin = 1 // row-0 boundary: D[0][j] − D[0][j−1] = +1
      var r = 0
      while (r < nb) {
        val eq0 = peq(c * nb + r)
        val pv = vp(r); val mv = vn(r)
        val xv = eq0 | mv
        val eq = if (hin < 0) eq0 | 1L else eq0
        val xh = (((eq & pv) + pv) ^ pv) | eq
        var ph = mv | ~(xh | pv)
        var mh = pv & xh
        // delta leaving the block: top bit chains into the next block;
        // the LAST block reads the pattern's true bottom row instead
        val mask = if (r == nb - 1) lastMask else Long.MinValue
        val hout = if ((ph & mask) != 0L) 1 else if ((mh & mask) != 0L) -1 else 0
        ph = (ph << 1) | (if (hin > 0) 1L else 0L)
        mh = (mh << 1) | (if (hin < 0) 1L else 0L)
        vp(r) = mh | ~(xv | ph)
        vn(r) = ph & xv
        hin = hout
        r += 1
      }
      score += hin
      j += 1
      // remaining columns can each lower the bottom-row score by ≤ 1
      if (score - (n - j) > k) return -1
    }
    if (score <= k) score else -1
  }

  /** The banded-DP fallback (Ukkonen 2k+1 band over the trimmed middle) —
    * kept for non-ASCII middles and as the bit-parallel path's independent
    * twin in the parity spec.
    */
  private[functions] def levBandDp(sa: String, sb: String, p: Int,
      la: Int, lb: Int, k: Int): Int = {
    // banded DP over the trimmed middle: rows = a, band of width 2k+1
    val prev = new Array[Int](lb + 1)
    val cur = new Array[Int](lb + 1)
    val INF = k + 1
    var j = 0
    while (j <= lb) { prev(j) = if (j <= k) j else INF; j += 1 }
    var i = 1
    while (i <= la) {
      val from = math.max(1, i - k)
      val to = math.min(lb, i + k)
      cur(0) = if (i <= k) i else INF
      if (from > 1) cur(from - 1) = INF
      var best = INF
      j = from
      val ca = sa.charAt(p + i - 1)
      while (j <= to) {
        val sub = prev(j - 1) + (if (ca == sb.charAt(p + j - 1)) 0 else 1)
        val del = if (prev(j) < INF) prev(j) + 1 else INF
        val ins = if (j > from && cur(j - 1) < INF) cur(j - 1) + 1 else INF
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        if (v > INF) v = INF
        cur(j) = v
        if (v < best) best = v
        j += 1
      }
      if (to < lb) cur(to + 1) = INF
      if (best >= INF) return -1
      System.arraycopy(cur, 0, prev, 0, lb + 1)
      i += 1
    }
    if (prev(lb) <= k) prev(lb) else -1
  }

  /** 16-bit average-hash over an opaque byte payload — the perceptual-hash
    * shape (aHash) on the byte plane: byte q belongs to window
    * w = q*16/len, and bit w sets when the window's byte mean exceeds the
    * global mean (integer cross-multiplied: sum_w * len > total * n_w —
    * no division, no ties beyond exact equality, which clears the bit in
    * both engines). One pass, codegen-friendly.
    */
  def aHash16(payload: Array[Byte]): Int = {
    val n = payload.length
    if (n == 0) return 0
    val sums = new Array[Long](16)
    val counts = new Array[Long](16)
    var total = 0L
    var q = 0
    while (q < n) {
      val w = (q.toLong * 16 / n).toInt
      val b = (payload(q) & 0xff).toLong
      sums(w) += b
      counts(w) += 1
      total += b
      q += 1
    }
    var h = 0
    var w = 0
    while (w < 16) {
      if (counts(w) > 0 && sums(w) * n > total * counts(w)) h |= (1 << w)
      w += 1
    }
    h
  }

  /** 16-bucket byte-value histogram (`byte div 16` — 4-bit luma
    * quantization) over an opaque payload, one O(n) pass. Returns the
    * raw counts; downstream summarization stays on the bounded 16-entry
    * array, so the per-byte work never leaves the scan.
    */
  def bhist16(payload: Array[Byte]): Array[Long] = {
    val counts = new Array[Long](16)
    var q = 0
    while (q < payload.length) {
      counts((payload(q) & 0xff) >>> 4) += 1
      q += 1
    }
    counts
  }

  /** 64-bit variant of [[aHash16]] for Hamming-banded near-dup joins: 16
    * bits give only 16 band values per 4-bit band — every bucket saturates
    * past a few thousand rows — while 64 bits band into 4×16-bit keys
    * (65 536 values each), keeping bucket occupancy ~n/65536 per band at
    * any corpus size. Same integer cross-multiplied window rule; windows
    * beyond the payload length (n < 64) stay clear in both engines.
    */
  def aHash64(payload: Array[Byte]): Long = {
    val n = payload.length
    if (n == 0) return 0L
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var total = 0L
    var q = 0
    while (q < n) {
      val w = (q.toLong * 64 / n).toInt
      val b = (payload(q) & 0xff).toLong
      sums(w) += b
      counts(w) += 1
      total += b
      q += 1
    }
    var h = 0L
    var w = 0
    while (w < 64) {
      if (counts(w) > 0 && sums(w) * n > total * counts(w)) h |= (1L << w)
      w += 1
    }
    h
  }

  /** Distinct word-trigram array of a document in ONE pass — the codegen
    * replacement for `array_distinct(transform(sequence(...), i ->
    * array_join(slice(split(text, ' '), i, 3), ' ')))`: higher-order
    * functions run interpreted (no whole-stage codegen), and the chain
    * costs ~3× this kernel on the gram-heavy decontamination keys.
    * Semantics are bit-equal to the expression it replaces: split on
    * single spaces KEEPING empty fields (Java split limit −1 ==
    * Spark `split` == DuckDB `string_split`), trigrams joined by ' ',
    * de-duplicated keeping first occurrence (== `array_distinct`).
    */
  def wordGrams3(text: UTF8String): Array[UTF8String] = {
    val w = text.toString.split(" ", -1)
    if (w.length < 3) return Array.empty
    val seen = new java.util.LinkedHashSet[String](w.length * 2)
    var i = 0
    while (i + 2 < w.length) {
      seen.add(w(i) + " " + w(i + 1) + " " + w(i + 2))
      i += 1
    }
    val out = new Array[UTF8String](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    out
  }

  /** Repetition-signal counts of a document in ONE pass:
    * [n_tokens, n_distinct, n_grams, n_gram_distinct, top_tok_n] over
    * the non-empty space-split tokens. Replaces an expression chain
    * whose `top_tok_n` (`array_max(transform(distinct, t ->
    * size(filter(toks, eq))))`) is O(distinct × tokens) per document —
    * quadratic in doc length, and interpreted (HOF) on top; the hash
    * counting here is O(tokens).
    */
  def repStats(text: UTF8String): Array[Long] = {
    val parts = text.toString.split(" ", -1)
    val toks = new java.util.ArrayList[String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) toks.add(parts(i))
      i += 1
    }
    val n = toks.size
    val counts = new java.util.HashMap[String, Long](n * 2)
    var top = 0L
    i = 0
    while (i < n) {
      val c = counts.getOrDefault(toks.get(i), 0L) + 1L
      counts.put(toks.get(i), c)
      if (c > top) top = c
      i += 1
    }
    var nGrams = 0L
    val gramSet = new java.util.HashSet[String]()
    if (n >= 3) {
      nGrams = (n - 2).toLong
      i = 0
      while (i + 2 < n) {
        gramSet.add(toks.get(i) + " " + toks.get(i + 1) + " " + toks.get(i + 2))
        i += 1
      }
    }
    Array(n.toLong, counts.size.toLong, nGrams, gramSet.size.toLong, top)
  }

  /** TTR lexical-diversity counts in ONE pass:
    * [n_tokens, n_types, n_hapax] over the non-empty space-split tokens
    * — replaces an `array_sort` + `aggregate` HOF chain (interpreted,
    * O(L log L) with per-element `element_at` overhead) with O(L) hash
    * counting inside whole-stage codegen.
    */
  def ttrStats(text: UTF8String): Array[Long] = {
    val parts = text.toString.split(" ", -1)
    val counts = new java.util.HashMap[String, Long](parts.length * 2)
    var n = 0L
    var i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) {
        n += 1
        counts.put(parts(i), counts.getOrDefault(parts(i), 0L) + 1L)
      }
      i += 1
    }
    var hapax = 0L
    val it = counts.values().iterator()
    while (it.hasNext) if (it.next() == 1L) hapax += 1
    Array(n, counts.size.toLong, hapax)
  }

  /** Distinct word-trigram array over the NON-EMPTY tokens, replicating
    * `array_distinct(transform(sequence(0, greatest(n-3, 0)), i ->
    * concat_ws(' ', get(toks,i), get(toks,i+1), get(toks,i+2))))`
    * bit-for-bit — including its short-doc quirk: fewer than 3 tokens
    * still emit ONE partial gram (concat_ws skips the missing slots;
    * zero tokens emit the empty string). Used by the n-gram Jaccard
    * verifier, whose oracle replays exactly these semantics.
    */
  def jointGrams3(text: UTF8String): Array[UTF8String] = {
    val parts = text.toString.split(" ", -1)
    val toks = new java.util.ArrayList[String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) toks.add(parts(i))
      i += 1
    }
    val n = toks.size
    val m = math.max(n - 3, 0)
    val seen = new java.util.LinkedHashSet[String](2 * (m + 1))
    i = 0
    while (i <= m) {
      val sb = new java.lang.StringBuilder
      var j = i
      var first = true
      while (j < math.min(i + 3, n)) {
        if (!first) sb.append(' ')
        sb.append(toks.get(j))
        first = false
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[UTF8String](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    out
  }

  /** Per-model language-ID scores in ONE pass: token weights summed onto
    * the model priors via a single hash probe per token (the weight
    * vector holds all models), where the expression form folds the token
    * array once PER MODEL through an interpreted `aggregate` HOF. The
    * weight table is the same [[graft.operators.TextOps.Models]] data the
    * oracle CASE chains replay.
    */
  private lazy val langIdx: (Array[Long], java.util.HashMap[String, Array[Long]]) = {
    val models = graft.operators.TextOps.Models
    val priors = models.map(_._2._1).toArray
    val idx = new java.util.HashMap[String, Array[Long]]()
    for (((_, (_, ws)), m) <- models.zipWithIndex; (w, v) <- ws) {
      val arr = idx.computeIfAbsent(w, _ => new Array[Long](models.size))
      arr(m) = v.toLong
    }
    (priors, idx)
  }

  def langScores(text: UTF8String): Array[Long] = {
    val (priors, idx) = langIdx
    val out = priors.clone()
    val parts = text.toString.split(" ", -1)
    var i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) {
        val w = idx.get(parts(i))
        if (w != null) {
          var m = 0
          while (m < out.length) { out(m) += w(m); m += 1 }
        }
      }
      i += 1
    }
    out
  }

  /** Per-document adjacent-char-pair counts (the BPE statistics unit),
    * pre-aggregated into a map in ONE pass: pairs are drawn inside each
    * non-empty space-split token (character-based, multibyte-safe), so
    * the corpus-wide count becomes Σ over doc maps — the scan emits one
    * row per DISTINCT pair per doc instead of one per pair occurrence,
    * and skips the double explode + interpreted transform it replaces.
    */
  def bpePairCounts(text: UTF8String): (Array[UTF8String], Array[Long]) = {
    val parts = text.toString.split(" ", -1)
    val counts = new java.util.LinkedHashMap[String, Long]()
    var i = 0
    while (i < parts.length) {
      val t = parts(i)
      // pairs over CODE POINTS, like Spark's length()/substring(t, i, 2)
      val cp = t.codePointCount(0, t.length)
      if (cp >= 2) {
        var start = 0
        var j = 0
        while (j + 1 < cp) {
          val end2 = t.offsetByCodePoints(start, 2)
          val pair = t.substring(start, end2)
          counts.put(pair, counts.getOrDefault(pair, 0L) + 1L)
          start = t.offsetByCodePoints(start, 1)
          j += 1
        }
      }
      i += 1
    }
    val keys = new Array[UTF8String](counts.size)
    val vals = new Array[Long](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue
      k += 1
    }
    (keys, vals)
  }

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** First 48 bits of md5(key) as a non-negative long — the value of
    * `CAST(('0x' || substr(md5(g), 1, 12)) AS BIGINT)` without the hex
    * string round-trip (`conv` parses a string per row; this reads the
    * digest bytes directly). The bloom-gate keyHash.
    */
  def md5Head48(key: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(key.getBytes)
    ((h(0) & 0xffL) << 40) | ((h(1) & 0xffL) << 32) | ((h(2) & 0xffL) << 24) |
      ((h(3) & 0xffL) << 16) | ((h(4) & 0xffL) << 8) | (h(5) & 0xffL)
  }

  /** Bloom position j of a 48-bit key hash in a `bits`-wide bitmap — the
    * shared double-hash family (Sketches constants), identical to the
    * Column form in Dedup.bloomPos and the oracle's SQL expansion.
    * `(h % FoldP) ≤ 9.5e7` times `KnuthA + 2j + 1 ≤ 2.7e9` stays inside a
    * long.
    */
  def bloomPos(j: Int, h: Long, bits: Long): Long =
    (((h % graft.operators.Sketches.FoldP) *
      (graft.operators.Sketches.KnuthA + 2 * j + 1) +
      graft.operators.Sketches.HashB * (j + 1)) %
      graft.operators.Sketches.HashP) % bits

  /** Decontamination statistics of ONE document in ONE pass:
    * `[n_grams, n_bloom_hits, n_true_hits]` of its distinct word-trigram
    * set (same gram definition as [[wordGrams3]]) against a benchmark
    * artifact (k=4 Bloom bitmap + the exact gram set, sorted for binary
    * search). This is the scan-side form of the `dedup_bloom`
    * explode→probe→join→groupBy pipeline: split, dedup, bitmap gate (no
    * false negatives) and the O(log |bench|) exact check for
    * bloom-positive grams all fuse into one kernel call — no
    * intermediate gram array, no exchange — so a composed curation plan
    * gets the per-doc contamination verdict at tokenization cost.
    */
  def deconStats(text: UTF8String, bits: Long, bitmap: Array[Long],
      bench: Array[AnyRef]): Array[Long] = {
    val w = text.toString.split(" ", -1)
    if (w.length < 3) return Array(0L, 0L, 0L)
    val seen = new java.util.HashSet[String](w.length * 2)
    var n = 0L
    var bloom = 0L
    var tru = 0L
    var i = 0
    while (i + 2 < w.length) {
      val g = w(i) + " " + w(i + 1) + " " + w(i + 2)
      if (seen.add(g)) {
        n += 1
        val gu = UTF8String.fromString(g)
        val h = md5Head48(gu)
        var maybe = true
        var j = 0
        while (maybe && j < 4) {
          val p = bloomPos(j, h, bits)
          maybe = (bitmap((p >> 6).toInt) & (1L << (p & 63).toInt)) != 0
          j += 1
        }
        if (maybe) {
          bloom += 1
          if (java.util.Arrays.binarySearch(bench, gu) >= 0) tru += 1
        }
      }
      i += 1
    }
    Array(n, bloom, tru)
  }

  private val saltBytes: Array[Array[Byte]] =
    (0 until 8).map(j => s"|$j".getBytes(StandardCharsets.UTF_8)).toArray

  private def lessUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def toHexUtf8(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** One-pass 8-way MinHash over 5-char shingles (see Minhash8). */
  def minhash8(text: String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val digest = md.get()
    val n = text.length
    val count = math.max(n - 4, 1)
    val mins = new Array[Array[Byte]](8)
    var i = 0
    while (i < count) {
      val shingle = text.substring(i, math.min(i + 5, n))
      val base = shingle.getBytes(StandardCharsets.UTF_8)
      var j = 0
      while (j < 8) {
        digest.reset()
        digest.update(base)
        digest.update(saltBytes(j))
        val d = digest.digest()
        if (mins(j) == null || lessUnsigned(d, mins(j))) mins(j) = d
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(toHexUtf8(_).asInstanceOf[Any]))
  }

  /** Rolling-hash parameters: byte-wise Karp–Rabin, window 8, base 257,
    * modulus 1e9+7. `RollPow(k)` = 257^k mod M — shared by the kernel and
    * the oracle SQL so both engines run identical modular arithmetic
    * (every intermediate fits a signed 64-bit: 255 · (1e9+7) · 8 < 2^63).
    */
  val RollMod = 1000000007L
  val RollWindow = 8
  val RollPow: Array[Long] = {
    val p = new Array[Long](RollWindow)
    p(0) = 1L
    var i = 1
    while (i < RollWindow) { p(i) = p(i - 1) * 257L % RollMod; i += 1 }
    p
  }

  /** CDC cut mask: a cut fires when the 8-byte window hash ≡ 0 (mod 64)
    * — expected chunk ≈ 64 bytes. Shared by [[cdcCuts]] and the
    * `dedup_cdc` oracle.
    */
  val CdcMask = 64L

  /** Content-defined chunk CUT POSITIONS (Karp–Rabin gear, the
    * rsync/LBFS/FastCDC primitive): byte offsets where a new chunk
    * starts — the byte AFTER any 8-byte window whose rolling hash ≡ 0
    * (mod [[CdcMask]]). Cut placement depends only on local CONTENT, so
    * an insertion resynchronizes after one window instead of shifting
    * every later boundary (the property fixed-stride passage hashing
    * lacks). Pure cut rule, no min/max chunk bound — FastCDC's bounds
    * are a latency refinement, not part of the portable core. One O(n)
    * pass per document; cuts strictly inside (0, n) so no empty chunk
    * exists at either end.
    */
  def cdcCuts(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    if (n >= RollWindow) {
      var h = 0L
      var i = 0
      while (i < RollWindow) { h = (h * 257L + (bytes(i) & 0xffL)) % RollMod; i += 1 }
      if (h % CdcMask == 0L && RollWindow < n) out += RollWindow.toLong
      val outPow = RollPow(RollWindow - 1)
      var w = 1
      val last = n - RollWindow
      while (w <= last) {
        h = ((h - (bytes(w - 1) & 0xffL) * outPow) % RollMod + RollMod) % RollMod
        h = (h * 257L + (bytes(w + RollWindow - 1) & 0xffL)) % RollMod
        val c = w + RollWindow
        if (h % CdcMask == 0L && c < n) out += c.toLong
        w += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Karp–Rabin rolling fingerprint over the UTF-8 bytes of `text`:
    * hash every 8-byte window in one O(n) pass (subtract the outgoing
    * byte's 257^7 term, multiply, add the incoming byte), track the
    * minimum hash and its first byte offset — the winnowing-style
    * content fingerprint (Schleimer et al., SIGMOD'03) used for local
    * document fingerprinting. Returns [fp_min, fp_pos, n_windows];
    * documents shorter than one window yield [-1, -1, 0].
    */
  def rollHash(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < RollWindow)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](-1L, -1L, 0L))
    var h = 0L
    var i = 0
    while (i < RollWindow) { h = (h * 257L + (bytes(i) & 0xffL)) % RollMod; i += 1 }
    var minH = h
    var minPos = 0L
    val outPow = RollPow(RollWindow - 1)
    var w = 1
    val last = n - RollWindow
    while (w <= last) {
      h = ((h - (bytes(w - 1) & 0xffL) * outPow) % RollMod + RollMod) % RollMod
      h = (h * 257L + (bytes(w + RollWindow - 1) & 0xffL)) % RollMod
      if (h < minH) { minH = h; minPos = w.toLong }
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](minH, minPos, (last + 1).toLong))
  }

  /** 0-mod-p fingerprint sampling rate for [[rollFps]]: a window hash is a
    * selected fingerprint when `hv % FpSample == 0` — the deterministic
    * winnowing variant (Manber's mod-p sampling) both engines can replay
    * exactly, selecting ~1/16 of windows.
    */
  val FpSample = 16L

  /** Sampled Karp–Rabin fingerprint SET of `text`: every 8-byte window
    * hash (same recurrence as [[rollHash]]) with `hv % FpSample == 0`,
    * distinct and ascending. Two documents sharing a byte span ≥ 8+15
    * share its sampled fingerprints, so joining on these values finds
    * shared-substring pairs without comparing documents pairwise. One
    * O(n) pass; output is bounded by n/FpSample on random text.
    */
  def rollFps(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (n >= RollWindow) {
      var h = 0L
      var i = 0
      while (i < RollWindow) { h = (h * 257L + (bytes(i) & 0xffL)) % RollMod; i += 1 }
      if (h % FpSample == 0L) sel.add(h)
      val outPow = RollPow(RollWindow - 1)
      var w = 1
      val last = n - RollWindow
      while (w <= last) {
        h = ((h - (bytes(w - 1) & 0xffL) * outPow) % RollMod + RollMod) % RollMod
        h = (h * 257L + (bytes(w + RollWindow - 1) & 0xffL)) % RollMod
        if (h % FpSample == 0L) sel.add(h)
        w += 1
      }
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Winnowing guarantee window: every run of `WinnowW` consecutive window
    * hashes contributes at least one selected fingerprint (Schleimer et
    * al., SIGMOD'03, §4 — the t = k + w − 1 guarantee threshold). Shared
    * by [[winnow]] and the `text_winnowing` oracle.
    */
  val WinnowW = 4

  /** Winnowing fingerprint selection (Schleimer et al., SIGMOD'03): hash
    * every `RollWindow`-byte window (the [[rollHash]] recurrence), slide a
    * `WinnowW`-wide window over the hash sequence, and in each select the
    * minimum hash, rightmost position on ties (the paper's robust-winnowing
    * tie rule) — positions selected by several windows count once. Unlike
    * [[rollFps]]'s mod-p sampling, winnowing GUARANTEES a fingerprint in
    * every `WinnowW` consecutive hashes (no unlucky gap a match can hide
    * in), at density ~2/(w+1). One O(n·w) pass per document, w = 4.
    * Returns [n_windows, n_selected, fp_sum] where fp_sum is the exact
    * integer sum of the selected hash values (each < 1e9+7, so the sum is
    * overflow-free for any realistic document).
    */
  def winnow(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n < RollWindow)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](0L, 0L, 0L))
    val nH = n - RollWindow + 1
    val hs = new Array[Long](nH)
    var h = 0L
    var i = 0
    while (i < RollWindow) { h = (h * 257L + (bytes(i) & 0xffL)) % RollMod; i += 1 }
    hs(0) = h
    val outPow = RollPow(RollWindow - 1)
    var w = 1
    while (w < nH) {
      h = ((h - (bytes(w - 1) & 0xffL) * outPow) % RollMod + RollMod) % RollMod
      h = (h * 257L + (bytes(w + RollWindow - 1) & 0xffL)) % RollMod
      hs(w) = h
      w += 1
    }
    if (nH < WinnowW)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](nH.toLong, 0L, 0L))
    val selected = new Array[Boolean](nH)
    var s = 0
    val lastStart = nH - WinnowW
    while (s <= lastStart) {
      // rightmost minimum: <= keeps advancing `best` through ties
      var best = s
      var j = s + 1
      while (j < s + WinnowW) { if (hs(j) <= hs(best)) best = j; j += 1 }
      selected(best) = true
      s += 1
    }
    var cnt = 0L
    var sumv = 0L
    var k = 0
    while (k < nH) { if (selected(k)) { cnt += 1L; sumv += hs(k) }; k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](nH.toLong, cnt, sumv))
  }

  /** 64-bit SimHash of the whitespace tokens of `text`, as 16 lowercase hex
    * chars: token hash = first 64 bits of md5, per-bit ±1 vote, bit set when
    * the vote sum is positive. Single pass per document — the distributed
    * plan stays a shuffle-free scan (vs token explode + 64-way groupBy).
    */
  def simHash64Hex(text: String): String = {
    val counts = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val digest = md.get()
          digest.reset()
          val tok = text.substring(start, i)
          val h = digest.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // first 8 bytes, big-endian = first 16 hex chars of md5
          var v = 0L
          var k = 0
          while (k < 8) { v = (v << 8) | (h(k) & 0xffL); k += 1 }
          var b = 0
          while (b < 64) {
            counts(b) += (if (((v >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) fp |= 1L << b; b += 1 }
    val out = new Array[Char](16)
    var j = 0
    while (j < 16) {
      out(j) = hexDigits(((fp >>> (4 * (15 - j))) & 0xfL).toInt)
      j += 1
    }
    new String(out)
  }
}

/** `minhash8(text)` → the 8 MinHash signature values as hex strings, in
  * ONE pass over the shingles: for each 5-char shingle, 8 salted md5s
  * (`md5(shingle || '|' || j)`), tracking the lexicographic minimum per
  * salt as raw digest bytes (unsigned byte order == hex string order).
  * Semantics match the declarative form exactly — the oracle replays it
  * with list_min/list_transform — but skips eight 300-element array
  * materializations per document.
  */
case class Minhash8(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType)
  override def prettyName: String = "minhash8"

  override protected def nullSafeEval(text: Any): Any =
    TextKernels.minhash8(text.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels.minhash8($t.toString())")

  override protected def withNewChildInternal(newChild: Expression): Minhash8 =
    copy(child = newChild)
}

/** Vector kernels for the similarity operators. */
object VecKernels {

  /** Exact, order-independent dot product of two float vectors in fixed
    * point: Σ round(a_i·b_i·1e9) as a long. Products of floats are exact
    * in double; scaling by 1e9 can never land exactly on .5 (no dyadic
    * rational equals (2k+1)/(2·10⁹)), so round is tie-free and the DuckDB
    * oracle (`sum(CAST(round(e_a*e_b*1e9) AS BIGINT))`) reproduces the sum
    * bit-for-bit in any order.
    */
  def dot9(a: Array[Float], b: Array[Float]): Long = {
    var acc = 0L
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      acc += Math.round(a(i).toDouble * b(i).toDouble * 1e9)
      i += 1
    }
    acc
  }

  /** Per-row upper-triangle second-moment entries in the same fixed point
    * as [[dot9]]: entry k (pairs (i,j), i ≤ j, row-major) =
    * round((v_i·v_j)·1e9). One codegen call emits the d(d+1)/2 longs the
    * covariance aggregation needs — the HOF equivalent (nested transform
    * + flatten) runs interpreted and allocates per element.
    *
    * Unlike [[dot9]]'s tie-free argument, the ×1e9 here IS inexact in
    * double (48-bit product × 21-bit odd part of 1e9 > 53 bits), so the
    * rounded double can in principle land exactly on a .5 boundary where
    * Java's Math.round (floor(x+0.5)) and away-from-zero rounding
    * disagree. The PCA oracle therefore replays this as
    * `floor(x*1e9 + 0.5)` — bit-identical to Math.round for every
    * double — rather than DuckDB `round()`.
    */
  def mom9(a: Array[Float]): Array[Long] = {
    val n = a.length
    val out = new Array[Long](n * (n + 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val ai = a(i).toDouble
      var j = i
      while (j < n) {
        out(k) = Math.round(ai * a(j).toDouble * 1e9)
        k += 1
        j += 1
      }
      i += 1
    }
    out
  }

  /** Intersection of two ascending-sorted long arrays by merge scan.
    * Duplicate-free inputs (distinct adjacency lists) → duplicate-free
    * output; result order is ascending.
    */
  def isectSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length, b.length))
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }
}

/** `isect_sorted(a, b)` over two SORTED long-array columns → their
  * intersection, by a single merge scan (O(|a|+|b|), no per-row hash
  * set — the built-in `array_intersect` builds one per call and runs
  * interpreted). The triangle-counting hot path: both adjacency arrays
  * arrive `sort_array`-ed, so sortedness is the caller's contract.
  */
case class IsectSorted(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "isect_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VecKernels.isectSorted(x.toLongArray(), y.toLongArray()))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VecKernels.isectSorted($a.toLongArray(), $b.toLongArray()))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IsectSorted =
    copy(left = newLeft, right = newRight)
}

/** `dot9(a, b)` over two float-array columns → fixed-point (1e-9) dot
  * product as BIGINT. Codegen is a single static call — the whole cosine
  * pipeline stays inside WholeStageCodegen with primitive longs (vs a
  * Decimal fold over a zipped array, ~10× slower).
  */
/** `lev_band(a, b)` → banded Levenshtein at the pair's 20 % dup bound
  * (−1 past it); prefix/suffix-trimmed (TextKernels.levBand). One
  * static call inside WholeStageCodegen.
  */
case class LevBand(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "lev_band"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.levBand(a.toString, b.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextKernels.levBand($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevBand =
    copy(left = newLeft, right = newRight)
}

case class Dot9(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "dot9"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    VecKernels.dot9(x.toFloatArray(), y.toFloatArray())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecKernels.dot9($a.toFloatArray(), $b.toFloatArray())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Dot9 =
    copy(left = newLeft, right = newRight)
}

/** `mom9(vec)` → the d(d+1)/2 upper-triangle fixed-point second-moment
  * entries of a float vector as ARRAY<BIGINT> (VecKernels.mom9) — the
  * scan-side half of the distributed covariance aggregation.
  */
case class Mom9(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "mom9"

  override protected def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VecKernels.mom9(
        v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toFloatArray()))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.VecKernels.mom9($a.toFloatArray()))")

  override protected def withNewChildInternal(newChild: Expression): Mom9 =
    copy(child = newChild)
}

/** `simhash64(text)` → 16-hex-char fingerprint; codegen stays a single
  * static call inside WholeStageCodegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(text: Any): Any =
    UTF8String.fromString(TextKernels.simHash64Hex(text.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextKernels.simHash64Hex($t.toString()))")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `rollhash8(text)` → [fp_min, fp_pos, n_windows]: byte-wise Karp–Rabin
  * rolling-hash fingerprint (TextKernels.rollHash) as a single codegen
  * kernel call — the whole fingerprint stays inside WholeStageCodegen,
  * one O(n) pass per document.
  */
/** `bhist16(payload)` → ARRAY<BIGINT> of 16 byte-value bucket counts
  * (TextKernels.bhist16) — the whole histogram stays inside
  * WholeStageCodegen, one O(n) pass per payload.
  */
case class BHist16(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "bhist16"

  override protected def nullSafeEval(payload: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextKernels.bhist16(payload.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextKernels.bhist16($p))")

  override protected def withNewChildInternal(newChild: Expression): BHist16 =
    copy(child = newChild)
}

case class AHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "ahash16"

  override protected def nullSafeEval(payload: Any): Any =
    TextKernels.aHash16(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p =>
      s"graft.functions.TextKernels.aHash16($p)")

  override protected def withNewChildInternal(newChild: Expression): AHash16 =
    copy(child = newChild)
}

/** `ahash64(payload)` → 64-bit average-hash (TextKernels.aHash64), the
  * banding-grade perceptual hash for multimodal near-dup detection.
  */
case class AHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "ahash64"

  override protected def nullSafeEval(payload: Any): Any =
    TextKernels.aHash64(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p =>
      s"graft.functions.TextKernels.aHash64($p)")

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

/** `wgrams3(text)` → distinct word-trigram array
  * (TextKernels.wordGrams3) — one codegen call per document where the
  * equivalent higher-order-function chain runs interpreted.
  */
case class WGrams3(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "wgrams3"

  override protected def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextKernels.wordGrams3(text.asInstanceOf[UTF8String])
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextKernels.wordGrams3($t))")

  override protected def withNewChildInternal(newChild: Expression): WGrams3 =
    copy(child = newChild)
}

/** `repstats(text)` → [n_tokens, n_distinct, n_grams, n_gram_distinct,
  * top_tok_n] (TextKernels.repStats) — linear-time counting where the
  * expression chain it replaces was per-doc quadratic and interpreted.
  */
case class RepStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "repstats"

  override protected def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextKernels.repStats(text.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextKernels.repStats($t))")

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

/** `ttrstats(text)` → [n_tokens, n_types, n_hapax]
  * (TextKernels.ttrStats) — the lexical-diversity counts as one codegen
  * call.
  */
case class TtrStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "ttrstats"

  override protected def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextKernels.ttrStats(text.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextKernels.ttrStats($t))")

  override protected def withNewChildInternal(newChild: Expression): TtrStats =
    copy(child = newChild)
}

/** `jgrams3(text)` → distinct filtered-token trigram array
  * (TextKernels.jointGrams3) — the n-gram-Jaccard gram set as one
  * codegen call.
  */
case class JGrams3(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "jgrams3"

  override protected def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextKernels.jointGrams3(text.asInstanceOf[UTF8String])
        .asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextKernels.jointGrams3($t))")

  override protected def withNewChildInternal(newChild: Expression): JGrams3 =
    copy(child = newChild)
}

/** `langscores5(text)` → per-model language-ID score array
  * (TextKernels.langScores) — one pass over the tokens instead of one
  * interpreted `aggregate` fold per model.
  */
case class LangScores5(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "langscores5"

  override protected def nullSafeEval(text: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextKernels.langScores(text.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextKernels.langScores($t))")

  override protected def withNewChildInternal(newChild: Expression): LangScores5 =
    copy(child = newChild)
}

/** `md5head48(key)` → first 48 md5 bits as BIGINT
  * (TextKernels.md5Head48) — digest-byte read instead of hex + conv.
  */
case class Md5Head48(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "md5head48"

  override protected def nullSafeEval(key: Any): Any =
    TextKernels.md5Head48(key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, k => s"graft.functions.TextKernels.md5Head48($k)")

  override protected def withNewChildInternal(newChild: Expression): Md5Head48 =
    copy(child = newChild)
}

/** Driver-side registry resolving plan-time artifact ids to their Spark
  * broadcast handles. `call_function` can only pass Columns, so a bound
  * artifact rides in two steps: the artifact builder broadcasts the
  * value and registers the handle here under a fresh id, the plan
  * carries `decon_artifact(<id>)`, and the function BUILDER (which runs
  * on the driver during analysis) swaps the id literal for a
  * [[DeconArtifactRef]] embedding the handle itself. Executors then
  * deserialize the lightweight handle and fetch blocks once per node —
  * the plan never inlines the artifact bytes, unlike a `typedLit`,
  * whose serialized literal ships with every task.
  */
object ArtifactBroadcasts {
  type Artifact = (Long, Array[Long], Array[String])
  private val reg = new java.util.concurrent.ConcurrentHashMap[
    Long, org.apache.spark.broadcast.Broadcast[Artifact]]()
  private val next = new java.util.concurrent.atomic.AtomicLong(0L)

  def put(bc: org.apache.spark.broadcast.Broadcast[Artifact]): Long = {
    val id = next.incrementAndGet(); reg.put(id, bc); id
  }
  def get(id: Long): org.apache.spark.broadcast.Broadcast[Artifact] = {
    val bc = reg.get(id)
    require(bc != null,
      s"unknown artifact id $id — decon_artifact(id) resolves on the DRIVER at plan time")
    bc
  }
}

/** The decontamination artifact struct served from a broadcast handle:
  * `(bits BIGINT, bitmap ARRAY<BIGINT>, bench ARRAY<STRING>)`. A leaf —
  * the broadcast handle is embedded at plan construction (see
  * [[ArtifactBroadcasts]]); serializing the expression ships only the
  * handle. CodegenFallback is fine here: [[DeconStats]] reads the struct
  * once per expression INSTANCE (lazy bind), so the per-row cost is a
  * cached-reference return, dwarfed by the gram kernel it feeds.
  */
case class DeconArtifactRef(
    bc: org.apache.spark.broadcast.Broadcast[ArtifactBroadcasts.Artifact])
    extends org.apache.spark.sql.catalyst.expressions.LeafExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types._
  override def dataType: DataType = StructType(Seq(
    StructField("bits", LongType, nullable = false),
    StructField("bitmap", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("bench", ArrayType(StringType, containsNull = false), nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "decon_artifact"

  @transient private lazy val row: org.apache.spark.sql.catalyst.InternalRow = {
    val (bits, bitmap, bench) = bc.value
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      bits,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(bitmap),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        bench.map(UTF8String.fromString(_): Any))))
  }
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = row
}

/** `deconstats(text, artifact)` → `[n_grams, n_bloom_hits,
  * n_true_hits]` (TextKernels.deconStats). `artifact` is a struct
  * `(bits BIGINT, bitmap ARRAY<BIGINT>, bench ARRAY<STRING>)` — the
  * benchmark decontamination artifact, normally a [[DeconArtifactRef]]
  * broadcast reference (a struct literal also works) — evaluated
  * ONCE per expression instance into a sorted probe set (the
  * [[BloomMightContain]] bound-artifact pattern), so the per-row cost is
  * the kernel's single pass. At 100 TB the artifact rides as a
  * broadcast handle exactly like a broadcast-join hash relation;
  * the fact side stays scan-shaped.
  */
case class DeconStats(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "deconstats"

  @transient private lazy val artifact: (Long, Array[Long], Array[AnyRef]) = {
    val r = right.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val bits = r.getLong(0)
    val bitmap = r.getArray(1).toLongArray()
    val bench = r.getArray(2).toObjectArray(StringType)
    // binary search wants the probe set in UTF8String natural order;
    // sorting here (once per instance) frees the caller from a contract
    java.util.Arrays.sort(bench, null)
    (bits, bitmap, bench)
  }

  override protected def nullSafeEval(text: Any, ignored: Any): Any =
    evalPublic(text.asInstanceOf[UTF8String])

  /** Codegen entry point (generated code can't see the protected eval). */
  def evalPublic(text: UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val (bits, bitmap, bench) = artifact
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      TextKernels.deconStats(text, bits, bitmap, bench))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deconExpr", this, classOf[DeconStats].getName)
    defineCodeGen(ctx, ev, (g, _) => s"$ref.evalPublic($g)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DeconStats =
    copy(left = newLeft, right = newRight)
}

/** `bpepairs(text)` → map<pair, count> of adjacent char pairs inside
  * words (TextKernels.bpePairCounts) — the per-doc pre-aggregated BPE
  * statistics unit.
  */
case class BpePairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(StringType,
      org.apache.spark.sql.types.LongType, valueContainsNull = false)
  override def prettyName: String = "bpepairs"

  private def build(text: Any): org.apache.spark.sql.catalyst.util.MapData = {
    val (ks, vs) = TextKernels.bpePairCounts(text.asInstanceOf[UTF8String])
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ks.asInstanceOf[Array[Any]]),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(vs))
  }

  override protected def nullSafeEval(text: Any): Any = build(text)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeExpr", this, classOf[BpePairs].getName)
    defineCodeGen(ctx, ev, t => s"$ref.buildPublic($t)")
  }

  /** Codegen entry point (generated code can't see the protected eval). */
  def buildPublic(text: UTF8String): org.apache.spark.sql.catalyst.util.MapData =
    build(text)

  override protected def withNewChildInternal(newChild: Expression): BpePairs =
    copy(child = newChild)
}

/** `rollfps16(text)` → sorted distinct sampled window hashes
  * (TextKernels.rollFps) — the shared-substring fingerprint set, one
  * codegen kernel call per document.
  */
case class RollFps16(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)
  override def prettyName: String = "rollfps16"

  override protected def nullSafeEval(text: Any): Any =
    TextKernels.rollFps(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels.rollFps($t)")

  override protected def withNewChildInternal(newChild: Expression): RollFps16 =
    copy(child = newChild)
}

/** `cdccuts(text)` → ascending chunk-start byte offsets
  * (TextKernels.cdcCuts) — the content-defined-chunking cut set, one
  * codegen kernel call per document.
  */
case class CdcCuts(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)
  override def prettyName: String = "cdccuts"

  override protected def nullSafeEval(text: Any): Any =
    TextKernels.cdcCuts(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels.cdcCuts($t)")

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

/** `winnow8(text)` → [n_windows, n_selected, fp_sum]: winnowing fingerprint
  * selection over the 8-byte Karp–Rabin window hashes (TextKernels.winnow)
  * — one codegen kernel call per document, no per-position explode.
  */
case class Winnow8(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)
  override def prettyName: String = "winnow8"

  override protected def nullSafeEval(text: Any): Any =
    TextKernels.winnow(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels.winnow($t)")

  override protected def withNewChildInternal(newChild: Expression): Winnow8 =
    copy(child = newChild)
}

case class RollHash8(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)
  override def prettyName: String = "rollhash8"

  override protected def nullSafeEval(text: Any): Any =
    TextKernels.rollHash(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.TextKernels.rollHash($t)")

  override protected def withNewChildInternal(newChild: Expression): RollHash8 =
    copy(child = newChild)
}
