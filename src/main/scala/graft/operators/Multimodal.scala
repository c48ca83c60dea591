package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input to the decode stage: opaque binary payload + typed metadata. */
case class MMInput(doc_id: Long, fmt: String, payload: Array[Byte])

/** Decoded record: container metadata (encoded size, real magic bytes) +
  * the feature vector extracted from the DECODED pixel/sample plane.
  * `feat_str` = comma-joined integers [w, h, meanR_µ, meanG_µ, meanB_µ,
  * lum_first, lum_last, pos_checksum] — a string because raw array columns
  * are unsortable/unhashable in the driver's pandas compare.
  */
case class MMFeature(doc_id: Long, fmt: String, n_bytes: Int,
    magic_hex: String, feat_str: String)

/** Per-image sharpness record: Laplacian response moments over the decoded
  * luminance plane (interior pixels only), exact-integer variance
  * numerator, and the blur verdict. All integers — engine-portable.
  */
case class MMBlur(doc_id: Long, fmt: String, h: Int, n_interior: Long,
    lap_sum: Long, var_flr: Long, blurry: Boolean)

/** Multimodal plumbing: image/audio/video as opaque `binary` columns with
  * typed metadata, decoded per-partition into feature vectors.
  *
  * The Spark-side shape is the real thing — binary column + case-class
  * schema, `mapPartitions` batch iteration (the JVM analog of
  * `mapInPandas` batches), per-partition decoder reuse — and since round 8
  * the DECODE is real too: each payload is a well-formed PPM / BMP / WAV
  * container ([[MediaCodec]] builds it from the document bytes, standing in
  * for the blobs a real corpus would carry) and the feature vector is
  * computed from the PARSED pixel/sample plane, not from the raw bytes.
  * Header parsing, BMP bottom-up row order, BGR→RGB conversion and WAV
  * chunk walking are all on the feature path: the oracle derives the same
  * features from the source bytes directly, so any decode bug — a
  * misread dimension, a flipped row, a swapped channel — breaks the
  * order-sensitive checksum and fails CORRECTNESS.
  */
object Multimodal {

  /** Position-sensitive feature vector from a decoded plane: dimensions,
    * per-channel fixed-point means, first/last luminance, and a positional
    * luminance checksum (Σ (i+1)·lum_i mod 1000003) that catches row-order
    * and channel-order decode bugs means alone would miss. All-integer —
    * bit-identical across engines.
    */
  private def features(in: MMInput, payload: Array[Byte], r: Raster): MMFeature = {
    val n = r.w * r.h
    var sr = 0L; var sg = 0L; var sb = 0L
    var posChk = 0L
    var lumFirst = 0L; var lumLast = 0L
    var i = 0
    while (i < n) {
      val rr = r.rgb(3 * i) & 0xff
      val gg = r.rgb(3 * i + 1) & 0xff
      val bb = r.rgb(3 * i + 2) & 0xff
      sr += rr; sg += gg; sb += bb
      val lum = (299L * rr + 587L * gg + 114L * bb) / 1000L
      if (i == 0) lumFirst = lum
      if (i == n - 1) lumLast = lum
      posChk = (posChk + (i + 1).toLong * lum) % 1000003L
      i += 1
    }
    val feat = Array(r.w.toLong, r.h.toLong,
      sr * 1000000L / n, sg * 1000000L / n, sb * 1000000L / n,
      lumFirst, lumLast, posChk)
    val magic = payload.take(4).map(b => f"${b & 0xff}%02x").mkString
    MMFeature(in.doc_id, in.fmt, payload.length, magic, feat.mkString(","))
  }

  /** Images are 16 px wide; height = available pixel rows, capped. */
  private val ImgW = 16
  private val MaxRows = 64
  private val MaxSamples = 3072

  /** Perceptual-hash dedup for multimodal payloads: a 16-bit average-hash
    * (`ahash16` codegen kernel) over the opaque bytes — near-identical
    * payloads (re-encodes, trailing metadata edits) collide where
    * cryptographic hashes scatter — grouped into duplicate buckets. The
    * real-pipeline dedup axis for image/audio blobs; scan + one hash
    * groupBy.
    */
  def mmPhash(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .withColumn("phash", call_function("ahash16", col("payload")))
      .groupBy("phash")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_id"),
        max(length(col("payload"))).as("max_bytes"))
  }

  def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val inputs = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "ppm")
          .when(col("doc_id") % 3 === 1, "bmp")
          .otherwise("wav").as("fmt"),
        encode(col("text"), "utf-8").as("payload"))
      .as[MMInput]
    inputs.mapPartitions { batch =>
      batch.flatMap { in =>
        in.fmt match {
          case "wav" =>
            val ns = math.min(in.payload.length, MaxSamples)
            if (ns < 1) None
            else {
              val payload = MediaCodec.encodeWav(java.util.Arrays.copyOf(in.payload, ns))
              MediaCodec.decodeWav(payload).map(features(in, payload, _))
            }
          case fmt =>
            // payloads below one pixel row are skipped (a real pipeline
            // drops undecodable blobs, it doesn't fake them)
            val h = math.min(in.payload.length / (ImgW * 3), MaxRows)
            if (h < 1) None
            else {
              val rgb = java.util.Arrays.copyOf(in.payload, h * ImgW * 3)
              val payload =
                if (fmt == "ppm") MediaCodec.encodePpm(ImgW, h, rgb)
                else MediaCodec.encodeBmp(ImgW, h, rgb)
              (if (fmt == "ppm") MediaCodec.decodePpm(payload)
               else MediaCodec.decodeBmp(payload)).map(features(in, payload, _))
            }
        }
      }
    }.toDF()
  }

  /** Variance-of-Laplacian SHARPNESS gate (Pech-Pacheco et al. 2000 — the
    * standard blur detector an image-training-data pipeline runs before
    * keeping a crawl image): per decoded image, the 4-neighbor Laplacian
    * response `4·lum(x,y) − lum(x±1,y) − lum(x,y±1)` over every INTERIOR
    * pixel of the luminance plane, its variance kept exact as the integer
    * numerator n·Σl² − (Σl)², and the verdict `blurry ⇔ floor-variance <
    * 7500` (low response variance = no edges = blur/flat; the threshold
    * sits at the corpus median so BOTH verdicts are populated). Decode is the
    * REAL [[MediaCodec]] path shared with [[mmFeatures]] — the oracle
    * recomputes every neighbor's luminance from the source bytes, so a
    * flipped BMP row order or swapped channel shifts the Laplacian and
    * fails the compare.
    *
    * Scale shape: decode + convolution are per-row map work inside the
    * one `mapPartitions` decode batch (the codec exception to the
    * no-imperative rule); no shuffle at all until the driver's output
    * coalesce — a 100 TB image corpus runs this as a pure scan.
    */
  def mmBlur(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val inputs = Tables.documents(s, dir)
      .filter(col("doc_id") % 3 < 2) // images only: ppm / bmp
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "ppm").otherwise("bmp").as("fmt"),
        encode(col("text"), "utf-8").as("payload"))
      .as[MMInput]
    inputs.mapPartitions { batch =>
      batch.flatMap { in =>
        val h = math.min(in.payload.length / (ImgW * 3), MaxRows)
        if (h < 3) None // no interior row to convolve — drop like undecodable
        else {
          val rgb = java.util.Arrays.copyOf(in.payload, h * ImgW * 3)
          val payload =
            if (in.fmt == "ppm") MediaCodec.encodePpm(ImgW, h, rgb)
            else MediaCodec.encodeBmp(ImgW, h, rgb)
          (if (in.fmt == "ppm") MediaCodec.decodePpm(payload)
           else MediaCodec.decodeBmp(payload)).map { r =>
            def lum(i: Int): Long = {
              val rr = r.rgb(3 * i) & 0xff
              val gg = r.rgb(3 * i + 1) & 0xff
              val bb = r.rgb(3 * i + 2) & 0xff
              (299L * rr + 587L * gg + 114L * bb) / 1000L
            }
            var n = 0L; var sl = 0L; var ssq = 0L
            var y = 1
            while (y < r.h - 1) {
              var x = 1
              while (x < r.w - 1) {
                val i = y * r.w + x
                val lap = 4L * lum(i) - lum(i - 1) - lum(i + 1) -
                  lum(i - r.w) - lum(i + r.w)
                n += 1; sl += lap; ssq += lap * lap
                x += 1
              }
              y += 1
            }
            val varNum = n * ssq - sl * sl
            val varFlr = varNum / (n * n)
            MMBlur(in.doc_id, in.fmt, r.h, n, sl, varFlr, varFlr < 7500L)
          }
        }
      }
    }.toDF()
  }

  /** Frame sampling — the video/audio analog: the opaque payload is cut
    * into fixed-stride frames (here 64-byte windows every 256 bytes, the
    * "sample every Nth frame" shape), each frame carrying its offset,
    * length and content fingerprint. Pure declarative chunking (sequence →
    * transform → explode) so the 100 TB plan is scan + generate — a real
    * decoder would swap the substring for a codec call inside the same
    * per-frame structure.
    */
  def mmFrames(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("off", explode(expr("sequence(0, greatest(n_bytes - 1, 0), 256)")))
      .withColumn("frame_len", least(lit(64), col("n_bytes") - col("off")))
      // fingerprint the lowercase HEX of the byte window, not the raw
      // bytes: DuckDB's md5 only accepts VARCHAR, and hashing hex keeps
      // both engines on the same byte-indexed window for non-ASCII
      // payloads (char-indexed substr would drift per multibyte rune)
      .withColumn("frame_md5", md5(lower(hex(expr("substring(payload, off + 1, 64)")))))
      .select(col("doc_id"), col("off").cast("bigint").as("off"),
        col("frame_len"), col("frame_md5"))

  /** Scene-cut detection over the sampled frame sequence — the shot
    * segmentation a video-curation pipeline runs after frame sampling:
    * each sampled frame window (the [[mmFrames]] stride) gets the same
    * 64-bit average-hash as [[mmDedup]] (`ahash64` codegen kernel over
    * the 64-byte window), consecutive frames of a payload compare by
    * Hamming distance, and a jump past the [[mmDedup]] near-dup radius
    * (> 16 bits) marks a cut. First frame of every payload reports
    * hamming = −1, no cut.
    *
    * Scale shape: frame emit + hashing are scan-side expression work
    * (fanout = payload_bytes/256); the only exchange is the per-payload
    * lag window on doc_id — frames of one payload are a bounded group,
    * so the window never sees unbounded partitions. The oracle rebuilds
    * each frame's bit set positionally (the [[mmDedup]] set algebra,
    * window-local mean) and takes hamming = nb_a + nb_b − 2·|∩| without
    * ever materializing the 64-bit value — bit 63 would overflow a
    * signed BIGINT reconstruction.
    */
  def mmScenes(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GeoFunctions.register(s)
    val w = Window.partitionBy("doc_id").orderBy("off")
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("off",
        explode(expr("sequence(0, greatest(n_bytes - 1, 0), 256)")))
      .withColumn("frame_len", least(lit(64), col("n_bytes") - col("off")))
      .filter(col("frame_len") > 0)
      .withColumn("phash",
        call_function("ahash64", expr("substring(payload, off + 1, 64)")))
      .withColumn("prev", lag("phash", 1).over(w))
      .withColumn("hamming", when(col("prev").isNull, lit(-1))
        .otherwise(expr("cast(bit_count(phash ^ prev) as int)")))
      .withColumn("is_cut", col("hamming") > 16)
      .select(col("doc_id"), col("off").cast("bigint").as("off"),
        col("hamming"), col("is_cut"))
  }

  /** Resize — the image-resize analog in the byte domain: nearest-neighbor
    * resampling of the opaque payload to a fixed TARGET=32 samples, sample
    * j taking byte floor(j·n/32) (the exact per-axis index rule of a real
    * nearest-neighbor image resize; a codec-equipped decoder would apply
    * it per pixel row instead of per byte). Handles both down- and
    * up-sampling (indices repeat when n < 32). Pure scan-side expression
    * work over the hex view of the payload — codegen, no UDF, no shuffle
    * beyond the output ordering.
    */
  /** Byte-value HISTOGRAM features per payload — the color-histogram /
    * intensity-profile extraction an image pipeline runs per file (16
    * buckets of `byte div 16`, the 4-bit luma quantization): per doc the
    * bucket count vector summarized as `(n_bytes, nnz, dom_bucket,
    * dom_n, l2_sq)` — dominant bucket ties break LOWEST via the
    * exact-integer `min(case when c = max)` form (an `arg_max` is
    * tie-nondeterministic across engines). Like every mm_* key the
    * decode is the deterministic hex view of the payload bytes; a
    * codec-equipped build swaps the byte source, not the plumbing.
    *
    * Scale shape: ONE `bhist16` codegen kernel call per payload (an
    * O(n) byte pass inside WholeStageCodegen) and every summary reads
    * the bounded 16-entry array with HOFs — ZERO shuffles, no per-byte
    * rows ever materialize; the `array_position` of the max is the
    * lowest dominant bucket by construction (first match).
    */
  def mmColorhist(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .filter(col("n_bytes") > 0)
      .withColumn("hist", call_function("bhist16", col("payload")))
      .select(col("doc_id"), col("n_bytes"),
        expr("size(filter(hist, c -> c > 0))").cast("long").as("nnz"),
        expr("array_position(hist, array_max(hist)) - 1").as("dom_bucket"),
        expr("array_max(hist)").as("dom_n"),
        expr("aggregate(hist, 0L, (a, c) -> a + c * c)").as("l2_sq"))
      .orderBy("doc_id")
  }

  def mmResize(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("hexp", lower(hex(col("payload"))))
      .withColumn("resized_hex", expr(
        """array_join(transform(sequence(0, 31),
          |  j -> substring(hexp, CAST((j * n_bytes) div 32 AS INT) * 2 + 1, 2)), '')""".stripMargin))
      .select(col("doc_id"), col("n_bytes"), lit(32).as("target"),
        col("resized_hex"), md5(col("resized_hex")).as("resized_md5"))

  /** Near-duplicate payload PAIRS via Hamming-banded perceptual hashes —
    * the join [[mmPhash]]'s exact-collision grouping cannot do: re-encodes
    * and small edits land a few bits apart, not equal. Each payload's
    * 64-bit average-hash (`ahash64` codegen kernel) splits into 4×16-bit
    * bands; pairs sharing ANY band meet in a bucket equi-join and verify
    * `bit_count(xor) <= 16` — the classic ~¼-of-bits aHash radius.
    * The candidate set IS the contract (the [[geo_knn]]/ann_lsh rule):
    * pairs at radius ≤3 are GUARANTEED candidates (pigeonhole: 3 bits
    * touch ≤3 of 4 bands, one band survives intact), wider pairs are
    * recalled only when an aligned 16-bit run survives — exactly the
    * recall/cost dial real Hamming-LSH dedup ships with.
    *
    * Scale shape (the dedup_lsh_pairs discipline on the multimodal axis):
    * hash + band explode are scan-side; the only exchange is the (band,
    * bkey) hash join; 16-bit bands give 65 536 buckets per band so
    * occupancy stays ~n/65536, and [[Dedup.MaxBucket]] drops degenerate
    * buckets (all-constant payloads) BEFORE the self-join — candidate
    * count is bounded per bucket, never corpus-quadratic.
    */
  def mmDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GeoFunctions.register(s)
    val bands = Tables.documents(s, dir)
      .select(col("doc_id"),
        call_function("ahash64", encode(col("text"), "utf-8")).as("phash"))
      .select(col("doc_id"), col("phash"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bkey",
        expr("shiftrightunsigned(phash, cast(band * 16 as int)) & 65535"))
    val capped = bands
      .withColumn("bsz", count(lit(1)).over(Window.partitionBy("band", "bkey")))
      .filter(col("bsz") <= Dedup.MaxBucket)
      .drop("bsz")
    capped.select(col("band"), col("bkey"),
        col("doc_id").as("id_a"), col("phash").as("ph_a"))
      .join(capped.select(col("band"), col("bkey"),
        col("doc_id").as("id_b"), col("phash").as("ph_b")), Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ph_a", "ph_b").distinct()
      .withColumn("hamming", expr("cast(bit_count(ph_a ^ ph_b) as int)"))
      .filter(col("hamming") <= 16)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Audio feature extraction through the REAL WAV decode path: each
    * payload round-trips encodeWav → RIFF chunk walk → samples, and the
    * features (sample count, energy = Σ(s−128)², strict-sign zero
    * crossings, peak amplitude, fixed-point mean) come from the DECODED
    * sample plane — the oracle recomputes them from the source bytes
    * directly, so a chunk-walk or sign bug breaks the compare. All
    * integers; `mapPartitions` batch shape like [[mmFeatures]] (the JVM
    * analog of `mapInPandas`), undecodable payloads dropped.
    */
  def mmAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (docId, raw) =>
          val ns = math.min(raw.length, MaxSamples)
          if (ns < 1) None
          else {
            val payload = MediaCodec.encodeWav(java.util.Arrays.copyOf(raw, ns))
            MediaCodec.decodeWav(payload).map { r =>
              var energy = 0L
              var zc = 0L
              var peak = 0
              var sum = 0L
              var prev = 0
              var i = 0
              while (i < r.w) {
                val sv = r.rgb(3 * i) & 0xff
                val c = sv - 128
                energy += c.toLong * c
                if (i > 0 && ((prev > 0 && c < 0) || (prev < 0 && c > 0))) zc += 1
                if (math.abs(c) > peak) peak = math.abs(c)
                sum += sv
                prev = c
                i += 1
              }
              (docId, r.w, energy, zc, peak, sum * 1000L / r.w)
            }
          }
        }
      }
      .toDF("doc_id", "n_samples", "energy", "zero_cross", "peak", "mean_milli")
  }

  /** Voice-activity census (the silence-trim pass an audio curation
    * pipeline runs before transcription): the decoded sample plane cut
    * into 256-sample frames, a frame ACTIVE when its energy clears a
    * mean-square threshold (Σc² > 500·n — integer cross-mult, no
    * per-frame division), then per clip: frame/silent counts, number of
    * activity segments (active frame whose predecessor was not), and
    * the longest silent run. Like [[mmAudio]], the oracle recomputes
    * everything from the SOURCE bytes, so the encodeWav → decode
    * roundtrip is inside the verified surface; the frame walk happens
    * inside the same per-clip decode pass — no second scan, no
    * exchange beyond the doc-grain output.
    */
  def mmSilence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (docId, raw) =>
          val ns = math.min(raw.length, MaxSamples)
          if (ns < 1) None
          else {
            val payload = MediaCodec.encodeWav(java.util.Arrays.copyOf(raw, ns))
            MediaCodec.decodeWav(payload).map { r =>
              val frame = 256
              val nf = (r.w + frame - 1) / frame
              var silent = 0L
              var segs = 0L
              var longest = 0L
              var run = 0L
              var prevActive = false
              var f = 0
              while (f < nf) {
                val from = f * frame
                val to = math.min(from + frame, r.w)
                var e = 0L
                var i = from
                while (i < to) {
                  val c = (r.rgb(3 * i) & 0xff) - 128
                  e += c.toLong * c
                  i += 1
                }
                val active = e > 500L * (to - from)
                if (active) {
                  if (!prevActive) segs += 1
                  run = 0
                } else {
                  silent += 1
                  run += 1
                  if (run > longest) longest = run
                }
                prevActive = active
                f += 1
              }
              (docId, nf.toLong, silent, segs, longest)
            }
          }
        }
      }
      .toDF("doc_id", "n_frames", "n_silent", "n_segments", "longest_silence")
  }

  /** PNG ingest (`mm_png`) — the one modality a crawl pipeline hits
    * constantly: each document's bytes become a REAL PNG (RGB8 for even
    * doc ids, 8-bit greyscale for odd — both supported color types),
    * encoded by [[MediaCodec.encodePng]] with the filter type cycling
    * per row (None/Sub/Up/Average/Paeth all on the wire) and the zlib
    * stream split across two IDAT chunks, then DECODED back through the
    * full chunk walk + CRC check + inflate + per-row unfilter. Features
    * are the [[mmFeatures]] positional-checksum discipline over the
    * decoded plane, so a wrong filter reversal, a swapped channel or a
    * single-IDAT-only reader breaks the oracle compare (the oracle
    * recomputes the plane from the source bytes — encode∘decode is the
    * identity on pixels). The container size is NOT a feature here:
    * deflate output length is codec-internal, not oracle-derivable.
    *
    * Scale shape: identical to mm_features — decode is per-row work in
    * one `mapPartitions` batch, a pure scan at 100 TB.
    */
  def mmPng(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val inputs = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, "rgb").otherwise("grey").as("fmt"),
        encode(col("text"), "utf-8").as("payload"))
      .as[MMInput]
    inputs.mapPartitions { batch =>
      batch.flatMap { in =>
        val bpp = if (in.fmt == "rgb") 3 else 1
        val h = math.min(in.payload.length / (ImgW * bpp), MaxRows)
        if (h < 1) None
        else {
          val raw = java.util.Arrays.copyOf(in.payload, h * ImgW * bpp)
          val payload = MediaCodec.encodePng(ImgW, h, raw, rgb = in.fmt == "rgb")
          MediaCodec.decodePng(payload).map { r =>
            val f = features(in, payload, r)
            (f.doc_id, f.fmt, f.magic_hex, f.feat_str)
          }
        }
      }
    }.toDF("doc_id", "fmt", "magic_hex", "feat_str")
  }

  /** 256-entry GIF global color table: identity greys, or the
    * deterministic RGB ramp the oracle replays arithmetically
    * (r = 7i+13, g = 11i+29, b = 13i+37, mod 256).
    */
  private def gifPalette(rgb: Boolean): Array[Byte] = {
    val p = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      if (rgb) {
        p(3 * i) = ((i * 7 + 13) % 256).toByte
        p(3 * i + 1) = ((i * 11 + 29) % 256).toByte
        p(3 * i + 2) = ((i * 13 + 37) % 256).toByte
      } else {
        p(3 * i) = i.toByte; p(3 * i + 1) = i.toByte; p(3 * i + 2) = i.toByte
      }
      i += 1
    }
    p
  }

  /** GIF ingest (`mm_gif`) — the palette-indexed sibling of [[mmPng]]:
    * each document's bytes become the INDEX stream of a real GIF89a
    * (LZW-compressed, 255-byte sub-blocks, 256-entry global color table —
    * identity greys for odd doc ids, a deterministic RGB ramp for even),
    * then decode back through the full chunk walk + LZW + palette
    * lookup. Features are the positional-checksum discipline over the
    * decoded RGB plane, so a broken LZW width bump, a mis-framed
    * sub-block or a skipped palette indirection breaks the oracle
    * compare (the oracle recomputes pixels as palette arithmetic over
    * the source bytes — encode∘decode is the identity on indices).
    *
    * Scale shape: identical to mm_features — per-row decode in one
    * `mapPartitions` batch, a pure scan at 100 TB.
    */
  def mmGif(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val inputs = Tables.documents(s, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, "gifrgb").otherwise("gifgrey").as("fmt"),
        encode(col("text"), "utf-8").as("payload"))
      .as[MMInput]
    inputs.mapPartitions { batch =>
      val palRgb = gifPalette(rgb = true)
      val palGrey = gifPalette(rgb = false)
      batch.flatMap { in =>
        val h = math.min(in.payload.length / ImgW, MaxRows)
        if (h < 1) None
        else {
          val idx = java.util.Arrays.copyOf(in.payload, h * ImgW)
          val payload = MediaCodec.encodeGif(ImgW, h, idx,
            if (in.fmt == "gifrgb") palRgb else palGrey)
          MediaCodec.decodeGif(payload).map { r =>
            val f = features(in, payload, r)
            (f.doc_id, f.fmt, f.magic_hex, f.feat_str)
          }
        }
      }
    }.toDF("doc_id", "fmt", "magic_hex", "feat_str")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_gif" -> (mmGif _),
    "mm_png" -> (mmPng _),
    "mm_audio" -> (mmAudio _),
    "mm_silence" -> (mmSilence _),
    "mm_features" -> (mmFeatures _),
    "mm_phash" -> (mmPhash _),
    "mm_blur" -> (mmBlur _),
    "mm_dedup" -> (mmDedup _),
    "mm_frames" -> (mmFrames _),
    "mm_scenes" -> (mmScenes _),
    "mm_resize" -> (mmResize _),
    "mm_colorhist" -> (mmColorhist _))

  val oracles: Map[String, String] = Map(
    "mm_gif" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'gifrgb' ELSE 'gifgrey' END AS fmt,
        |    lower(hex(encode(text))) AS hx,
        |    octet_length(encode(text)) AS nb
        |  FROM documents),
        |dim AS (SELECT doc_id, fmt, hx, 16 AS w, least(nb // 16, 64) AS h
        |  FROM d),
        |ok AS (SELECT * FROM dim WHERE h >= 1),
        |ix AS (SELECT doc_id, fmt, w, h, i,
        |    CAST(('0x' || substr(hx, 2*i + 1, 2)) AS BIGINT) AS v
        |  FROM ok, LATERAL (SELECT unnest(range(0, CAST(w * h AS BIGINT))) AS i) rr),
        |px AS (SELECT doc_id, fmt, w, h, i,
        |    CASE WHEN fmt = 'gifgrey' THEN v ELSE (v * 7 + 13) % 256 END AS r,
        |    CASE WHEN fmt = 'gifgrey' THEN v ELSE (v * 11 + 29) % 256 END AS g,
        |    CASE WHEN fmt = 'gifgrey' THEN v ELSE (v * 13 + 37) % 256 END AS b
        |  FROM ix),
        |lm AS (SELECT *, (299*r + 587*g + 114*b) // 1000 AS lum FROM px),
        |agg AS (SELECT doc_id, any_value(fmt) AS fmt, any_value(w) AS w, any_value(h) AS h,
        |    CAST((sum(r) * 1000000) // count(*) AS BIGINT) AS mr,
        |    CAST((sum(g) * 1000000) // count(*) AS BIGINT) AS mg,
        |    CAST((sum(b) * 1000000) // count(*) AS BIGINT) AS mb,
        |    min(CASE WHEN i = 0 THEN lum END) AS lum_first,
        |    min(CASE WHEN i = w * h - 1 THEN lum END) AS lum_last,
        |    CAST(sum((i + 1) * lum) % 1000003 AS BIGINT) AS poschk
        |  FROM lm GROUP BY doc_id)
        |SELECT doc_id, fmt, '47494638' AS magic_hex,
        |  CAST(w AS VARCHAR) || ',' || CAST(h AS VARCHAR) || ',' ||
        |    CAST(mr AS VARCHAR) || ',' || CAST(mg AS VARCHAR) || ',' ||
        |    CAST(mb AS VARCHAR) || ',' || CAST(lum_first AS VARCHAR) || ',' ||
        |    CAST(lum_last AS VARCHAR) || ',' || CAST(poschk AS VARCHAR) AS feat_str
        |FROM agg ORDER BY doc_id""".stripMargin,
    "mm_png" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'rgb' ELSE 'grey' END AS fmt,
        |    lower(hex(encode(text))) AS hx,
        |    octet_length(encode(text)) AS nb
        |  FROM documents),
        |dim AS (SELECT doc_id, fmt, hx, 16 AS w,
        |    CASE WHEN fmt = 'rgb' THEN least(nb // 48, 64)
        |         ELSE least(nb // 16, 64) END AS h
        |  FROM d),
        |ok AS (SELECT * FROM dim WHERE h >= 1),
        |px AS (SELECT doc_id, fmt, w, h, i,
        |    CASE WHEN fmt = 'grey' THEN CAST(('0x' || substr(hx, 2*i + 1, 2)) AS BIGINT)
        |         ELSE CAST(('0x' || substr(hx, 6*i + 1, 2)) AS BIGINT) END AS r,
        |    CASE WHEN fmt = 'grey' THEN CAST(('0x' || substr(hx, 2*i + 1, 2)) AS BIGINT)
        |         ELSE CAST(('0x' || substr(hx, 6*i + 3, 2)) AS BIGINT) END AS g,
        |    CASE WHEN fmt = 'grey' THEN CAST(('0x' || substr(hx, 2*i + 1, 2)) AS BIGINT)
        |         ELSE CAST(('0x' || substr(hx, 6*i + 5, 2)) AS BIGINT) END AS b
        |  FROM ok, LATERAL (SELECT unnest(range(0, CAST(w * h AS BIGINT))) AS i) rr),
        |lm AS (SELECT *, (299*r + 587*g + 114*b) // 1000 AS lum FROM px),
        |agg AS (SELECT doc_id, any_value(fmt) AS fmt, any_value(w) AS w, any_value(h) AS h,
        |    CAST((sum(r) * 1000000) // count(*) AS BIGINT) AS mr,
        |    CAST((sum(g) * 1000000) // count(*) AS BIGINT) AS mg,
        |    CAST((sum(b) * 1000000) // count(*) AS BIGINT) AS mb,
        |    min(CASE WHEN i = 0 THEN lum END) AS lum_first,
        |    min(CASE WHEN i = w * h - 1 THEN lum END) AS lum_last,
        |    CAST(sum((i + 1) * lum) % 1000003 AS BIGINT) AS poschk
        |  FROM lm GROUP BY doc_id)
        |SELECT doc_id, fmt, '89504e47' AS magic_hex,
        |  CAST(w AS VARCHAR) || ',' || CAST(h AS VARCHAR) || ',' ||
        |    CAST(mr AS VARCHAR) || ',' || CAST(mg AS VARCHAR) || ',' ||
        |    CAST(mb AS VARCHAR) || ',' || CAST(lum_first AS VARCHAR) || ',' ||
        |    CAST(lum_last AS VARCHAR) || ',' || CAST(poschk AS VARCHAR) AS feat_str
        |FROM agg ORDER BY doc_id""".stripMargin,
    "mm_blur" ->
      """WITH d AS (SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt,
        |    lower(hex(encode(text))) AS hx,
        |    octet_length(encode(text)) AS nb
        |  FROM documents WHERE doc_id % 3 < 2),
        |ok AS (SELECT doc_id, fmt, hx, least(nb // 48, 64) AS h
        |  FROM d WHERE nb // 48 >= 3),
        |px AS (SELECT doc_id, fmt, h, i,
        |    (299 * CAST(('0x' || substr(hx, 6*i + 1, 2)) AS BIGINT)
        |     + 587 * CAST(('0x' || substr(hx, 6*i + 3, 2)) AS BIGINT)
        |     + 114 * CAST(('0x' || substr(hx, 6*i + 5, 2)) AS BIGINT)) // 1000
        |      AS lum
        |  FROM ok, LATERAL (SELECT unnest(range(0, CAST(16 * h AS BIGINT))) AS i) rr),
        |lap AS (SELECT doc_id, fmt, h, i,
        |    4 * lum - lag(lum, 1) OVER win - lead(lum, 1) OVER win
        |            - lag(lum, 16) OVER win - lead(lum, 16) OVER win AS lap
        |  FROM px WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
        |ins AS (SELECT * FROM lap
        |  WHERE i % 16 BETWEEN 1 AND 14 AND i // 16 BETWEEN 1 AND h - 2),
        |agg AS (SELECT doc_id, any_value(fmt) AS fmt,
        |    CAST(any_value(h) AS INT) AS h,
        |    CAST(count(*) AS BIGINT) AS n_interior,
        |    CAST(sum(lap) AS BIGINT) AS lap_sum,
        |    CAST(sum(lap * lap) AS BIGINT) AS ssq
        |  FROM ins GROUP BY doc_id)
        |SELECT doc_id, fmt, h, n_interior, lap_sum,
        |  CAST((n_interior * ssq - lap_sum * lap_sum)
        |    // (n_interior * n_interior) AS BIGINT) AS var_flr,
        |  (n_interior * ssq - lap_sum * lap_sum)
        |    // (n_interior * n_interior) < 7500 AS blurry
        |FROM agg ORDER BY doc_id""".stripMargin,
    "mm_phash" ->
      """WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
        |            octet_length(encode(text)) AS n FROM documents),
        |bytes AS (SELECT doc_id, p, n,
        |    CAST(('0x' || substr(hx, 2*p - 1, 2)) AS BIGINT) AS bv,
        |    CAST((p - 1) * 16 // n AS INT) AS w
        |  FROM d, LATERAL (SELECT unnest(range(1, n + 1)) AS p) r),
        |tot AS (SELECT doc_id, sum(bv) AS total FROM bytes GROUP BY 1),
        |wins AS (SELECT doc_id, w, sum(bv) AS sw, count(*) AS nw, max(n) AS n
        |  FROM bytes GROUP BY 1, 2),
        |ph AS (SELECT wins.doc_id,
        |    CAST(sum(CASE WHEN sw * n > total * nw THEN 1 << w ELSE 0 END) AS INT) AS phash
        |  FROM wins JOIN tot ON tot.doc_id = wins.doc_id
        |  GROUP BY 1)
        |SELECT coalesce(ph.phash, 0) AS phash, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(d.doc_id) AS keep_id,
        |  CAST(max(n) AS INT) AS max_bytes
        |FROM d LEFT JOIN ph ON d.doc_id = ph.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // frame census recomputed from the SOURCE bytes like mm_audio; the
    // longest silent run is gaps-and-islands (f − row_number per activity
    // class), segments = active frames whose predecessor was not
    "mm_silence" ->
      """WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
        |    least(octet_length(encode(text)), 3072) AS n FROM documents),
        |ok AS (SELECT * FROM d WHERE n >= 1),
        |b AS (SELECT doc_id, p, (p - 1) // 256 AS f,
        |    CAST(('0x' || substr(hx, 2*p - 1, 2)) AS BIGINT) - 128 AS c
        |  FROM ok, LATERAL (SELECT unnest(range(1, n + 1)) AS p) r),
        |fr AS (SELECT doc_id, f,
        |    CASE WHEN sum(c*c) > 500 * count(*) THEN 1 ELSE 0 END AS active
        |  FROM b GROUP BY 1, 2),
        |seg AS (SELECT doc_id, f, active,
        |    lag(active) OVER (PARTITION BY doc_id ORDER BY f) AS pa FROM fr),
        |runs AS (SELECT doc_id, active,
        |    f - row_number() OVER (PARTITION BY doc_id, active ORDER BY f) AS grp
        |  FROM fr),
        |sil AS (SELECT doc_id, count(*) AS runlen FROM runs
        |  WHERE active = 0 GROUP BY doc_id, grp),
        |agg AS (SELECT doc_id, count(*) AS n_frames,
        |    CAST(sum(CASE WHEN active = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent,
        |    CAST(sum(CASE WHEN active = 1 AND COALESCE(pa, 0) = 0
        |        THEN 1 ELSE 0 END) AS BIGINT) AS n_segments
        |  FROM seg GROUP BY 1),
        |lng AS (SELECT doc_id, CAST(max(runlen) AS BIGINT) AS longest_silence
        |  FROM sil GROUP BY 1)
        |SELECT a.doc_id, n_frames, n_silent, n_segments,
        |  COALESCE(longest_silence, 0) AS longest_silence
        |FROM agg a LEFT JOIN lng USING (doc_id) ORDER BY a.doc_id""".stripMargin,
    // the oracle recomputes audio features from the SOURCE bytes (sample
    // i = byte i, capped at 3072) — the Spark side must reproduce them
    // through the full encodeWav → chunk-walk decode roundtrip
    "mm_audio" ->
      """WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
        |    least(octet_length(encode(text)), 3072) AS n FROM documents),
        |ok AS (SELECT * FROM d WHERE n >= 1),
        |b AS (SELECT doc_id, p, n,
        |    CAST(('0x' || substr(hx, 2*p - 1, 2)) AS BIGINT) AS s,
        |    CAST(('0x' || substr(hx, 2*p - 1, 2)) AS BIGINT) - 128 AS c
        |  FROM ok, LATERAL (SELECT unnest(range(1, n + 1)) AS p) r),
        |w AS (SELECT doc_id, n, s, c,
        |    lag(c) OVER (PARTITION BY doc_id ORDER BY p) AS pc
        |  FROM b)
        |SELECT doc_id, CAST(max(n) AS INT) AS n_samples,
        |  CAST(sum(c * c) AS BIGINT) AS energy,
        |  CAST(sum(CASE WHEN pc IS NOT NULL
        |        AND ((pc > 0 AND c < 0) OR (pc < 0 AND c > 0))
        |      THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross,
        |  CAST(max(abs(c)) AS INT) AS peak,
        |  CAST((sum(s) * 1000) // max(n) AS BIGINT) AS mean_milli
        |FROM w GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // the oracle rebuilds the 64 window bits from the source bytes, band
    // keys as bit sums (no shifts on the signed hash), and hamming as the
    // symmetric difference of the two docs' bit sets — same integers, no
    // engine-specific shift semantics anywhere
    "mm_dedup" ->
      s"""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
        |            octet_length(encode(text)) AS n FROM documents),
        |bytes AS (SELECT doc_id, n,
        |    CAST(('0x' || substr(hx, 2*p - 1, 2)) AS BIGINT) AS bv,
        |    CAST((p - 1) * 64 // n AS INT) AS w
        |  FROM d, LATERAL (SELECT unnest(range(1, n + 1)) AS p) r),
        |tot AS (SELECT doc_id, sum(bv) AS total FROM bytes GROUP BY 1),
        |wins AS (SELECT doc_id, w, max(n) AS n, sum(bv) AS sw, count(*) AS nw
        |  FROM bytes GROUP BY 1, 2),
        |bits AS (SELECT wins.doc_id, w FROM wins JOIN tot USING (doc_id)
        |  WHERE sw * n > total * nw),
        |allb AS (SELECT d.doc_id, b.band FROM d,
        |  LATERAL (SELECT CAST(unnest(range(0, 4)) AS INT) AS band) b),
        |bk AS (SELECT allb.doc_id, allb.band,
        |    coalesce(k.bkey, 0) AS bkey
        |  FROM allb LEFT JOIN
        |    (SELECT doc_id, w // 16 AS band,
        |        CAST(sum(1 << (w % 16)) AS BIGINT) AS bkey
        |     FROM bits GROUP BY 1, 2) k
        |    ON k.doc_id = allb.doc_id AND k.band = allb.band),
        |capped AS (SELECT * FROM bk
        |  QUALIFY count(*) OVER (PARTITION BY band, bkey) <= ${Dedup.MaxBucket}),
        |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM capped a JOIN capped b
        |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |bitcnt AS (SELECT doc_id, count(*) AS nb FROM bits GROUP BY 1),
        |inter AS (SELECT p.id_a, p.id_b, count(*) AS ni
        |  FROM pairs p
        |  JOIN bits x ON x.doc_id = p.id_a
        |  JOIN bits y ON y.doc_id = p.id_b AND y.w = x.w
        |  GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b,
        |  CAST(coalesce(ca.nb, 0) + coalesce(cb.nb, 0)
        |       - 2 * coalesce(i.ni, 0) AS INT) AS hamming
        |FROM pairs p
        |LEFT JOIN bitcnt ca ON ca.doc_id = p.id_a
        |LEFT JOIN bitcnt cb ON cb.doc_id = p.id_b
        |LEFT JOIN inter i ON i.id_a = p.id_a AND i.id_b = p.id_b
        |WHERE coalesce(ca.nb, 0) + coalesce(cb.nb, 0)
        |      - 2 * coalesce(i.ni, 0) <= 16
        |ORDER BY 1, 2""".stripMargin,
    // the oracle derives features from the SOURCE bytes directly (pixel i
    // = byte triple 3i..3i+2 for images, sample i for wav) — the Spark side
    // must reproduce them through a full encode→parse roundtrip (PPM/BMP/
    // WAV headers, bottom-up BGR rows, chunk walk), so a decode bug breaks
    // the compare
    "mm_features" ->
      """WITH d AS (SELECT doc_id,
        |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp' ELSE 'wav' END AS fmt,
        |    lower(hex(encode(text))) AS hx,
        |    octet_length(encode(text)) AS nb
        |  FROM documents),
        |dim AS (SELECT doc_id, fmt, hx,
        |    CASE WHEN fmt = 'wav' THEN least(nb, 3072) ELSE 16 END AS w,
        |    CASE WHEN fmt = 'wav' THEN CASE WHEN nb >= 1 THEN 1 ELSE 0 END
        |         ELSE least(nb // 48, 64) END AS h
        |  FROM d),
        |ok AS (SELECT * FROM dim WHERE h >= 1 AND w >= 1),
        |px AS (SELECT doc_id, fmt, w, h, i,
        |    CASE WHEN fmt = 'wav' THEN CAST(('0x' || substr(hx, 2*i + 1, 2)) AS BIGINT)
        |         ELSE CAST(('0x' || substr(hx, 6*i + 1, 2)) AS BIGINT) END AS r,
        |    CASE WHEN fmt = 'wav' THEN CAST(('0x' || substr(hx, 2*i + 1, 2)) AS BIGINT)
        |         ELSE CAST(('0x' || substr(hx, 6*i + 3, 2)) AS BIGINT) END AS g,
        |    CASE WHEN fmt = 'wav' THEN CAST(('0x' || substr(hx, 2*i + 1, 2)) AS BIGINT)
        |         ELSE CAST(('0x' || substr(hx, 6*i + 5, 2)) AS BIGINT) END AS b
        |  FROM ok, LATERAL (SELECT unnest(range(0, CAST(w * h AS BIGINT))) AS i) rr),
        |lm AS (SELECT *, (299*r + 587*g + 114*b) // 1000 AS lum FROM px),
        |agg AS (SELECT doc_id, any_value(fmt) AS fmt, any_value(w) AS w, any_value(h) AS h,
        |    CAST((sum(r) * 1000000) // count(*) AS BIGINT) AS mr,
        |    CAST((sum(g) * 1000000) // count(*) AS BIGINT) AS mg,
        |    CAST((sum(b) * 1000000) // count(*) AS BIGINT) AS mb,
        |    min(CASE WHEN i = 0 THEN lum END) AS lum_first,
        |    min(CASE WHEN i = w * h - 1 THEN lum END) AS lum_last,
        |    CAST(sum((i + 1) * lum) % 1000003 AS BIGINT) AS poschk
        |  FROM lm GROUP BY doc_id)
        |SELECT doc_id, fmt,
        |  CAST(CASE fmt WHEN 'ppm' THEN 11 + length(CAST(h AS VARCHAR)) + h * 48
        |       WHEN 'bmp' THEN 54 + h * 48
        |       ELSE 44 + w END AS INT) AS n_bytes,
        |  CASE fmt WHEN 'ppm' THEN '50360a31'
        |       WHEN 'bmp' THEN '424d' || lower(lpad(to_hex((54 + h * 48) % 256), 2, '0'))
        |                           || lower(lpad(to_hex(((54 + h * 48) // 256) % 256), 2, '0'))
        |       ELSE '52494646' END AS magic_hex,
        |  CAST(w AS VARCHAR) || ',' || CAST(h AS VARCHAR) || ',' ||
        |    CAST(mr AS VARCHAR) || ',' || CAST(mg AS VARCHAR) || ',' ||
        |    CAST(mb AS VARCHAR) || ',' || CAST(lum_first AS VARCHAR) || ',' ||
        |    CAST(lum_last AS VARCHAR) || ',' || CAST(poschk AS VARCHAR) AS feat_str
        |FROM agg ORDER BY doc_id""".stripMargin,
    "mm_colorhist" ->
      """WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
        |            octet_length(encode(text)) AS n FROM documents),
        |b AS (SELECT doc_id, n,
        |    CAST(('0x' || substr(hx, 2*p - 1, 2)) AS BIGINT) // 16 AS bucket
        |  FROM d, LATERAL (SELECT unnest(range(1, n + 1)) AS p) r),
        |c AS (SELECT doc_id, bucket, count(*) AS c, min(n) AS nb
        |  FROM b GROUP BY 1, 2),
        |w AS (SELECT *, max(c) OVER (PARTITION BY doc_id) AS mx FROM c)
        |SELECT doc_id, CAST(min(nb) AS BIGINT) AS n_bytes, count(*) AS nnz,
        |  CAST(min(CASE WHEN c = mx THEN bucket END) AS BIGINT) AS dom_bucket,
        |  CAST(max(mx) AS BIGINT) AS dom_n,
        |  CAST(sum(c * c) AS BIGINT) AS l2_sq
        |FROM w GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id, CAST(n_bytes AS INT) AS n_bytes, 32 AS target,
        |  resized_hex, md5(resized_hex) AS resized_md5
        |FROM (SELECT doc_id, n_bytes,
        |        lower(array_to_string(list_transform(range(0, 32),
        |          j -> substr(hexp, CAST((j * n_bytes) // 32 AS INT) * 2 + 1, 2)), '')) AS resized_hex
        |      FROM (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |              lower(hex(encode(text))) AS hexp
        |            FROM documents) a) b
        |ORDER BY doc_id""".stripMargin,
    "mm_scenes" ->
      """WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
        |            octet_length(encode(text)) AS n FROM documents),
        |fr AS MATERIALIZED (SELECT doc_id, off, least(64, n - off) AS fl, hx
        |  FROM d, LATERAL (SELECT unnest(
        |    range(0, CAST(greatest(n, 1) AS BIGINT), 256)) AS off) o
        |  WHERE least(64, n - off) > 0),
        |fb AS MATERIALIZED (SELECT doc_id, off,
        |    CAST(('0x' || substr(hx, CAST(2 * (off + p) - 1 AS INT), 2)) AS BIGINT) AS bv,
        |    CAST((p - 1) * 64 // fl AS INT) AS w
        |  FROM fr, LATERAL (SELECT unnest(range(1, fl + 1)) AS p) r),
        |tot AS (SELECT doc_id, off, sum(bv) AS total, count(*) AS nn
        |  FROM fb GROUP BY 1, 2),
        |wins AS (SELECT doc_id, off, w, sum(bv) AS sw, count(*) AS nw
        |  FROM fb GROUP BY 1, 2, 3),
        |bits AS MATERIALIZED (SELECT wins.doc_id, wins.off, wins.w
        |  FROM wins JOIN tot ON tot.doc_id = wins.doc_id AND tot.off = wins.off
        |  WHERE wins.sw * tot.nn > tot.total * wins.nw),
        |nbits AS MATERIALIZED (SELECT doc_id, off, count(*) AS nb
        |  FROM bits GROUP BY 1, 2),
        |seq AS (SELECT doc_id, off,
        |    lag(off) OVER (PARTITION BY doc_id ORDER BY off) AS poff FROM fr),
        |inter AS (SELECT s.doc_id, s.off, count(*) AS ni
        |  FROM seq s
        |  JOIN bits x ON x.doc_id = s.doc_id AND x.off = s.off
        |  JOIN bits y ON y.doc_id = s.doc_id AND y.off = s.poff AND y.w = x.w
        |  GROUP BY 1, 2)
        |SELECT s.doc_id AS doc_id, CAST(s.off AS BIGINT) AS off,
        |  CAST(CASE WHEN s.poff IS NULL THEN -1
        |    ELSE coalesce(na.nb, 0) + coalesce(npv.nb, 0)
        |      - 2 * coalesce(i.ni, 0) END AS INT) AS hamming,
        |  CASE WHEN s.poff IS NULL THEN false
        |    ELSE coalesce(na.nb, 0) + coalesce(npv.nb, 0)
        |      - 2 * coalesce(i.ni, 0) > 16 END AS is_cut
        |FROM seq s
        |LEFT JOIN nbits na ON na.doc_id = s.doc_id AND na.off = s.off
        |LEFT JOIN nbits npv ON npv.doc_id = s.doc_id AND npv.off = s.poff
        |LEFT JOIN inter i ON i.doc_id = s.doc_id AND i.off = s.off
        |ORDER BY s.doc_id, s.off""".stripMargin,
    "mm_frames" ->
      """SELECT doc_id, CAST(off AS BIGINT) AS off,
        |  CAST(least(64, n_bytes - off) AS INT) AS frame_len,
        |  md5(lower(substr(hex(encode(text)), CAST(2 * off + 1 AS INT), 128))) AS frame_md5
        |FROM (SELECT doc_id, text,
        |        octet_length(encode(text)) AS n_bytes
        |      FROM documents) d,
        |  LATERAL (SELECT unnest(range(0, CAST(greatest(n_bytes, 1) AS BIGINT), 256)) AS off) o
        |ORDER BY doc_id, off""".stripMargin)
}
