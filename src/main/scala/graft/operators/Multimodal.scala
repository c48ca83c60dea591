package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Input to the decode stage: opaque binary payload + typed metadata. */
case class MMInput(doc_id: Long, fmt: String, payload: Array[Byte])

/** Decoded record: metadata + extracted feature vector. `feat_str` is the
  * vector as comma-joined fixed-point micro-units (round(f*1e6)) — raw
  * array columns are unsortable/unhashable in the driver's pandas compare.
  */
case class MMFeature(doc_id: Long, fmt: String, n_bytes: Int,
    magic_hex: String, feat_str: String)

/** Multimodal plumbing: image/audio/video as opaque `binary` columns with
  * typed metadata, decoded per-partition into feature vectors.
  *
  * The Spark-side shape is the real thing — binary column + case-class
  * schema, `mapPartitions` batch iteration (the JVM analog of
  * `mapInPandas` batches), per-partition decoder state reuse. The decoder
  * itself is a STUB: no image/audio codecs exist in this container, so
  * `decodeStub` derives a deterministic md5-based fake feature vector
  * where a real pixel/sample decode would plug in. Everything around the
  * stub (schema, partitioning, batch iteration, output encoding) is
  * exercised for real and oracle-checked.
  */
object Multimodal {

  /** STUB decode kernel — replace with a real codec (e.g. image resize /
    * audio frame sample) in a container that ships one. Deterministic:
    * feature i = i-th md5 byte of the payload, scaled to [0, 1].
    */
  private def decodeStub(md: java.security.MessageDigest, in: MMInput): MMFeature = {
    md.reset()
    val h = md.digest(in.payload)
    // feature i = h(i)/255 in micro-units, computed in pure integer
    // arithmetic ((b*1e6 + 127) div 255 — 255 is odd so no .5 ties):
    // bit-identical to the DuckDB oracle with no float rounding hazard
    val feat = Array.tabulate(8)(i => ((h(i) & 0xff) * 1000000L + 127L) / 255L)
    val magic = in.payload.take(4).map(b => f"${b & 0xff}%02x").mkString
    MMFeature(in.doc_id, in.fmt, in.payload.length, magic, feat.mkString(","))
  }

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
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpg")
          .otherwise("wav").as("fmt"),
        encode(col("text"), "utf-8").as("payload"))
      .as[MMInput]
    inputs.mapPartitions { batch =>
      // per-partition decoder state, reused across the whole batch
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map(decodeStub(md, _))
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

  /** Resize — the image-resize analog in the byte domain: nearest-neighbor
    * resampling of the opaque payload to a fixed TARGET=32 samples, sample
    * j taking byte floor(j·n/32) (the exact per-axis index rule of a real
    * nearest-neighbor image resize; a codec-equipped decoder would apply
    * it per pixel row instead of per byte). Handles both down- and
    * up-sampling (indices repeat when n < 32). Pure scan-side expression
    * work over the hex view of the payload — codegen, no UDF, no shuffle
    * beyond the output ordering.
    */
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_features" -> (mmFeatures _),
    "mm_phash" -> (mmPhash _),
    "mm_frames" -> (mmFrames _),
    "mm_resize" -> (mmResize _))

  val oracles: Map[String, String] = Map(
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
    "mm_features" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'wav' END AS fmt,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  lower(substr(hex(encode(text)), 1, 8)) AS magic_hex,
        |  array_to_string(list_transform(range(0, 8), i ->
        |    CAST((((strpos('0123456789abcdef', substr(md5(text), 2 * i + 1, 1)) - 1) * 16
        |           + (strpos('0123456789abcdef', substr(md5(text), 2 * i + 2, 1)) - 1))
        |          * 1000000 + 127) // 255 AS VARCHAR)), ',') AS feat_str
        |FROM documents ORDER BY doc_id""".stripMargin,
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
