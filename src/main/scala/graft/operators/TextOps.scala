package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators: language ID (marker-word profiles), quality
  * scoring, token counting, and canonical document fingerprinting. All are
  * single-pass scan work — no shuffle except the fingerprint window — and
  * every expression is a codegen'd builtin (no UDFs).
  */
object TextOps {

  private[graft] val toksExpr = "filter(split(text, ' '), t -> t <> '')"
  private val toksSql = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** Per-language naive-Bayes model: (scaled log prior, scaled log
    * P(word|lang) with add-1 smoothing), trained offline on the corpus'
    * per-language word distributions and frozen as integer constants
    * (log x 1000) -- integer sums are exact and engine-portable, like a
    * stopword table ships with a real language-ID model. OOV words add 0.
    */
  val Models: Seq[(String, (Long, Map[String, Int]))] = Seq(
    "de" -> ((-1966L, Map("a" -> -3483, "agg" -> -3588, "batch" -> -3339, "big" -> -3331, "column" -> -3300, "customer" -> -3227, "data" -> -3578, "dup" -> -6574, "fast" -> -3501, "filter" -> -3347, "group" -> -3501, "hash" -> -3249, "join" -> -3263, "key" -> -3339, "line" -> -3396, "merge" -> -3387, "order" -> -3483, "part" -> -3347, "query" -> -3539, "row" -> -3278, "scan" -> -3421, "slow" -> -3339, "small" -> -3438, "sort" -> -3456, "spark" -> -3520, "stream" -> -3456, "table" -> -3412, "the" -> -3447, "value" -> -3371, "vector" -> -3363, "window" -> -3520))),
    "en" -> ((-830L, Map("a" -> -3383, "agg" -> -3416, "batch" -> -3376, "big" -> -3378, "column" -> -3404, "customer" -> -3440, "data" -> -3404, "dup" -> -6977, "fast" -> -3489, "filter" -> -3386, "group" -> -3378, "hash" -> -3290, "join" -> -3388, "key" -> -3411, "line" -> -3396, "merge" -> -3411, "order" -> -3306, "part" -> -3448, "query" -> -3492, "row" -> -3368, "scan" -> -3424, "slow" -> -3443, "small" -> -3422, "sort" -> -3388, "spark" -> -3383, "stream" -> -3435, "table" -> -3323, "the" -> -3514, "value" -> -3437, "vector" -> -3424, "window" -> -3342))),
    "es" -> ((-1924L, Map("a" -> -3496, "agg" -> -3281, "batch" -> -3379, "big" -> -3573, "column" -> -3455, "customer" -> -3357, "data" -> -3393, "dup" -> -6500, "fast" -> -3416, "filter" -> -3364, "group" -> -3463, "hash" -> -3294, "join" -> -3463, "key" -> -3424, "line" -> -3364, "merge" -> -3308, "order" -> -3521, "part" -> -3379, "query" -> -3357, "row" -> -3386, "scan" -> -3357, "slow" -> -3274, "small" -> -3371, "sort" -> -3496, "spark" -> -3439, "stream" -> -3424, "table" -> -3487, "the" -> -3504, "value" -> -3335, "vector" -> -3328, "window" -> -3479))),
    "fr" -> ((-2056L, Map("a" -> -3404, "agg" -> -3350, "batch" -> -3277, "big" -> -3469, "column" -> -3327, "customer" -> -3404, "data" -> -3270, "dup" -> -7547, "fast" -> -3512, "filter" -> -3350, "group" -> -3486, "hash" -> -3595, "join" -> -3305, "key" -> -3327, "line" -> -3350, "merge" -> -3404, "order" -> -3396, "part" -> -3495, "query" -> -3277, "row" -> -3469, "scan" -> -3216, "slow" -> -3357, "small" -> -3291, "sort" -> -3452, "spark" -> -3549, "stream" -> -3412, "table" -> -3512, "the" -> -3521, "value" -> -3539, "vector" -> -3461, "window" -> -3412))),
    "zh" -> ((-1897L, Map("a" -> -3485, "agg" -> -3417, "batch" -> -3446, "big" -> -3541, "column" -> -3306, "customer" -> -3300, "data" -> -3374, "dup" -> -6391, "fast" -> -3346, "filter" -> -3381, "group" -> -3454, "hash" -> -3533, "join" -> -3201, "key" -> -3558, "line" -> -3477, "merge" -> -3388, "order" -> -3469, "part" -> -3461, "query" -> -3461, "row" -> -3300, "scan" -> -3333, "slow" -> -3424, "small" -> -3293, "sort" -> -3508, "spark" -> -3381, "stream" -> -3360, "table" -> -3431, "the" -> -3339, "value" -> -3339, "vector" -> -3346, "window" -> -3549))))

  private def caseSql(ws: Map[String, Int]): String =
    "CASE t " + ws.toSeq.sortBy(_._1).map { case (w, v) => s"WHEN '$w' THEN $v" }.mkString(" ") + " ELSE 0 END"


  def textLangid(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    // one `langscores5` kernel pass scores all models at once (hash probe
    // per token onto a multi-model weight vector) — same values as the
    // oracle's CASE chain; the per-model `aggregate` HOF folds this
    // replaces ran interpreted, 5 passes per document
    val base = Tables.documents(s, dir)
      .withColumn("ls", call_function("langscores5", col("text")))
    val scored = Models.zipWithIndex.foldLeft(base) {
      case (df, ((l, _), i)) => df.withColumn(s"s_$l", expr(s"ls[$i]"))
    }
    val m = greatest(Models.map { case (l, _) => col(s"s_$l") }: _*)
    val pred = Models.foldLeft(when(lit(false), "")) { case (c, (l, _)) =>
      c.when(col(s"s_$l") === m, l)
    }
    scored
      .select(col("doc_id") +: Models.map { case (l, _) => col(s"s_$l") } :+
        pred.as("pred_lang") :+ col("lang").as("true_lang") :+
        (pred === col("lang")).as("correct"): _*)
  }


  def textQuality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .withColumn("n_words", size(col("toks")))
      .withColumn("sum_wlen", expr("aggregate(toks, 0, (a, t) -> a + length(t))"))
      .withColumn("avg_wlen", col("sum_wlen").cast("double") / col("n_words"))
      .withColumn("clean_len",
        length(regexp_replace(col("text"), "[^a-z0-9 ]", "")))
      .withColumn("punct_ratio",
        (length(col("text")) - col("clean_len")).cast("double") / length(col("text")))
      .withColumn("stop_ratio",
        expr("size(filter(toks, t -> t in ('the', 'a')))").cast("double") / col("n_words"))
      .withColumn("quality",
        lit(0.4) * least(col("n_words") / 50.0, lit(1.0)) +
          lit(0.3) * (lit(1.0) - col("punct_ratio")) +
          lit(0.3) * least(col("avg_wlen") / 5.0, lit(1.0)))
      .select("doc_id", "n_words", "avg_wlen", "punct_ratio", "stop_ratio", "quality")

  /** FLESCH READABILITY in integer fixed-point — the readability band
    * every curation recipe (C4, Gopher rules) filters on, next to
    * [[textQuality]]'s length/punct ratios (which see neither sentences
    * nor syllables): per document, sentence count (terminal-punctuation
    * runs), word count (letter runs), syllable estimate (vowel-group
    * runs — the standard dictionary-free heuristic), then Flesch
    * reading-ease and Flesch–Kincaid grade in EXACT per-mille integers:
    * `fre_m = 206835 − (1015·words) div sents − (84600·syll) div words`
    * (floor div on positive operands ⇒ both engines agree bit-for-bit;
    * a float Flesch differs in the last ulp and flips band boundaries).
    *
    * Scale shape: scan-only — three codegen'd regex counters and four
    * integer divisions per row, zero exchanges; at 100 TB this is the
    * ideal operator: embarrassingly parallel, no state.
    */
  def textReadability(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_sent", greatest(lit(1L),
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))).cast("bigint")))
      .withColumn("n_words", greatest(lit(1L),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("bigint")))
      .withColumn("n_syll",
        size(regexp_extract_all(col("text"), lit("[aeiouy]+"), lit(0))).cast("bigint"))
      .withColumn("fre_m", expr(
        "206835 - (1015 * n_words) div n_sent - (84600 * n_syll) div n_words"))
      .withColumn("fkg_m", expr(
        "(390 * n_words) div n_sent + (11800 * n_syll) div n_words - 15590"))
      .select("doc_id", "n_sent", "n_words", "n_syll", "fre_m", "fkg_m")

  /** TYPE-TOKEN RATIO — lexical diversity per document (the Gopher
    * "fraction of unique words" gate; templated/spun content repeats a
    * tiny vocabulary and near-random content repeats none): distinct
    * tokens over total tokens in exact per-mille integers, plus the
    * hapax count (tokens occurring once — the classic richness signal
    * TTR alone misses: a doc can have high TTR with zero hapaxes only
    * at tiny lengths). `(1000·types) div toks` — floor div on positive
    * operands, bit-identical cross-engine.
    *
    * Scale shape: scan-only, zero exchanges — ONE `ttrstats` codegen
    * kernel call per row (O(L) hash counting; the HOF draft it replaced
    * ran an interpreted array_sort + aggregate fold per doc — the r10
    * lesson: Spark HOFs never enter whole-stage codegen); the per-doc
    * vocabulary is bounded by doc length, never corpus-scale.
    */
  def textTtr(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    Tables.documents(s, dir)
      .withColumn("ts", call_function("ttrstats", col("text")))
      .withColumn("n_toks", greatest(lit(1L), expr("ts[0]")))
      .withColumn("n_types", expr("ts[1]"))
      .withColumn("n_hapax", expr("ts[2]"))
      .withColumn("ttr_pm", expr("(1000 * n_types) div n_toks"))
      .select("doc_id", "n_toks", "n_types", "n_hapax", "ttr_pm")
  }

  /** ZIPF rank-frequency profile of the corpus vocabulary — the
    * power-law diagnostic a tokenizer/vocab pipeline inspects before
    * sizing a vocabulary: token frequencies ranked (freq desc, token
    * asc), then log2-binned by RANK into `(bucket, n_toks, sum_freq,
    * max_freq, min_freq)` — under Zipf each doubling-of-rank bucket
    * carries roughly equal mass, so the profile reads deviations at a
    * glance. `length(bin(rank))` = ⌊log2 rank⌋+1 in exact integer
    * arithmetic on both engines.
    *
    * Scale shape: the token explosion partial-aggregates map-side into
    * the vocabulary-scale frequency table (one exchange); the rank
    * window sorts the VOCAB, not the corpus — vocabulary is sublinear in
    * corpus size (Heaps' law), and at planet scale the single-partition
    * rank sort replaces with a two-pass range-partitioned rank, the
    * standard distributed-ranking upgrade. The final aggregate is
    * bounded (≤ ~40 buckets).
    */
  def textZipf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(s, dir)
      .select(explode(expr(toksExpr)).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("freq"), asc("tok"))))
      .withColumn("bucket", expr("CAST(length(bin(rank)) AS BIGINT)"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_toks"), sum("freq").as("sum_freq"),
        max("freq").as("max_freq"), min("freq").as("min_freq"))
      .orderBy("bucket")
  }

  /** χ² term KEYNESS between corpus slices (corpus-linguistics keyword
    * extraction; the domain-shift detector a curation pipeline runs when
    * a new source lands): the `lang = 'en'` slice vs the rest, per term
    * the 2×2 contingency χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) scaled to
    * exact integer PPM — the whole statistic cross-multiplies into
    * DECIMAL(38,0) (the evt_ab_test headroom contract: token counts to
    * ~10¹² keep N·(ad−bc)² under 38 digits after the single `div`), so
    * both engines rank the identical keyword list. G²/log-likelihood
    * keyness needs transcendental logs; χ² is the rational member of the
    * family, which is why it is the one an engine-portable pipeline
    * ships.
    *
    * Scale shape: ONE documents scan exploding tokens with a slice flag,
    * partial counts collapse map-side into the vocabulary-bounded term
    * frame (Heaps' law — sublinear in corpus); totals ride a window over
    * that tiny frame, never a fact rescan.
    */
  def textKeyness(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    Tables.documents(s, dir)
      .select(when(col("lang") === "en", 1L).otherwise(0L).as("is_en"),
        explode(expr(toksExpr)).as("term"))
      .groupBy("term")
      .agg(sum(col("is_en")).as("n_en"),
        sum(lit(1L) - col("is_en")).as("n_rest"))
      .withColumn("na", expr("sum(n_en) over ()"))
      .withColumn("nb", expr("sum(n_rest) over ()"))
      .withColumn("chi2_ppm", expr(
        s"""(cast(1000000 as $dec) * cast(na + nb as $dec)
           |  * cast(n_en * (nb - n_rest) - n_rest * (na - n_en) as $dec)
           |  * cast(n_en * (nb - n_rest) - n_rest * (na - n_en) as $dec))
           |div (cast(n_en + n_rest as $dec)
           |  * cast(na + nb - n_en - n_rest as $dec)
           |  * cast(na as $dec) * cast(nb as $dec))""".stripMargin))
      .withColumn("overused",
        when(col("n_en") * col("nb") > col("n_rest") * col("na"), lit("en"))
          .otherwise(lit("rest")))
      .select("term", "n_en", "n_rest", "chi2_ppm", "overused")
      .orderBy(desc("chi2_ppm"), asc("term"))
  }

  /** Whitespace vs BPE-ish (letter-run | digit-run | single symbol)
    * tokenization counts.
    */
  def textTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("ws_tokens", size(expr(toksExpr)))
      .withColumn("bpe_tokens",
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))))
      .withColumn("chars_per_tok",
        length(col("text")).cast("double") / col("ws_tokens"))
      .select("doc_id", "ws_tokens", "bpe_tokens", "chars_per_tok")

  /** Hashing-TF featurization (the HashingTF / feature-hashing trick):
    * each token hashes into a FIXED 256-bucket space (`md5head48 mod
    * 256` — engine-portable, no vocabulary pass), per-doc bucket counts
    * are the feature vector. Output: per-doc vector summaries
    * (`n_terms`, `nnz`, the order-independent index-weighted checksum
    * `dot_idx = Σ c·(b+1)`, and `l2_sq = Σ c²`) — the checksums pin
    * every bucket count without materializing 256 columns.
    *
    * Scale shape: the token explosion never shuffles raw — the
    * (doc, bucket) aggregate partial-aggregates map-side to ≤ 256 rows
    * per doc before its exchange, and the per-doc rollup is a second
    * doc-scale exchange. (A `repartition(doc_id)` single-exchange
    * variant would shuffle every TOKEN — strictly worse.)
    */
  def textHashTf(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"), explode(expr(toksExpr)).as("w"))
      .select(col("doc_id"),
        (call_function("md5head48", col("w")) % 256L).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    tf.groupBy("doc_id").agg(
      sum("c").as("n_terms"),
      count(lit(1)).as("nnz"),
      sum(col("c") * (col("b") + 1L)).as("dot_idx"),
      sum(col("c") * col("c")).as("l2_sq"))
  }

  /** Sequence PACKING for pretraining: concatenate documents in doc_id
    * order into fixed-length (512-token) training sequences; each doc gets
    * its start offset in the concatenated token stream and the sequence it
    * starts in — the deterministic "concat then chunk" packing a
    * dataloader replays without materializing the concatenation.
    *
    * Scale shape: the global running sum is a DISTRIBUTED PREFIX SUM, not
    * a single-partition window — per-block token totals (block = doc_id
    * div 4096) aggregate map-side, the tiny block table prefix-sums in one
    * task and broadcasts back, and the within-block running sum windows on
    * block-partitioned exchanges. No stage ever sees more than a block of
    * rows in one task, so the operator survives any corpus size; a plain
    * `Window.orderBy(doc_id)` would funnel 100 TB through one task.
    */
  def textPack(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(expr(toksExpr)).cast("bigint").as("n_tokens"))
      .withColumn("block", expr("doc_id div 4096"))
    val blockOff = docs.groupBy("block").agg(sum("n_tokens").as("btot"))
      .withColumn("boff", coalesce(sum("btot").over(
        Window.orderBy("block").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("block", "boff")
    val inBlock = Window.partitionBy("block").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.join(broadcast(blockOff), "block")
      .withColumn("start_off",
        col("boff") + coalesce(sum("n_tokens").over(inBlock), lit(0L)))
      .withColumn("seq_id", expr("start_off div 512"))
      .select("doc_id", "n_tokens", "start_off", "seq_id")
  }

  /** RAG CHUNKING — split every document into fixed-size token chunks
    * with overlap (size 64, stride 48 ⇒ 16-token overlap), the
    * context-window preparation step between [[textTokens]] (how many
    * tokens) and [[textPack]] (which sequence a doc lands in): per
    * chunk its index, token span `[tok_start, tok_start+tok_len)`, and
    * the first/last token as content anchors, so a retriever's chunk
    * table replays bit-for-bit. Chunk count is exact integer ceiling
    * arithmetic (`1 + (n−64+47) div 48` past one window) — no float
    * ceil for an engine to round differently.
    *
    * Scale shape: scan-only — the per-doc `sequence` explode is
    * map-side (fan-out n_tok/48 per doc, proportional to corpus bytes)
    * and zero exchanges follow; the chunk table is written as produced.
    */
  def textChunk(s: SparkSession, dir: String): DataFrame = {
    val C = 64L; val S = 48L
    Tables.documents(s, dir)
      .select(col("doc_id"), expr(toksExpr).as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("bigint"))
      .filter(col("n_tok") > 0)
      .withColumn("n_chunks", when(col("n_tok") <= C, lit(1L))
        .otherwise(lit(1L) + expr(s"(n_tok - $C + ${S - 1}) div $S")))
      .withColumn("chunk_idx", explode(expr("sequence(0L, n_chunks - 1)")))
      .withColumn("tok_start", col("chunk_idx") * S)
      .withColumn("tok_len",
        least(col("tok_start") + C, col("n_tok")) - col("tok_start"))
      .select(col("doc_id"), col("chunk_idx"), col("tok_start"), col("tok_len"),
        expr("toks[int(tok_start)]").as("first_tok"),
        expr("toks[int(tok_start + tok_len - 1)]").as("last_tok"))
  }

  /** BAD-WORD FILTER (the C4-style blocklist gate): score every document
    * against a broadcast term blocklist — hit count, per-mille hit rate
    * in exact integers, and the keep/drop verdict at a 2% threshold
    * (`50·hits ≥ n_tok`, cross-multiplied so no ratio rounds). The
    * lexicon here is a deterministic stand-in (real deployments load
    * thousands of terms); the MECHANISM — broadcast-scale set, one
    * in-kernel membership filter per token, verdict folded into the
    * same pass — is the production shape.
    *
    * Scale shape: scan-only, zero exchanges — the blocklist is a plan
    * literal at this size (a 10⁴-term list would bind via a broadcast
    * the way dedup_decontaminate's gram set does), and the per-doc
    * `filter(toks, …)` runs map-side.
    */
  def textBadwords(s: SparkSession, dir: String): DataFrame = {
    val lex = Seq("slow", "leak", "skew", "spill", "stale")
    Tables.documents(s, dir)
      .select(col("doc_id"), expr(toksExpr).as("toks"))
      .withColumn("n_tok", size(col("toks")).cast("bigint"))
      .filter(col("n_tok") > 0)
      .withColumn("n_hits", size(expr(
        s"filter(toks, t -> array_contains(array(${lex.map("'" + _ + "'").mkString(",")}), t))"))
        .cast("bigint"))
      .select(col("doc_id"), col("n_tok"), col("n_hits"),
        expr("(1000 * n_hits) div n_tok").as("hit_pm"),
        (col("n_hits") * 50L >= col("n_tok")).as("flagged"))
  }

  /** Top-3 SALIENT terms per document — the keyword-extraction step of a
    * corpus explorer: rank a doc's terms by (tf DESC, df ASC, term ASC),
    * i.e. tf-idf's ordering expressed purely in integers (frequent in
    * this doc, rare in the corpus) with no float arithmetic for an
    * engine to round differently.
    *
    * Scale shape: the explode fans out to one row per token, but the
    * (doc_id, term) tf aggregate partial-aggregates map-side before its
    * exchange (a doc's repeated tokens collapse in place, so the shuffle
    * carries distinct terms, not tokens); df reduces the already-distinct
    * tf rows; the per-doc window is Spark 4 WindowGroupLimit — the rank
    * cutoff prunes map-side, never materializing a doc's full term list
    * post-join.
    */
  def textSalient(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(s, dir)
      .select(col("doc_id"), explode(expr(toksExpr)).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("df").asc, col("term"))))
      .filter(col("rk") <= 3)
      .select("doc_id", "term", "tf", "df", "rk")
  }

  /** Canonical fingerprint: md5 of the sorted distinct token set — docs
    * with the same bag of words collide; keep-lowest-id per group.
    */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("fp", md5(expr(s"concat_ws(' ', array_sort(array_distinct($toksExpr)))")))
      .withColumn("keep_id",
        min("doc_id").over(org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .select(col("doc_id"), col("fp"), col("keep_id"),
        (col("doc_id") === col("keep_id")).as("is_canonical"))

  // PII patterns — the RE2 ∩ Java-regex common subset so Spark and the
  // DuckDB oracle compile identical semantics (no lookarounds, no \b).
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\+?[0-9][0-9 ()-]{6,}[0-9]"
  private[graft] val IdRe = "[0-9]{6,}"

  /** PII detection + redaction over any frame with (doc_id, text) —
    * factored so the spec can drive it with synthetic PII-bearing rows
    * (the benchmark corpus is word-soup and matches nothing, which is
    * itself asserted by the oracle: all counts 0, md5 unchanged).
    * Replacement order is fixed email → phone → id so nested matches
    * (digits inside a phone) can't double-redact differently per engine.
    */
  private[graft] def piiColumns(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_email"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).as("n_phone"),
      size(regexp_extract_all(col("text"), lit(IdRe), lit(0))).as("n_id"),
      md5(regexp_replace(regexp_replace(regexp_replace(col("text"),
        lit(EmailRe), lit("<EMAIL>")),
        lit(PhoneRe), lit("<PHONE>")),
        lit(IdRe), lit("<ID>"))).as("redacted_md5"))

  /** Scrub personally identifiable information before a corpus ships:
    * match counts per category plus a fingerprint of the redacted text
    * (the full redacted text is what a real pipeline would emit; the
    * fingerprint keeps the oracle compare narrow). Pure scan work.
    */
  def textPii(s: SparkSession, dir: String): DataFrame =
    piiColumns(Tables.documents(s, dir))

  /** Rolling-hash document fingerprint (Karp–Rabin over UTF-8 bytes, one
    * O(n) codegen kernel pass per document — graft.functions.RollHash8):
    * minimum window hash + its first byte offset + window count. The
    * winnowing-style local fingerprint a plagiarism/near-dup pass uses
    * when token-bag hashing (text_fingerprint) is too coarse.
    */
  def textRollhash(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    Tables.documents(s, dir)
      .withColumn("rh", call_function("rollhash8", col("text")))
      .select(col("doc_id"), col("rh").getItem(0).as("fp_min"),
        col("rh").getItem(1).as("fp_pos"), col("rh").getItem(2).as("n_windows"))
  }

  /** Winnowing fingerprint selection (Schleimer et al., SIGMOD'03) — THE
    * standard local document-fingerprinting scheme (MOSS): in every window
    * of [[graft.functions.TextKernels.WinnowW]] consecutive Karp–Rabin
    * window hashes select the minimum (rightmost on ties). Unlike
    * `text_rollhash`'s single global minimum or `dedup_substring`'s mod-p
    * sampling, winnowing guarantees a fingerprint in EVERY w-hash run, so
    * any shared substring of ≥ k+w−1 bytes is provably caught. One
    * `winnow8` kernel call per document — scan-only, codegen, no shuffle
    * at any corpus size; output is three integers per doc.
    */
  def textWinnowing(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    Tables.documents(s, dir)
      .withColumn("wn", call_function("winnow8", col("text")))
      .select(col("doc_id"), col("wn").getItem(0).as("n_windows"),
        col("wn").getItem(1).as("n_selected"), col("wn").getItem(2).as("fp_sum"))
  }

  /** Repetition ratios — the Gopher/CCNet-style quality signals a
    * training-data pipeline filters on: duplicate-word fraction,
    * duplicate-trigram fraction, and the most-frequent-token share. All
    * counts are exact integers; the ratios are single per-row IEEE
    * divisions (identical in both engines). Scan-only — no shuffle at any
    * scale.
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    // one `repstats` kernel call per doc: the expression chain this
    // replaces was interpreted (HOFs) and its top_tok_n term O(distinct ×
    // tokens) — per-doc QUADRATIC, measured ×17 at the sf1 scale run
    Tables.documents(s, dir)
      .withColumn("st", call_function("repstats", col("text")))
      .withColumn("n_tokens", expr("st[0]"))
      .withColumn("n_distinct", expr("st[1]"))
      .withColumn("n_grams", expr("st[2]"))
      .withColumn("n_gram_distinct", expr("st[3]"))
      .withColumn("top_tok_n", expr("st[4]"))
      .withColumn("dup_word_ratio",
        when(col("n_tokens") > 0,
          (col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens"))
          .otherwise(0.0))
      .withColumn("dup_gram_ratio",
        when(col("n_grams") > 0,
          (col("n_grams") - col("n_gram_distinct")).cast("double") / col("n_grams"))
          .otherwise(0.0))
      .withColumn("top_tok_ratio",
        when(col("n_tokens") > 0,
          col("top_tok_n").cast("double") / col("n_tokens")).otherwise(0.0))
      .select("doc_id", "n_tokens", "n_distinct", "n_grams", "top_tok_n",
        "dup_word_ratio", "dup_gram_ratio", "top_tok_ratio")
  }

  /** Bigram-LM fluency score (the CCNet quality-filter shape, arXiv:
    * 1911.00359 — there a pretrained KenLM scores perplexity per doc;
    * here the LM is self-trained on the corpus in the same job). Pass 1
    * reduces the corpus to the bigram/prefix count tables; pass 2 scores
    * every bigram occurrence with the integer fixed-point conditional
    * probability `(1e6·c(w1,w2)) div c(w1·)` — exact BIGINTs end to end,
    * so scores replay bit-for-bit in the oracle (a float log-prob sum
    * would be order-sensitive; an integer sum is not).
    *
    * Scale shape: both passes are scan + map-side partial aggregation;
    * the count tables are vocabulary-sized (≪ corpus — the whole reason
    * n-gram LMs train at web scale), so the score join broadcasts them
    * and the 100 TB side never shuffles; the per-doc fold is one keyed
    * exchange on doc_id.
    */
  def textBigramLm(s: SparkSession, dir: String): DataFrame = {
    val bi = Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
        .as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val cnt2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val cnt1 = bi.groupBy("w1").agg(count(lit(1)).as("c1"))
    bi.join(broadcast(cnt2), Seq("w1", "w2"))
      .join(broadcast(cnt1), Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr("(1000000 * c2) div c1")).as("sum_p6"))
      .withColumn("avg_p6", expr("sum_p6 div n_bigrams"))
  }

  /** Interpolated KNESER-NEY bigram model (`text_kn_lm`) — the smoothing
    * real LM toolkits default to, and the one whose distinctive statistic
    * (CONTINUATION counts: in how many distinct contexts does a word
    * appear, not how often) plain add-k/backoff models miss. Per bigram
    * type, with absolute discount D = 3/4 exact:
    * P_KN(w2|w1) = (c(w1w2) − D)/c(w1)
    *             + D·N1+(w1,·)/c(w1) · N1+(·,w2)/N1+(·,·)
    * kept in integer ppm as (10⁶·(4c₂−3)) div (4c₁) +
    * (3·10⁶·n1p·ncont) div (4c₁·ntot) — two floored terms, identical on
    * both engines.
    *
    * Scale shape: ONE bigram-type aggregate (vocabulary²-bounded) feeds
    * everything — context totals/successor counts, predecessor
    * continuation counts, and the global type count — so the corpus is
    * scanned once and all model tables broadcast.
    */
  def textKnLm(s: SparkSession, dir: String): DataFrame = {
    val bi = Tables.documents(s, dir)
      .withColumn("toks", expr(toksExpr))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val types = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint(true) // vocab²-bounded; consumed four ways below
    val c1 = types.groupBy("w1")
      .agg(sum("c2").as("c1"), count(lit(1)).as("n1p"))
    val cont = types.groupBy("w2").agg(count(lit(1)).as("ncont"))
    val ntotRow = types.agg(count(lit(1)).as("ntot"))
    graft.operators.Dedup.releasing(
      types.join(broadcast(c1), "w1").join(broadcast(cont), "w2")
        .crossJoin(broadcast(ntotRow))
        // continuation term in DECIMAL(38,0) (r14): 3·10⁶·n1p·ncont can
        // exceed BIGINT once the continuation tables reach ~10⁶ distinct
        // types each (web-scale vocabularies do); Spark would wrap
        // silently in non-ANSI mode while DuckDB raises. IntegralDivide
        // keeps the BIGINT output type and every in-range value; the
        // oracle mirrors with HUGEINT. The discount term stays integer:
        // 4·10⁶·c2 needs c2 > 2.3·10¹² tokens of ONE bigram to overflow.
        .withColumn("p_kn_ppm", expr(
          "(1000000 * (4 * c2 - 3)) div (4 * c1)" +
            " + (cast(3000000 as decimal(38,0)) * n1p * ncont)" +
            " div (cast(4 as decimal(38,0)) * c1 * ntot)"))
        .select("w1", "w2", "c2", "c1", "n1p", "ncont", "p_kn_ppm"),
      types)
  }

  /** Trigram STUPID-BACKOFF scoring (Brants et al., EMNLP 2007 — the
    * backoff chosen at web scale precisely because it needs no
    * normalization pass): even docs are the TRAINING half, odd docs are
    * scored — a held-out split, so the backoff path actually fires
    * (self-scored corpora see every trigram and the backoff is dead
    * code). S(w₃|w₁w₂) = c₁₂₃/c₁₂ when training saw the trigram, else
    * 0.4·c₂₃/c₂, else 0.4²·c₃/N — in exact integer millionths (0.4 =
    * 2/5 exact: 10⁶·c₁₂₃ div c₁₂ / 4·10⁵·c₂₃ div c₂ / 16·10⁴·c₃ div N),
    * so every score and the per-doc backoff-level census replay
    * bit-exact. A trigram seen in training implies its prefix bigram
    * was seen (same for the w₂w₃ → w₂ chain), so the divisions can
    * never hit zero by construction.
    *
    * Scale shape: n-gram count tables partial-aggregate map-side and
    * broadcast onto the scored trigrams (vocabulary-bounded — the
    * textBigramLm discipline; a web-scale LM shards them, the join
    * keys and plan shape stay the same), N is a 1-row scalar memoized
    * per dir; the scored side is ONE scan + map-side trigram explode,
    * aggregated straight back to doc grain.
    */
  def textBackoffLm(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).withColumn("toks", expr(toksExpr))
    def trigrams(df: DataFrame): DataFrame = df
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks)-3), i -> struct(toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3))"))
        .as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
    val train = docs.filter(col("doc_id") % 2 === 0)
    val trainBi = train.filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c123 = trigrams(train).groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).as("c123"))
    val c12 = trainBi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c23 = trainBi.groupBy(col("w1").as("w2"), col("w2").as("w3"))
      .agg(count(lit(1)).as("c23"))
    val c2 = train.select(explode(col("toks")).as("w2"))
      .groupBy("w2").agg(count(lit(1)).as("c2"))
    val c3 = train.select(explode(col("toks")).as("w3"))
      .groupBy("w3").agg(count(lit(1)).as("c3"))
    val n: Long = scalarCache.computeIfAbsent(s"backoff:$dir",
      _ => Array(train.agg(sum(size(col("toks"))).cast("long")).head.getLong(0)))(0)
    trigrams(docs.filter(col("doc_id") % 2 === 1))
      .join(broadcast(c123), Seq("w1", "w2", "w3"), "left")
      .join(broadcast(c12), Seq("w1", "w2"), "left")
      .join(broadcast(c23), Seq("w2", "w3"), "left")
      .join(broadcast(c2), Seq("w2"), "left")
      .join(broadcast(c3), Seq("w3"), "left")
      .withColumn("lvl", expr(
        "case when c123 is not null then 1 when c23 is not null then 2 else 3 end"))
      .withColumn("s6", expr(
        s"""case when c123 is not null then (1000000 * c123) div c12
           |when c23 is not null then (400000 * c23) div c2
           |else (160000 * coalesce(c3, 0)) div $n end""".stripMargin))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_l1"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_l2"),
        sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n_l3"),
        sum("s6").as("sum_s6"))
      .withColumn("avg_s6", expr("sum_s6 div n_tri"))
      .orderBy("doc_id")
  }

  /** CCNet head/middle/tail PARTITIONING (arXiv:1911.00359 §4.3) — the
    * step after LM scoring that splits the corpus into quality
    * terciles (head = most fluent third, kept; middle; tail = usually
    * dropped). Docs partition by their [[textBigramLm]] `avg_p6`
    * fluency score at EXACT tercile thresholds.
    *
    * Scale shape — exact global quantiles WITHOUT a global sort or a
    * single-partition window (the naive `ntile(3) OVER (ORDER BY
    * score)` — a non-starter at corpus scale): `avg_p6` lives in the
    * bounded integer domain [0, 1e6], so the score DISTRIBUTION is a
    * ≤1e6-row histogram that partial-aggregates map-side; the
    * cumulative walk + threshold pick run as a window over the
    * VALUE-DOMAIN-bounded histogram (its size is fixed by the score
    * granularity, not the corpus), and the two thresholds broadcast
    * back for a map-only bucket assignment. Ties at a threshold
    * resolve by score value alone — buckets are value-closed (every
    * equal-scored doc lands in the same bucket), the property the
    * deterministic replay needs and doc-granular ntile lacks.
    */
  def textLmBucket(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cached (r14): the scored frame is consumed by BOTH the tercile
    // histogram and the bucket assignment — without it the whole
    // bigram-LM scoring pipeline runs twice. Narrow (doc_id, avg_p6)
    // rows, released by the between-queries sweep.
    val scored = textBigramLm(s, dir).select("doc_id", "avg_p6").cache()
    val hist = scored.groupBy("avg_p6").agg(count(lit(1)).as("nv"))
    val thr = hist
      .withColumn("cum", sum("nv").over(Window.orderBy("avg_p6")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum("nv").over(Window.partitionBy()))
      .agg(
        min(when(col("cum") * 3L >= col("n"), col("avg_p6"))).as("t1"),
        min(when(col("cum") * 3L >= col("n") * 2L, col("avg_p6"))).as("t2"))
    scored.crossJoin(broadcast(thr))
      .withColumn("bucket",
        when(col("avg_p6") <= col("t1"), "tail")
          .when(col("avg_p6") <= col("t2"), "middle")
          .otherwise("head"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("avg_p6").as("min_p6"), max("avg_p6").as("max_p6"),
        sum("doc_id").as("id_sum"))
      .orderBy("bucket")
  }

  /** PMI-ranked collocation mining (Church & Hanks 1990) — the phrase
    * detector a tokenizer/curation pipeline runs to find multi-word
    * units worth fusing ("new york"-style). Score is the exact-integer
    * PMI *exponent*: lift6 = floor(1e6·c(w1w2)·T / (c(w1)·c(w2))) with
    * T the corpus token count — log is monotone, so ranking by lift is
    * ranking by PMI with no transcendental function to diverge between
    * engines. Bigrams below 3 occurrences are noise-floored out (the
    * classic PMI rare-pair pathology), top-20 with a full deterministic
    * tiebreak (lift desc, w1, w2).
    *
    * Scale shape: bigram emit is scan-side; both count tables partial-
    * aggregate map-side into vocabulary-bounded frames (≪ corpus, the
    * same argument as [[textBigramLm]]); unigram counts broadcast onto
    * the bigram frame; T is a 1-row scan aggregate inlined as a literal
    * (bounded collect, like the k-means centroids); the top-20 is a
    * TakeOrderedAndProject, never a full sort. DECIMAL(38,0) keeps
    * 1e6·c2·T exact to ~1e32 — comfortably past a 100 TB corpus.
    */
  /** Corpus scalar aggregates per dir, memoized (the geo_knn lesson:
    * plan construction must not re-run a scan job per explain/bench rep;
    * the dirs are write-once, a deployment would read catalog stats).
    */
  private val scalarCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  def textCollocations(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir).withColumn("toks", expr(toksExpr))
    val totalToks: Long = scalarCache.computeIfAbsent(s"colloc:$dir",
      _ => Array(docs.agg(sum(size(col("toks"))).cast("long")).head.getLong(0)))(0)
    val uni = docs.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val c2 = docs
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .filter(col("c2") >= 3)
    val dec = "decimal(38,0)"
    c2.join(broadcast(uni.select(col("w").as("w1"), col("c").as("c1a"))), "w1")
      .join(broadcast(uni.select(col("w").as("w2"), col("c").as("c1b"))), "w2")
      .withColumn("lift6", expr(
        s"(cast(1000000 as $dec) * cast(c2 as $dec) * cast($totalToks as $dec))" +
          s" div (cast(c1a as $dec) * cast(c1b as $dec))"))
      .orderBy(desc("lift6"), asc("w1"), asc("w2"))
      .limit(20)
      .withColumn("rnk", row_number().over(
        Window.orderBy(desc("lift6"), asc("w1"), asc("w2"))))
      .select("rnk", "w1", "w2", "c2", "c1a", "c1b", "lift6")
  }

  /** BM25 retrieval (Robertson et al., Okapi) over the corpus — the
    * relevance ranking a curation pipeline uses for quality-by-proximity
    * scoring and eval-set mining. Query set = every 101st document (the
    * same held-out split as [[Dedup]]'s decontamination bench); each
    * query is its doc's top-3 terms by within-doc tf. Documents are
    * scored with BM25's exact tf-saturation curve at the standard
    * k1 = 1.2, b = 0.75 — multiplying numerator and denominator by
    * 10·Σdl clears every fraction:
    *
    *   tfnorm = 22·tf·Σdl / (10·Σdl·tf + 3·Σdl + 9·dl·N)
    *
    * — and the idf factor is the Robertson–Spärck-Jones odds
    * (N−df+1)/(df+1) *un-logged*, keeping the whole per-term score a
    * ratio of integers (per-term rank order is identical to log-idf
    * BM25; the cross-term sum weights rare terms more sharply). Each
    * term contributes floor(1e6·tfnorm·odds) and a query's document
    * score is the exact integer sum — no float ever divides, so no
    * engine can disagree. DECIMAL(38,0) numerators stay ≤ ~2e37 even at
    * 100 TB (tf≲1e3, Σdl≲1e13, N≲1e11).
    *
    * Scale shape: postings (doc, term, tf, dl) are one scan + one keyed
    * exchange; the query-term table (1% of docs × 3 terms) and the df
    * table it gates broadcast onto the postings, so the corpus never
    * shuffles for the match; per-(query, doc) scores aggregate on a
    * frame already reduced to matched postings, and the top-5 window
    * runs on queries × candidates, ≪ corpus. Corpus scalars (N, Σdl)
    * are a 1-row count/sum scan inlined as literals.
    */
  /** Postings (term, doc_id, dl, tf) for a frame carrying `toks` — the
    * inverted-index rows [[textBm25]] derives in-query and [[Bm25Index]]
    * persists.
    */
  private[graft] def bm25Postings(corpus: DataFrame): DataFrame =
    corpus
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

  /** The query-term table: every 101st doc's top-3 within-doc-tf terms. */
  private[graft] def bm25QueryTerms(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    docs.filter(col("doc_id") % 101 === 0)
      .select(col("doc_id").as("query_id"), explode(col("toks")).as("term"))
      .groupBy("query_id", "term").agg(count(lit(1)).as("qtf"))
      .withColumn("qrk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("qtf"), asc("term"))))
      .filter(col("qrk") <= 3).select("query_id", "term")
  }

  /** The integer BM25 scoring + per-query top-5 over already-matched
    * frames (see [[textBm25]] for the formula derivation). The `qt` /
    * `dfq` joins carry NO static broadcast hint (r14): the query frame
    * is corpus-proportional by the benchmark's own construction (every
    * 101st doc contributes queries), so a pinned `broadcast()` would
    * materialize a corpus fraction on the driver at 100× — exactly the
    * trap [[Relational.q18Having]]'s doc warns about. AQE sizes the
    * runtime exchanges and picks the broadcast side itself at scales
    * where it fits (PlanAuditSpec pins the adaptive final plan).
    */
  /** Static index pruning cap: per probed term, only the
    * [[MaxPostingImpact]] highest-impact postings (tf DESC, doc_id) are
    * scored — the standard impact-ordered truncation (Carmel et al.
    * 2001) that bounds a term's candidate set no matter how degenerate
    * its posting list. Without it, a stopword-frequency term (every
    * 101st doc picks its TOP-tf terms as query terms, so the most
    * degenerate lists are exactly the probed ones) makes candidates
    * grow quadratically: queries ∝ corpus × posting length ∝ corpus —
    * measured ×36 at sf1. The cap is deterministic, replayed by the
    * oracle, and rank-filtered row_number lets Spark 4 plan it as a
    * map-side WindowGroupLimit prune, so the exchange itself carries
    * ≤ cap rows per term per partition.
    */
  private[operators] val MaxPostingImpact = 1024L

  private[graft] def bm25Score(post: DataFrame, qt: DataFrame,
      dfq: DataFrame, nDocs: Long, sumDl: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val capped = post.join(qt.select("term").distinct(), "term")
      .withColumn("imp_rk", row_number().over(
        Window.partitionBy("term").orderBy(desc("tf"), asc("doc_id"))))
      .filter(col("imp_rk") <= MaxPostingImpact)
      .drop("imp_rk")
    capped.join(qt, "term")
      .join(dfq, "term")
      .withColumn("score6", expr(
        s"(cast(1000000 as $dec) * cast(22 as $dec) * cast(tf as $dec) * cast($sumDl as $dec)" +
          s" * cast($nDocs - df + 1 as $dec)) div " +
          s"((cast(10 as $dec) * cast($sumDl as $dec) * cast(tf as $dec)" +
          s" + cast(3 as $dec) * cast($sumDl as $dec)" +
          s" + cast(9 as $dec) * cast(dl as $dec) * cast($nDocs as $dec)) * cast(df + 1 as $dec))"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("score6").as("score6"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("score6"), asc("doc_id"))))
      .filter(col("rk") <= 5)
      .select("query_id", "doc_id", "n_terms", "score6", "rk")
  }

  def textBm25(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).withColumn("toks", expr(toksExpr))
    val corpus = docs.filter(col("doc_id") % 101 =!= 0)
    val scal = scalarCache.computeIfAbsent(s"bm25:$dir", _ => {
      val r = corpus
        .agg(count(lit(1)).cast("long").as("n"),
          sum(size(col("toks"))).cast("long").as("sl")).head
      Array(r.getLong(0), r.getLong(1))
    })
    val (nDocs, sumDl) = (scal(0), scal(1))
    // the postings frame is consumed twice (df table + match probe) —
    // cache it so the corpus-side scan+exchange runs once, exactly the
    // persisted-inverted-index shape a deployment would use (same
    // cache-then-release discipline as Dedup's signature frame)
    val post = bm25Postings(corpus).cache()
    val qt = bm25QueryTerms(docs)
    val dfq = post.join(qt.select("term").distinct(), "term")
      .groupBy("term").agg(count(lit(1)).as("df"))
    Dedup.releasing(bm25Score(post, qt, dfq, nDocs, sumDl), post)
  }

  /** The first step of BPE tokenizer training (Sennrich et al. 2016):
    * count adjacent character pairs inside every word across the corpus
    * and rank the merge candidates — the argmax pair is the first merge
    * a tokenizer trained on this corpus would learn. Emits the top-10
    * candidates with a deterministic (count desc, pair asc) tiebreak.
    *
    * Scale shape: the pair emit is scan-side (token explode + in-word
    * character pairs), counts partial-aggregate map-side into a
    * vocabulary²-bounded key space, and the top-10 is a
    * TakeOrderedAndProject — no full sort, no shuffle beyond the count.
    * This is exactly how production BPE trainers distribute their count
    * phase; the merge LOOP re-runs it per merge with the learned pair
    * fused.
    */
  def textBpePairs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    // per-doc pair counts pre-aggregated by the bpepairs kernel: the scan
    // emits one row per DISTINCT pair per doc (vs one per occurrence
    // through a double explode + interpreted transform)
    Tables.documents(s, dir)
      .select(explode(call_function("bpepairs", col("text")))
        .as(Seq("pair", "n0")))
      .groupBy("pair").agg(sum("n0").as("n"))
      .orderBy(desc("n"), asc("pair"))
      .limit(10)
      .withColumn("rnk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(desc("n"), asc("pair"))))
      .select("rnk", "pair", "n")
  }

  /** Number of BPE merge rounds the trainer learns. */
  private[operators] val BpeRounds = 5

  /** Iterative BPE tokenizer training (Sennrich et al. 2016): the full
    * count→merge→recount loop for [[BpeRounds]] merges, not just the
    * round-1 candidate table of [[textBpePairs]]. Emits one row per
    * learned merge: `(round, pair, merged, n)` with the deterministic
    * (count desc, pair asc) tiebreak.
    *
    * Scale shape — the reason BPE trains at web scale: the corpus is
    * touched ONCE, collapsing into the word-frequency dictionary (one
    * scan + one exchange, vocabulary-sized output ≪ corpus). Every merge
    * round then runs on the dictionary alone: pair counts are a
    * freq-weighted explode + partial-aggregating groupBy over vocab rows,
    * the argmax is a 1-row TakeOrdered collect (bounded, like the k-means
    * centroid loop), and applying the merge is map-side `replace` on the
    * space-delimited symbol string — greedy left-to-right non-overlapping
    * in both engines, exactly the reference algorithm's regex sub. The
    * driver loop is [[BpeRounds]] bounded iterations; all data work is
    * declarative.
    */
  def textBpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    bpeLoop(s, dir)._2.toDF("round", "pair", "merged", "n")
  }

  /** The shared trainer loop: runs [[BpeRounds]] count→merge→recount
    * iterations and returns BOTH faces — the final word dictionary
    * `(word, s, f)` with every merge applied (what the encoder joins
    * against) and the learned merge list (what the trainer reports).
    *
    * The MERGE LIST is memoized per corpus dir (the geo_knn /
    * deconArtifact precedent): the trainer runs the corpus
    * word-dictionary job plus one argmax collect per round, and both
    * `textBpeTrain` and `textBpeApply` (and hence `graft.Cli tokenize`,
    * which calls both) need the same loop — without the memo the CLI
    * trained the tokenizer twice per invocation. Only the DRIVER-SIDE
    * merges are cached (5 small rows), never the dict DataFrame: its
    * backing local checkpoint is released between Verify/bench keys
    * (GraftSession.releaseStorage), so the cached dict face is rebuilt
    * DECLARATIVELY from dict0's lineage + the memoized merges — zero
    * jobs at construction, one extra word-dict scan inside whichever
    * job consumes it.
    */
  private val bpeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Int, String, String, Long)]]()

  private def bpeLoop(s: SparkSession, dir: String)
      : (DataFrame, Seq[(Int, String, String, Long)]) = {
    val cached = bpeCache.get(dir)
    if (cached != null)
      (cached.foldLeft(bpeDict0(s, dir)) { case (d, (_, pair, merged, _)) =>
        applyMerge(d, pair, merged)
      }, cached)
    else {
      val r = bpeLoopUncached(s, dir)
      bpeCache.put(dir, r._2)
      r
    }
  }

  /** The trained vocab's per-word BPE symbol counts, memoized per dir —
    * exactly the table [[textBpeApply]] BROADCASTS into its encode join,
    * so holding it driver-side is the same size class the encoder
    * already commits to (vocab-bounded, never corpus-bounded). Serving
    * the encoder from this memo keeps its plan at ONE documents scan
    * (LocalTableScan + broadcast for the dict side); rebuilding the dict
    * from lineage would rescan the corpus per consumer.
    */
  private val bpeVocabCache = new java.util.concurrent.ConcurrentHashMap[
    String, Array[(String, Int)]]()

  private def bpeVocab(s: SparkSession, dir: String): Array[(String, Int)] =
    bpeVocabCache.computeIfAbsent(dir, _ =>
      bpeLoop(s, dir)._1
        .select(col("word"), size(split(col("s"), " ")).as("n"))
        .collect().map(r => (r.getString(0), r.getInt(1))))

  /** Corpus → word-frequency dict with the initial char symbolization —
    * the trainer's round-0 state, as a plain declarative frame.
    */
  private def bpeDict0(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy("word").agg(count(lit(1)).as("f"))
      // initial symbolization: code-point chars joined by ' ' (the symbol
      // separator; symbols themselves never contain spaces)
      .select(col("word"),
        array_join(expr("filter(split(word, ''), c -> c <> '')"), " ")
          .as("s"), col("f"))

  /** One greedy left-to-right merge applied to the symbol column —
    * see the doubled-separator note in [[bpeLoopUncached]].
    */
  private def applyMerge(dict: DataFrame, pair: String, merged: String): DataFrame = {
    val (a, b) = (pair.split(" ")(0), pair.split(" ")(1))
    dict.withColumn("s",
      trim(replace(replace(
        concat(lit(" "), replace(col("s"), lit(" "), lit("  ")), lit(" ")),
        lit(s" $a  $b "), lit(s" $merged ")), lit("  "), lit(" "))))
  }

  private def bpeLoopUncached(s: SparkSession, dir: String)
      : (DataFrame, Seq[(Int, String, String, Long)]) = {
    // corpus → word-frequency dict; words under 2 chars can never hold a
    // pair (symbols only grow), so the dict drops them up front.
    // Checkpointed because the loop below collects against it 5 times.
    val dict0 = bpeDict0(s, dir).localCheckpoint(eager = true)
    var dict = dict0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= BpeRounds && !exhausted) {
      val top = dict
        .select(col("f"), expr("split(s, ' ')").as("sy"))
        // fully-merged words collapse to one symbol: sequence(0, -1)
        // DESCENDS in Spark rather than being empty, so guard explicitly
        .select(col("f"), explode(expr(
          "CASE WHEN size(sy) >= 2 THEN transform(sequence(0, size(sy) - 2), " +
            "i -> concat(sy[i], ' ', sy[i+1])) ELSE array() END"))
          .as("pair"))
        .groupBy("pair").agg(sum("f").as("n"))
        .orderBy(desc("n"), asc("pair")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val n = top(0).getLong(1)
        val merged = pair.replace(" ", "")
        merges += ((round, pair, merged, n))
        // greedy left-to-right merge, reference-equivalent: a plain
        // single-space replace under-merges alternating runs ("a b a b"
        // merges once — the trailing space of one match is the leading
        // space of the next), so applyMerge DOUBLES the separators
        // first: every occurrence then owns its boundary spaces, the
        // doubled pattern ' a  b ' matches exactly the lookaround-regex
        // positions, and the doubles collapse back afterwards
        dict = applyMerge(dict, pair, merged)
        round += 1
      }
    }
    (dict, merges.toSeq)
  }

  /** BPE ENCODING — the trainer's other face: tokenize the corpus with
    * the learned merges and report per-doc token counts (`n_tokens_bpe`
    * = symbols after all merges; the signal a pretraining pipeline
    * feeds into sequence packing and per-doc cost accounting).
    *
    * Scale shape — the amortization every real tokenizer uses: the
    * corpus is never re-symbolized per document. The trainer's final
    * dictionary already holds each distinct WORD's merged symbolization,
    * so encoding is one corpus scan exploded to words, a BROADCAST join
    * against the vocab-sized dict, and a per-doc fold (one keyed
    * exchange). Words under the dict's 2-char floor encode as one
    * symbol, exactly what their char split would yield.
    */
  def textBpeApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val enc = bpeVocab(s, dir).toSeq.toDF("word", "n_syms")
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(enc), Seq("word"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("n_syms").cast("long"), lit(1L))).as("n_tokens_bpe"))
  }

  /** The whole pretraining-curation pipeline as ONE declarative plan:
    * language gate (keep predicted 'en'), quality gate (≥10 words,
    * punctuation ≤ 30 % by the integer cross-multiplication
    * `(len−clean)·10 ≤ len·3` — no float threshold can flip cross-engine),
    * repetition gate (duplicate trigrams ≤ 20 %, same integer rule),
    * exact-dedup gate (first doc per sorted-distinct-token md5 wins), and
    * the benchmark-decontamination gate (zero exact word-trigram hits
    * against the held-out benchmark docs, Bloom-gated like the standalone
    * `dedup_bloom`, with the same per-doc `n_fp` false-positive audit).
    * Verdict + first-failing-stage reason per doc — what a real curation
    * run materializes before dropping rows. Benchmark docs themselves
    * (doc_id % 101 = 0) gate out as contaminated — by construction their
    * grams all hit — which is the verdict a curation run wants for them.
    *
    * Scale shape: every signal is scan-side expression work over the SAME
    * single documents scan (chaining the five standalone operators would
    * scan and shuffle five times); the only exchange is the fingerprint
    * window for the dedup gate. The decontamination artifact (bench gram
    * set + data-derived Bloom bitmap) is built by a separate
    * artifact-scale job and bound into the `deconstats` kernel the way a
    * broadcast join binds its hash relation, so the fact side stays one
    * pass + one keyed exchange, identical to `text_fingerprint` alone.
    */
  /** Benchmark-decontamination artifact per corpus dir: the held-out
    * docs' distinct gram set (artifact-scale — the premise of
    * decontamination is |bench| ≪ corpus) and the k=4 bitmap at the
    * data-derived dedup_bloom width. Memoized by dir because building it
    * runs a (small) Spark job at DataFrame-construction time — a plan
    * audit or a bench rep should not re-pay a job for an immutable
    * artifact (the corpus dirs here are write-once).
    */
  private val deconArtifactCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Array[Long], Array[String])]()

  private def deconArtifact(s: SparkSession, dir: String): (Long, Array[Long], Array[String]) =
    deconArtifactCache.computeIfAbsent(dir, _ => {
      import graft.functions.TextKernels
      val benchGrams = Tables.documents(s, dir)
        .filter(col("doc_id") % 101 === 0)
        .select(explode(call_function("wgrams3", col("text"))).as("g"))
        .distinct().collect().map(_.getString(0))
      val bits = Dedup.bloomBitsFor(benchGrams.length.toLong)
      val bitmap = Array.fill((bits / 64).toInt)(0L)
      benchGrams.foreach { g =>
        val h = TextKernels.md5Head48(
          org.apache.spark.unsafe.types.UTF8String.fromString(g))
        var j = 0
        while (j < 4) {
          val p = TextKernels.bloomPos(j, h, bits)
          bitmap((p >> 6).toInt) |= 1L << (p & 63).toInt
          j += 1
        }
      }
      (bits, bitmap, benchGrams)
    })

  /** Broadcast handle ids per dir: the artifact broadcasts ONCE per
    * corpus dir and every later plan reuses the handle (the advisor's
    * r11 item — a `typedLit` inlined the whole artifact into every
    * serialized plan; a broadcast ships the handle and fetches blocks
    * once per executor, the broadcast-join relation pattern).
    */
  private val deconBcIdCache =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** The decontamination artifact as a bindable Column — the
    * `deconstats` second argument, a `decon_artifact(id)` broadcast
    * reference resolved to its handle at plan time. Shared by
    * [[pipeCurate]] and the streaming face
    * ([[graft.streaming.CurateStream]]).
    */
  private[graft] def deconArtifactCol(s: SparkSession, dir: String) = {
    val id = deconBcIdCache.computeIfAbsent(dir, _ =>
      graft.functions.ArtifactBroadcasts.put(
        s.sparkContext.broadcast(deconArtifact(s, dir))))
    call_function("decon_artifact", lit(id))
  }

  /** Every per-document curation signal EXCEPT the dedup verdict (which
    * needs cross-document state): language scores + prediction, token/
    * gram counts, the canonical fingerprint, the decontamination stats,
    * and the four stateless gate flags. Shared verbatim by the batch
    * [[pipeCurate]] (which adds the fingerprint window) and the
    * streaming [[graft.streaming.CurateStream]] (which adds the
    * fingerprint state store), so the two faces cannot drift.
    */
  private[graft] def curateSignals(docs: DataFrame,
      artifact: org.apache.spark.sql.Column): DataFrame = {
    val base = docs
      .withColumn("toks", expr(toksExpr))
      .withColumn("ls", call_function("langscores5", col("text")))
    val scored = Models.zipWithIndex.foldLeft(base) {
      case (df, ((l, _), i)) => df.withColumn(s"s_$l", expr(s"ls[$i]"))
    }
    val m = greatest(Models.map { case (l, _) => col(s"s_$l") }: _*)
    val pred = Models.foldLeft(when(lit(false), "")) { case (c, (l, _)) =>
      c.when(col(s"s_$l") === m, l)
    }
    scored
      .withColumn("pred_lang", pred)
      // token/gram counts from the one-pass repstats kernel (same
      // filtered-token semantics as toksExpr; the HOF gram chain it
      // replaces ran interpreted and cost ~15× at the sf1 scale run)
      .withColumn("st", call_function("repstats", col("text")))
      .withColumn("n_words", expr("st[0]"))
      .withColumn("len", length(col("text")).cast("long"))
      .withColumn("clean_len",
        length(regexp_replace(col("text"), "[^a-z0-9 ]", "")).cast("long"))
      .withColumn("n_grams", expr("st[2]"))
      .withColumn("n_gram_dist", expr("st[3]"))
      .withColumn("fp", md5(expr("concat_ws(' ', array_sort(array_distinct(toks)))")))
      .withColumn("dc", call_function("deconstats", col("text"), artifact))
      .withColumn("ok_lang", col("pred_lang") === lit("en"))
      .withColumn("ok_quality", col("n_words") >= 10 &&
        (col("len") - col("clean_len")) * 10 <= col("len") * 3)
      .withColumn("ok_rep",
        (col("n_grams") - col("n_gram_dist")) * 5 <= col("n_grams"))
      .withColumn("n_fp", expr("dc[1] - dc[2]"))
      .withColumn("ok_decon", expr("dc[2] = 0"))
  }

  def pipeCurate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GeoFunctions.register(s)
    curateSignals(Tables.documents(s, dir), deconArtifactCol(s, dir))
      .withColumn("keep_id", min("doc_id").over(Window.partitionBy("fp")))
      .withColumn("ok_uniq", col("doc_id") === col("keep_id"))
      .withColumn("keep",
        col("ok_lang") && col("ok_quality") && col("ok_rep") &&
          col("ok_uniq") && col("ok_decon"))
      .withColumn("reason",
        when(!col("ok_lang"), "lang")
          .when(!col("ok_quality"), "quality")
          .when(!col("ok_rep"), "repetition")
          .when(!col("ok_uniq"), "duplicate")
          .when(!col("ok_decon"), "contaminated")
          .otherwise("kept"))
      .select("doc_id", "pred_lang", "n_words", "ok_lang", "ok_quality",
        "ok_rep", "ok_uniq", "n_fp", "ok_decon", "keep", "reason")
  }

  /** TRAINING MANIFEST — the end-of-pipeline artifact a pretraining run
    * actually consumes, composed from the SAME stages the standalone
    * keys expose: [[pipeCurate]]'s five-gate verdict selects the kept
    * docs, each gets its shard (pipe_shard's content hash), and the
    * kept set packs into 512-token sequences via text_pack's
    * distributed prefix sum — one row per surviving document:
    * `(doc_id, shard, n_tokens, start_off, seq_id)`. Because every
    * number is derived inside one composed plan, the manifest can
    * never disagree with the filters that produced it (recomputed
    * manifests drifting from the filter run is how real training
    * mixes go stale).
    *
    * Scale shape: the curation signals stay ONE documents scan
    * (expression kernels); the dedup-gate window and the pack's
    * block-prefix broadcast are the only exchanges beyond the bounded
    * block frame — the manifest adds NO new corpus-scale shuffle on
    * top of its ingredients.
    */
  def pipeManifest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GeoFunctions.register(s)
    val kept = curateSignals(Tables.documents(s, dir), deconArtifactCol(s, dir))
      .withColumn("keep_id", min("doc_id").over(Window.partitionBy("fp")))
      .filter(col("doc_id") === col("keep_id") &&
        col("ok_lang") && col("ok_quality") && col("ok_rep") && col("ok_decon"))
      .select(col("doc_id"), col("n_words").as("n_tokens"),
        expr("CAST(conv(substring(md5(text), 1, 8), 16, 10) AS BIGINT) % 16")
          .as("shard"))
      .withColumn("block", expr("doc_id div 4096"))
    val blockOff = kept.groupBy("block").agg(sum("n_tokens").as("btot"))
      .withColumn("boff", coalesce(sum("btot").over(
        Window.orderBy("block").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("block", "boff")
    val inBlock = Window.partitionBy("block").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    kept.join(broadcast(blockOff), "block")
      .withColumn("start_off",
        col("boff") + coalesce(sum("n_tokens").over(inBlock), lit(0L)))
      .withColumn("seq_id", expr("start_off div 512"))
      .select("doc_id", "shard", "n_tokens", "start_off", "seq_id")
  }

  /** DATA-BUDGET MIXTURE PLANNER — the per-source planning table a
    * pretraining run derives before sampling (the LLaMA/DoReMi-shape
    * "recipe" step): over the CURATED kept set (same five gates as
    * [[pipeCurate]], composed into this plan so the recipe can never
    * disagree with the filters), each source reports its kept
    * docs/tokens, its target share of the training budget (parts of
    * 200, [[Sampling.sampleMixture]]'s head/mid/tail scheme; budget =
    * half the kept corpus), and the three numbers the sampler needs:
    * `rate_ppm` (down-sampling rate when the source oversupplies its
    * slot), `epochs_x100` (repeat factor when it undersupplies — the
    * "how many passes over this source" number), and `deficit_toks`
    * (tokens short in a single epoch). All integer: the rate is a
    * DECIMAL(38,0) cross-multiplied floor (exact at 100 TB token
    * counts where `need·1e6` brushes BIGINT range), the epoch count an
    * integer ceiling — no float share can round differently across
    * engines.
    *
    * Scale shape: curation signals ride the ONE documents scan
    * (expression kernels); the dedup-gate window is the only
    * corpus-scale exchange; the per-source aggregate folds map-side
    * into a source-domain frame where the share window and arithmetic
    * are free.
    */
  def pipeMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GeoFunctions.register(s)
    val kept = curateSignals(Tables.documents(s, dir), deconArtifactCol(s, dir))
      .withColumn("keep_id", min("doc_id").over(Window.partitionBy("fp")))
      .filter(col("doc_id") === col("keep_id") &&
        col("ok_lang") && col("ok_quality") && col("ok_rep") && col("ok_decon"))
      .select(col("source"), col("n_words"))
    val part = when(col("source").isin("src0", "src1", "src2", "src3"), lit(30L))
      .when(col("source").isin("src4", "src5", "src6", "src7", "src8", "src9"),
        lit(10L))
      .otherwise(lit(2L))
    kept.groupBy("source")
      .agg(count(lit(1)).as("kept_docs"), sum("n_words").as("kept_toks"))
      .withColumn("part", part)
      .withColumn("need_toks",
        expr("(((sum(kept_toks) over ()) div 2) * part) div 200"))
      .withColumn("rate_ppm", least(lit(1000000L),
        expr("CAST((CAST(need_toks AS DECIMAL(38,0)) * 1000000) div kept_toks AS BIGINT)")))
      .withColumn("epochs_x100",
        expr("(100 * need_toks + kept_toks - 1) div kept_toks"))
      .withColumn("deficit_toks", greatest(lit(0L), col("need_toks") - col("kept_toks")))
      .select("source", "kept_docs", "kept_toks", "part", "need_toks",
        "rate_ppm", "epochs_x100", "deficit_toks")
      .orderBy("source")
  }

  /** SEQUENCE-LENGTH PROFILE — the token-length histogram a trainer
    * checks against its packing length before materializing shards
    * (a corpus of 30-token docs packed at 512 wastes most positions on
    * cross-doc attention boundaries; a 512+ tail means truncation):
    * per language, doubling length buckets with doc/token mass and the
    * per-mille doc share within the language. Bucket labels carry an
    * ordering prefix so lexicographic == numeric order in both engines.
    *
    * Scale shape: ONE documents scan, bucket CASE is scan-side codegen,
    * map-side partials into the (lang × 7) frame, the share window
    * rides that frame.
    */
  def textLenProfile(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_words", size(expr(toksExpr)).cast("bigint"))
      .withColumn("bucket",
        when(col("n_words") < 16, "a_lt16")
          .when(col("n_words") < 32, "b_16_31")
          .when(col("n_words") < 64, "c_32_63")
          .when(col("n_words") < 128, "d_64_127")
          .when(col("n_words") < 256, "e_128_255")
          .when(col("n_words") < 512, "f_256_511")
          .otherwise("g_512p"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("sum_toks"))
      .withColumn("share_pm",
        expr("(1000 * n_docs) div sum(n_docs) over (partition by lang)"))
      // no output sort: the driver's compare sorts rows, and a
      // presentational orderBy would cost a range exchange

  /** CORPUS NOVELTY SCORE — per document, the fraction of its distinct
    * word trigrams appearing for the FIRST time in doc-id order (the
    * memorization/novelty curve a data team plots to see where a crawl
    * stops contributing new content and starts repeating itself —
    * boilerplate-heavy tails score near zero). Gram sets come from the
    * one-pass `wgrams3` kernel; "first" is min(doc_id) per gram, so the
    * score is deterministic and replayable.
    *
    * Scale shape: gram explode partial-aggregates into the gram-keyed
    * first-seen table; the credit join back rides the SAME gram hash
    * partitioning (no extra exchange); the per-doc rollup is the one
    * doc-keyed exchange. The CCNet-dedup join discipline — keyed
    * equi-joins only, nothing quadratic.
    */
  def textNovelty(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GeoFunctions.register(s)
    val e = Tables.documents(s, dir)
      .select(col("doc_id"), explode(call_function("wgrams3", col("text"))).as("g"))
    val first = e.groupBy("g").agg(min("doc_id").as("first_doc"))
    val p = e.join(first, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
    Tables.documents(s, dir).select("doc_id")
      .join(p, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams", "n_novel"))
      .withColumn("novelty_pm", expr(
        "CASE WHEN n_grams = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (1000 * n_novel) div n_grams END"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_novelty" -> (textNovelty _),
    "text_len_profile" -> (textLenProfile _),
    "pipe_mix" -> (pipeMix _),
    "pipe_manifest" -> (pipeManifest _),
    "pipe_curate" -> (pipeCurate _),
    "pipe_report" -> (pipeReport _),
    "text_collocations" -> (textCollocations _),
    "text_bm25" -> (textBm25 _),
    "bm25_store" -> (Bm25Index.bm25Store _),
    "text_bpe_train" -> (textBpeTrain _),
    "text_bpe_apply" -> (textBpeApply _),
    "text_bpe_pairs" -> (textBpePairs _),
    "text_bigram_lm" -> (textBigramLm _),
    "text_kn_lm" -> (textKnLm _),
    "text_backoff_lm" -> (textBackoffLm _),
    "text_lm_bucket" -> (textLmBucket _),
    "text_repetition" -> (textRepetition _),
    "text_langid" -> (textLangid _),
    "text_confusion" -> (textConfusion _),
    "text_quality" -> (textQuality _),
    "text_readability" -> (textReadability _),
    "text_ttr" -> (textTtr _),
    "text_tokens" -> (textTokens _),
    "text_zipf" -> (textZipf _),
    "text_keyness" -> (textKeyness _),
    "text_hashtf" -> (textHashTf _),
    "text_pii" -> (textPii _),
    "text_rollhash" -> (textRollhash _),
    "text_winnowing" -> (textWinnowing _),
    "text_pack" -> (textPack _),
    "text_chunk" -> (textChunk _),
    "text_badwords" -> (textBadwords _),
    "text_salient" -> (textSalient _),
    "text_fingerprint" -> (textFingerprint _))

  /** CURATION REPORT — the dataset-card table a training run documents
    * (the per-language row of The Pile / LLaMA data tables): the
    * [[pipeCurate]] per-document verdicts rolled up per predicted
    * language into doc counts, kept counts, per-gate fail counts, word
    * mass, and the exact per-mille keep rate. One more bounded
    * aggregate on top of the one-scan curation plan — the report and
    * the pipeline share every stage, so the numbers can never drift
    * from what the filter actually did (a separately-computed report
    * is how real dataset cards go stale).
    */
  def pipeReport(s: SparkSession, dir: String): DataFrame =
    pipeCurate(s, dir)
      .groupBy("pred_lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("ok_lang"), 1L).otherwise(0L)).as("n_lang_fail"),
        sum(when(!col("ok_quality"), 1L).otherwise(0L)).as("n_quality_fail"),
        sum(when(!col("ok_rep"), 1L).otherwise(0L)).as("n_rep_fail"),
        sum(when(!col("ok_uniq"), 1L).otherwise(0L)).as("n_dup"),
        sum(when(!col("ok_decon"), 1L).otherwise(0L)).as("n_contaminated"),
        sum("n_words").as("sum_words"))
      .withColumn("keep_pm", expr("(1000 * n_kept) div n_docs"))
      .orderBy("pred_lang")

  /** DuckDB replay of [[textLangid]]'s per-doc scores/prediction —
    * shared by the `text_langid` oracle and `text_confusion`'s rollup.
    */
  private lazy val langidSql: String = {
    val scores = Models.map { case (l, (prior, ws)) =>
      s"$prior + coalesce(list_sum(list_transform(toks, t -> ${caseSql(ws)})), 0) AS s_$l"
    }.mkString(",\n    ")
    val m = s"greatest(${Models.map("s_" + _._1).mkString(", ")})"
    val pred = "CASE " + Models.map { case (l, _) => s"WHEN s_$l = $m THEN '$l'" }
      .mkString(" ") + " END"
    s"""SELECT doc_id, ${Models.map(p => s"CAST(s_${p._1} AS BIGINT) AS s_${p._1}").mkString(", ")},
       |  $pred AS pred_lang, lang AS true_lang, ($pred = lang) AS correct
       |FROM (SELECT doc_id, lang, $scores
       |      FROM (SELECT doc_id, lang, $toksSql AS toks FROM documents) t0) t1
       |ORDER BY doc_id""".stripMargin
  }

  /** Langid CONFUSION MATRIX — the classifier-eval face next to
    * [[textLangid]]'s per-doc scores (a pipeline trusts its language
    * gate only after seeing this table): per (true, predicted) cell the
    * count, row/column masses, and exact per-mille recall (cell/row)
    * and precision (cell/column) — diagonal cells read directly as the
    * per-class metrics. Float rates differ in the last ulp; per-mille
    * floor division cannot.
    *
    * Scale shape: the scored scan partial-aggregates map-side into the
    * ≤|langs|² cell frame; both mass windows run over that bounded
    * frame, never the corpus.
    */
  def textConfusion(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    textLangid(s, dir)
      .groupBy("true_lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .withColumn("row_n", sum("n").over(Window.partitionBy("true_lang")))
      .withColumn("col_n", sum("n").over(Window.partitionBy("pred_lang")))
      .withColumn("recall_pm", expr("(1000 * n) div row_n"))
      .withColumn("precision_pm", expr("(1000 * n) div col_n"))
      .orderBy("true_lang", "pred_lang")
  }

  private def pipeCurateSql: String = {
    val scores = Models.map { case (l, (prior, ws)) =>
      s"$prior + coalesce(list_sum(list_transform(toks, t -> ${caseSql(ws)})), 0) AS s_$l"
    }.mkString(",\n    ")
    val m = s"greatest(${Models.map("s_" + _._1).mkString(", ")})"
    val pred = "CASE " + Models.map { case (l, _) => s"WHEN s_$l = $m THEN '$l'" }
      .mkString(" ") + " END"
    val pj = Dedup.bloomPosSql
    val inChecks = Dedup.bloomInChecksSql
    s"""WITH t0 AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |t1 AS (SELECT doc_id, text, toks, $scores FROM t0),
       |t2 AS (SELECT doc_id,
       |    $pred AS pred_lang,
       |    CAST(len(toks) AS BIGINT) AS n_words,
       |    CAST(length(text) AS BIGINT) AS len,
       |    CAST(length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS BIGINT)
       |      AS clean_len,
       |    CASE WHEN len(toks) >= 3
       |      THEN list_transform(range(1, CAST(len(toks) - 1 AS BIGINT)),
       |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |      ELSE CAST([] AS VARCHAR[]) END AS grams3,
       |    md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp
       |  FROM t1),
       |dg AS MATERIALIZED (SELECT doc_id,
       |    CASE WHEN len(w) >= 3 THEN
       |      list_distinct(list_transform(range(1, len(w) - 1),
       |                    i -> array_to_string(w[i:i+2], ' ')))
       |    ELSE [] END AS gs
       |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       |bench AS MATERIALIZED (SELECT DISTINCT unnest(gs) AS g FROM dg WHERE doc_id % 101 = 0),
       |bw AS (${Dedup.bloomWidthSelectSql}
       |  WHERE v >= 8 * (SELECT count(*) FROM bench)),
       |bh AS (SELECT CAST(('0x' || substr(md5(g), 1, 12)) AS BIGINT) AS h
       |  FROM bench, bw),
       |bp AS (SELECT $pj FROM bh, bw),
       |bpos AS MATERIALIZED (SELECT DISTINCT p FROM (
       |  SELECT p0 AS p FROM bp UNION ALL SELECT p1 FROM bp
       |  UNION ALL SELECT p2 FROM bp UNION ALL SELECT p3 FROM bp)),
       |tg AS (SELECT c.doc_id, u.g AS g,
       |    CAST(('0x' || substr(md5(u.g), 1, 12)) AS BIGINT) AS h
       |  FROM dg c, unnest(c.gs) AS u(g)),
       |tp AS (SELECT doc_id, g, $pj FROM tg, bw),
       |fl AS (SELECT doc_id, ($inChecks) AS maybe,
       |    g IN (SELECT g FROM bench) AS th FROM tp),
       |dstats AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN maybe THEN 1 ELSE 0 END)
       |      - sum(CASE WHEN th THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
       |    CAST(sum(CASE WHEN th THEN 1 ELSE 0 END) AS BIGINT) AS n_true
       |  FROM fl GROUP BY doc_id),
       |t3 AS (SELECT doc_id, pred_lang, n_words,
       |    pred_lang = 'en' AS ok_lang,
       |    n_words >= 10 AND (len - clean_len) * 10 <= len * 3 AS ok_quality,
       |    (CAST(len(grams3) AS BIGINT) - CAST(len(list_distinct(grams3)) AS BIGINT)) * 5
       |      <= CAST(len(grams3) AS BIGINT) AS ok_rep,
       |    doc_id = min(doc_id) OVER (PARTITION BY fp) AS ok_uniq,
       |    coalesce(ds.n_fp, CAST(0 AS BIGINT)) AS n_fp,
       |    coalesce(ds.n_true, CAST(0 AS BIGINT)) = 0 AS ok_decon
       |  FROM t2 LEFT JOIN dstats ds USING (doc_id))
       |SELECT doc_id, pred_lang, n_words, ok_lang, ok_quality, ok_rep, ok_uniq,
       |  n_fp, ok_decon,
       |  ok_lang AND ok_quality AND ok_rep AND ok_uniq AND ok_decon AS keep,
       |  CASE WHEN NOT ok_lang THEN 'lang'
       |       WHEN NOT ok_quality THEN 'quality'
       |       WHEN NOT ok_rep THEN 'repetition'
       |       WHEN NOT ok_uniq THEN 'duplicate'
       |       WHEN NOT ok_decon THEN 'contaminated'
       |       ELSE 'kept' END AS reason
       |FROM t3 ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of the full [[textBpeTrain]] loop: one CTE triple
    * (pair counts → argmax merge → merged dictionary) per round, chained
    * from the same word-frequency dict, with the same greedy
    * space-delimited `replace` merge.
    */
  /** The CTE chain both BPE oracles share: w0 (word-frequency dict,
    * char-symbolized) and per-round (pair counts → argmax merge → merged
    * dict), with `word` carried through so the apply oracle can join the
    * final dictionary back to the corpus.
    */
  private def bpeChainSql: String = {
    val w0 =
      """w0 AS MATERIALIZED (SELECT word,
        |    array_to_string(list_filter(string_split(word, ''), c -> c <> ''), ' ') AS s,
        |    f
        |  FROM (SELECT word, CAST(count(*) AS BIGINT) AS f
        |        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |        WHERE length(word) >= 2 GROUP BY word))""".stripMargin
    val rounds = (1 to BpeRounds).map { r =>
      s"""p$r AS MATERIALIZED (SELECT pair, CAST(sum(f) AS BIGINT) AS n FROM (
         |    SELECT f, unnest(list_transform(range(1, len(sy)),
         |        i -> sy[i] || ' ' || sy[i+1])) AS pair
         |    FROM (SELECT string_split(s, ' ') AS sy, f FROM w${r - 1}))
         |  GROUP BY pair),
         |m$r AS MATERIALIZED (SELECT pair, replace(pair, ' ', '') AS merged, n
         |  FROM p$r ORDER BY n DESC, pair LIMIT 1),
         |w$r AS MATERIALIZED (SELECT word, trim(replace(replace(
         |    ' ' || replace(s, ' ', '  ') || ' ',
         |    ' ' || replace((SELECT pair FROM m$r), ' ', '  ') || ' ',
         |    ' ' || (SELECT merged FROM m$r) || ' '), '  ', ' ')) AS s, f
         |  FROM w${r - 1})""".stripMargin
    }
    s"$w0,\n${rounds.mkString(",\n")}"
  }

  private def bpeTrainSql: String = {
    val sel = (1 to BpeRounds)
      .map(r => s"SELECT $r AS round, pair, merged, n FROM m$r")
      .mkString("\nUNION ALL ")
    s"WITH $bpeChainSql\n$sel\nORDER BY round"
  }

  private def bpeApplySql: String =
    s"""WITH $bpeChainSql,
       |enc AS (SELECT word, CAST(len(string_split(s, ' ')) AS BIGINT) AS n_syms
       |  FROM w$BpeRounds),
       |dw AS (SELECT doc_id, word FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE word <> '')
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(coalesce(enc.n_syms, 1)) AS BIGINT) AS n_tokens_bpe
       |FROM dw LEFT JOIN enc USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "pipe_curate" -> pipeCurateSql,
    // novelty: the dg gram CTE is the wgrams3 parity form (split WITHOUT
    // empty-filtering — the kernel's documented quirk, same as the
    // decontamination oracles)
    "text_novelty" ->
      """WITH dg AS MATERIALIZED (SELECT doc_id,
        |    CASE WHEN len(w) >= 3 THEN
        |      list_distinct(list_transform(range(1, len(w) - 1),
        |                    i -> array_to_string(w[i:i+2], ' ')))
        |    ELSE [] END AS gs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |e AS MATERIALIZED (SELECT doc_id, unnest(gs) AS g FROM dg),
        |f AS (SELECT g, min(doc_id) AS first_doc FROM e GROUP BY 1),
        |p AS (SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_novel
        |  FROM e JOIN f USING (g) GROUP BY 1)
        |SELECT d.doc_id, coalesce(p.n_grams, 0) AS n_grams,
        |  coalesce(p.n_novel, 0) AS n_novel,
        |  CASE WHEN coalesce(p.n_grams, 0) = 0 THEN CAST(0 AS BIGINT)
        |       ELSE CAST((1000 * p.n_novel) // p.n_grams AS BIGINT)
        |  END AS novelty_pm
        |FROM documents d LEFT JOIN p ON p.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "text_len_profile" ->
      s"""WITH d AS (SELECT lang,
         |    CAST(len($toksSql) AS BIGINT) AS n_words FROM documents),
         |b AS (SELECT lang,
         |    CASE WHEN n_words < 16 THEN 'a_lt16'
         |         WHEN n_words < 32 THEN 'b_16_31'
         |         WHEN n_words < 64 THEN 'c_32_63'
         |         WHEN n_words < 128 THEN 'd_64_127'
         |         WHEN n_words < 256 THEN 'e_128_255'
         |         WHEN n_words < 512 THEN 'f_256_511'
         |         ELSE 'g_512p' END AS bucket,
         |    n_words FROM d),
         |g AS (SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(n_words) AS BIGINT) AS sum_toks FROM b GROUP BY 1, 2)
         |SELECT lang, bucket, n_docs, sum_toks,
         |  CAST((1000 * n_docs) // (sum(n_docs) OVER (PARTITION BY lang))
         |    AS BIGINT) AS share_pm
         |FROM g ORDER BY lang, bucket""".stripMargin,
    // mix = the same curate verdict CTE → per-source kept totals →
    // exact-integer budget arithmetic (HUGEINT replays the DECIMAL(38,0)
    // cross-multiplication)
    "pipe_mix" ->
      s"""WITH kc AS (SELECT doc_id, n_words FROM ($pipeCurateSql) c
         |  WHERE keep),
         |j AS (SELECT d.source, k.n_words
         |  FROM kc k JOIN documents d ON d.doc_id = k.doc_id),
         |g AS (SELECT source, CAST(count(*) AS BIGINT) AS kept_docs,
         |    CAST(sum(n_words) AS BIGINT) AS kept_toks FROM j GROUP BY 1),
         |p AS (SELECT source, kept_docs, kept_toks,
         |    CAST(CASE WHEN source IN ('src0','src1','src2','src3') THEN 30
         |         WHEN source IN ('src4','src5','src6','src7','src8','src9')
         |           THEN 10 ELSE 2 END AS BIGINT) AS part,
         |    CAST(sum(kept_toks) OVER () AS BIGINT) AS total_toks FROM g),
         |q AS (SELECT source, kept_docs, kept_toks, part,
         |    CAST(((total_toks // 2) * part) // 200 AS BIGINT) AS need_toks
         |  FROM p)
         |SELECT source, kept_docs, kept_toks, part, need_toks,
         |  CAST(least(1000000,
         |    (CAST(need_toks AS HUGEINT) * 1000000) // kept_toks) AS BIGINT)
         |    AS rate_ppm,
         |  CAST((100 * need_toks + kept_toks - 1) // kept_toks AS BIGINT)
         |    AS epochs_x100,
         |  CAST(greatest(0, need_toks - kept_toks) AS BIGINT) AS deficit_toks
         |FROM q ORDER BY source""".stripMargin,
    // manifest = curate verdicts (same CTE) → shard hash → pack prefix;
    // the oracle replays the pack as ONE global window (text_pack
    // precedent — the Spark side's block prefix is the distributed form)
    "pipe_manifest" ->
      s"""WITH kept AS (SELECT doc_id, n_words FROM ($pipeCurateSql) c
         |  WHERE keep),
         |d AS (SELECT k.doc_id, k.n_words AS n_tokens,
         |    CAST(('0x' || substr(md5(doc.text), 1, 8)) AS BIGINT) % 16
         |      AS shard
         |  FROM kept k JOIN documents doc ON doc.doc_id = k.doc_id),
         |p AS (SELECT doc_id, n_tokens, shard,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS start_off
         |  FROM d)
         |SELECT doc_id, shard, n_tokens,
         |  CAST(start_off AS BIGINT) AS start_off,
         |  CAST(start_off // 512 AS BIGINT) AS seq_id FROM p""".stripMargin,
    "pipe_report" ->
      s"""SELECT pred_lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN NOT ok_lang THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_lang_fail,
         |  CAST(sum(CASE WHEN NOT ok_quality THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_quality_fail,
         |  CAST(sum(CASE WHEN NOT ok_rep THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_rep_fail,
         |  CAST(sum(CASE WHEN NOT ok_uniq THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  CAST(sum(CASE WHEN NOT ok_decon THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_contaminated,
         |  CAST(sum(n_words) AS BIGINT) AS sum_words,
         |  CAST((1000 * sum(CASE WHEN keep THEN 1 ELSE 0 END)) // count(*)
         |    AS BIGINT) AS keep_pm
         |FROM ($pipeCurateSql) rep
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_bpe_train" -> bpeTrainSql,
    "text_bpe_apply" -> bpeApplySql,
    "text_collocations" ->
      s"""WITH t0 AS (SELECT $toksSql AS tk FROM documents),
         |uni AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT unnest(tk) AS w FROM t0) GROUP BY 1),
         |tt AS (SELECT CAST(sum(c) AS HUGEINT) AS t FROM uni),
         |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM (
         |    SELECT unnest(tk[1:len(tk) - 1]) AS w1, unnest(tk[2:len(tk)]) AS w2
         |    FROM t0 WHERE len(tk) >= 2)
         |  GROUP BY 1, 2 HAVING count(*) >= 3),
         |sc AS (SELECT c2.w1, c2.w2, c2.c2, a.c AS c1a, b.c AS c1b,
         |    CAST((1000000::HUGEINT * c2.c2 * tt.t)
         |         // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS lift6
         |  FROM c2 JOIN uni a ON a.w = c2.w1 JOIN uni b ON b.w = c2.w2, tt)
         |SELECT CAST(row_number() OVER (ORDER BY lift6 DESC, w1, w2) AS INT) AS rnk,
         |  w1, w2, c2, c1a, c1b, lift6
         |FROM sc ORDER BY lift6 DESC, w1, w2 LIMIT 20""".stripMargin,
    "text_bm25" -> bm25Sql,
    "bm25_store" -> bm25Sql) ++ moreOracles

  /** Shared by `text_bm25` and `bm25_store` — the store lifecycle must
    * reproduce the one-shot computation exactly, so they verify against
    * the SAME SQL.
    */
  private[operators] def bm25Sql: String =
      s"""WITH t0 AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |sc AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(len(tk)) AS BIGINT) AS sl
         |  FROM t0 WHERE doc_id % 101 <> 0),
         |post AS MATERIALIZED (SELECT doc_id, dl, term,
         |    CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS term
         |        FROM t0 WHERE doc_id % 101 <> 0)
         |  GROUP BY 1, 2, 3),
         |qt AS MATERIALIZED (SELECT query_id, term FROM (
         |    SELECT query_id, term,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY qtf DESC, term) AS qrk
         |    FROM (SELECT doc_id AS query_id, term, count(*) AS qtf
         |          FROM (SELECT doc_id, unnest(tk) AS term
         |                FROM t0 WHERE doc_id % 101 = 0)
         |          GROUP BY 1, 2)) WHERE qrk <= 3),
         |dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post
         |  WHERE term IN (SELECT term FROM qt) GROUP BY 1),
         |cap AS (SELECT doc_id, dl, term, tf FROM (
         |    SELECT p.doc_id, p.dl, p.term, p.tf,
         |      row_number() OVER (PARTITION BY term
         |        ORDER BY tf DESC, doc_id) AS imp_rk
         |    FROM post p WHERE term IN (SELECT term FROM qt)) c
         |  WHERE imp_rk <= ${MaxPostingImpact}),
         |hits AS (SELECT q.query_id, p.doc_id,
         |    CAST((1000000::HUGEINT * 22 * p.tf * sc.sl * (sc.n - d.df + 1))
         |      // ((10::HUGEINT * sc.sl * p.tf + 3::HUGEINT * sc.sl
         |          + 9::HUGEINT * p.dl * sc.n) * (d.df + 1)) AS BIGINT) AS score6
         |  FROM cap p JOIN qt q USING (term) JOIN dfq d USING (term), sc),
         |agg AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         |    CAST(sum(score6) AS BIGINT) AS score6
         |  FROM hits GROUP BY 1, 2)
         |SELECT query_id, doc_id, n_terms, score6, CAST(rk AS INT) AS rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY score6 DESC, doc_id) AS rk FROM agg) t
         |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  private def moreOracles: Map[String, String] = Map(
    "text_bpe_pairs" ->
      s"""WITH t AS (SELECT unnest($toksSql) AS t FROM documents),
         |cs AS (SELECT string_split(t, '') AS c FROM t WHERE length(t) >= 2),
         |pairs AS (SELECT unnest(c[1:len(c) - 1]) || unnest(c[2:len(c)]) AS pair
         |  FROM cs),
         |counts AS (SELECT pair, count(*) AS n FROM pairs GROUP BY 1)
         |SELECT CAST(row_number() OVER (ORDER BY n DESC, pair) AS INT) AS rnk,
         |  pair, n
         |FROM counts ORDER BY n DESC, pair LIMIT 10""".stripMargin,
    "text_kn_lm" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |bi AS (SELECT unnest(tk[1:len(tk) - 1]) AS w1, unnest(tk[2:len(tk)]) AS w2
         |  FROM toks WHERE len(tk) >= 2),
         |t AS MATERIALIZED (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
         |  FROM bi GROUP BY 1, 2),
         |cx AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
         |    CAST(count(*) AS BIGINT) AS n1p FROM t GROUP BY 1),
         |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS ncont FROM t GROUP BY 1),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS ntot FROM t)
         |SELECT w1, w2, c2, c1, n1p, ncont,
         |  CAST((1000000 * (4 * c2 - 3)) // (4 * c1)
         |    + (CAST(3000000 AS HUGEINT) * n1p * ncont)
         |      // (CAST(4 AS HUGEINT) * c1 * (SELECT ntot FROM nt)) AS BIGINT)
         |    AS p_kn_ppm
         |FROM t JOIN cx USING (w1) JOIN cont USING (w2)
         |ORDER BY w1, w2""".stripMargin,
    "text_bigram_lm" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |bi AS (SELECT doc_id, unnest(tk[1:len(tk) - 1]) AS w1,
         |    unnest(tk[2:len(tk)]) AS w2
         |  FROM toks WHERE len(tk) >= 2),
         |cnt2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
         |cnt1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         |scored AS (SELECT doc_id, count(*) AS n_bigrams,
         |    CAST(sum((1000000 * c2) // c1) AS BIGINT) AS sum_p6
         |  FROM bi JOIN cnt2 USING (w1, w2) JOIN cnt1 USING (w1)
         |  GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, sum_p6,
         |  CAST(sum_p6 // n_bigrams AS BIGINT) AS avg_p6
         |FROM scored ORDER BY doc_id""".stripMargin,
    "text_backoff_lm" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |tri AS (SELECT doc_id, unnest(tk[1:len(tk) - 2]) AS w1,
         |    unnest(tk[2:len(tk) - 1]) AS w2, unnest(tk[3:len(tk)]) AS w3
         |  FROM toks WHERE len(tk) >= 3),
         |bi AS (SELECT unnest(tk[1:len(tk) - 1]) AS w1, unnest(tk[2:len(tk)]) AS w2
         |  FROM toks WHERE doc_id % 2 = 0 AND len(tk) >= 2),
         |c123 AS (SELECT w1, w2, w3, count(*) AS c123 FROM tri
         |  WHERE doc_id % 2 = 0 GROUP BY 1, 2, 3),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
         |c23 AS (SELECT w1 AS w2, w2 AS w3, count(*) AS c23 FROM bi GROUP BY 1, 2),
         |uni AS (SELECT unnest(tk) AS w FROM toks WHERE doc_id % 2 = 0),
         |c2 AS (SELECT w AS w2, count(*) AS c2 FROM uni GROUP BY 1),
         |c3 AS (SELECT w AS w3, count(*) AS c3 FROM uni GROUP BY 1),
         |nn AS (SELECT CAST(sum(len(tk)) AS BIGINT) AS n FROM toks
         |  WHERE doc_id % 2 = 0),
         |scored AS (SELECT t.doc_id,
         |    CASE WHEN c123 IS NOT NULL THEN 1
         |         WHEN c23 IS NOT NULL THEN 2 ELSE 3 END AS lvl,
         |    CASE WHEN c123 IS NOT NULL THEN (1000000 * c123) // c12
         |         WHEN c23 IS NOT NULL THEN (400000 * c23) // c2
         |         ELSE (160000 * COALESCE(c3, 0)) // nn.n END AS s6
         |  FROM tri t
         |  LEFT JOIN c123 USING (w1, w2, w3) LEFT JOIN c12 USING (w1, w2)
         |  LEFT JOIN c23 USING (w2, w3) LEFT JOIN c2 USING (w2)
         |  LEFT JOIN c3 USING (w3), nn
         |  WHERE t.doc_id % 2 = 1)
         |SELECT doc_id, count(*) AS n_tri,
         |  CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_l1,
         |  CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_l2,
         |  CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_l3,
         |  CAST(sum(s6) AS BIGINT) AS sum_s6,
         |  CAST(sum(s6) // count(*) AS BIGINT) AS avg_s6
         |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_lm_bucket" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
         |bi AS (SELECT doc_id, unnest(tk[1:len(tk) - 1]) AS w1,
         |    unnest(tk[2:len(tk)]) AS w2
         |  FROM toks WHERE len(tk) >= 2),
         |cnt2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
         |cnt1 AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
         |scored AS MATERIALIZED (SELECT doc_id,
         |    CAST(CAST(sum((1000000 * c2) // c1) AS BIGINT)
         |      // count(*) AS BIGINT) AS avg_p6
         |  FROM bi JOIN cnt2 USING (w1, w2) JOIN cnt1 USING (w1)
         |  GROUP BY doc_id),
         |hist AS (SELECT avg_p6, count(*) AS nv FROM scored GROUP BY 1),
         |cum AS (SELECT avg_p6,
         |    sum(nv) OVER (ORDER BY avg_p6 ROWS UNBOUNDED PRECEDING) AS cum,
         |    sum(nv) OVER () AS n
         |  FROM hist),
         |thr AS (SELECT min(CASE WHEN cum * 3 >= n THEN avg_p6 END) AS t1,
         |    min(CASE WHEN cum * 3 >= 2 * n THEN avg_p6 END) AS t2 FROM cum)
         |SELECT bucket, count(*) AS n_docs,
         |  CAST(min(avg_p6) AS BIGINT) AS min_p6,
         |  CAST(max(avg_p6) AS BIGINT) AS max_p6,
         |  CAST(sum(doc_id) AS BIGINT) AS id_sum
         |FROM (SELECT doc_id, avg_p6,
         |    CASE WHEN avg_p6 <= t1 THEN 'tail'
         |         WHEN avg_p6 <= t2 THEN 'middle'
         |         ELSE 'head' END AS bucket
         |  FROM scored, thr)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_salient" ->
      s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
         |SELECT doc_id, term, tf, df, CAST(rk AS INT) AS rk FROM (
         |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         |    row_number() OVER (PARTITION BY tf.doc_id
         |      ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rk
         |  FROM tf JOIN df USING (term)) t
         |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "text_chunk" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_tok
         |      FROM t WHERE len(toks) > 0),
         |c AS (SELECT doc_id, toks, n_tok,
         |        CASE WHEN n_tok <= 64 THEN 1
         |             ELSE 1 + (n_tok - 64 + 47) // 48 END AS n_chunks
         |      FROM n)
         |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         |  CAST(i * 48 AS BIGINT) AS tok_start,
         |  CAST(least(i * 48 + 64, n_tok) - i * 48 AS BIGINT) AS tok_len,
         |  toks[CAST(i * 48 + 1 AS BIGINT)] AS first_tok,
         |  toks[CAST(least(i * 48 + 64, n_tok) AS BIGINT)] AS last_tok
         |FROM c, unnest(generate_series(0, n_chunks - 1)) AS g(i)""".stripMargin,
    "text_badwords" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |n AS (SELECT doc_id,
         |        CAST(len(toks) AS BIGINT) AS n_tok,
         |        CAST(len(list_filter(toks, x -> list_contains(
         |          ['slow','leak','skew','spill','stale'], x)))
         |          AS BIGINT) AS n_hits
         |      FROM t WHERE len(toks) > 0)
         |SELECT doc_id, n_tok, n_hits,
         |  (1000 * n_hits) // n_tok AS hit_pm,
         |  n_hits * 50 >= n_tok AS flagged
         |FROM n""".stripMargin,
    // the oracle replays the packing as ONE global window — correct at
    // oracle scale; the Spark side's block-and-broadcast prefix sum is the
    // distributed equivalent
    "text_pack" ->
      s"""SELECT doc_id, n_tokens,
         |  CAST(start_off AS BIGINT) AS start_off,
         |  CAST(start_off // 512 AS BIGINT) AS seq_id
         |FROM (
         |  SELECT doc_id, n_tokens,
         |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
         |  FROM (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens
         |        FROM documents) t) p""".stripMargin,
    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |c AS (SELECT doc_id, toks,
         |        CAST(len(toks) AS BIGINT) AS n_tokens,
         |        CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |        CASE WHEN len(toks) >= 3
         |          THEN list_transform(range(1, CAST(len(toks) - 1 AS BIGINT)),
         |                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |          ELSE CAST([] AS VARCHAR[]) END AS grams3
         |      FROM t),
         |g AS (SELECT doc_id, n_tokens, n_distinct,
         |        CAST(len(grams3) AS BIGINT) AS n_grams,
         |        CAST(len(list_distinct(grams3)) AS BIGINT) AS n_gram_distinct,
         |        CAST(CASE WHEN len(toks) > 0
         |          THEN list_max(list_transform(list_distinct(toks),
         |                 t -> len(list_filter(toks, x -> x = t))))
         |          ELSE 0 END AS BIGINT) AS top_tok_n
         |      FROM c)
         |SELECT doc_id, n_tokens, n_distinct, n_grams, top_tok_n,
         |  CASE WHEN n_tokens > 0
         |    THEN CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens ELSE 0.0 END
         |    AS dup_word_ratio,
         |  CASE WHEN n_grams > 0
         |    THEN CAST(n_grams - n_gram_distinct AS DOUBLE) / n_grams ELSE 0.0 END
         |    AS dup_gram_ratio,
         |  CASE WHEN n_tokens > 0
         |    THEN CAST(top_tok_n AS DOUBLE) / n_tokens ELSE 0.0 END
         |    AS top_tok_ratio
         |FROM g ORDER BY doc_id""".stripMargin,
    "text_rollhash" -> {
      import graft.functions.TextKernels.{RollMod, RollPow, RollWindow}
      // byte p of window starting at i carries weight 257^(7-(p-i)) mod M;
      // the direct modular sum equals the kernel's rolling recurrence
      val powCase = (0 until RollWindow)
        .map(k => s"WHEN $k THEN ${RollPow(RollWindow - 1 - k)}")
        .mkString(" ")
      s"""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
         |              octet_length(encode(text)) AS nb FROM documents),
         |bytes AS (SELECT doc_id, p, CAST(('0x' || substr(hx, 2*p - 1, 2)) AS BIGINT) AS bv
         |          FROM d, LATERAL (SELECT unnest(range(1, nb + 1)) AS p) r),
         |win AS (SELECT doc_id, i FROM d,
         |        LATERAL (SELECT unnest(range(1, greatest(nb - ${RollWindow - 1}, 0) + 1)) AS i) rr),
         |h AS (SELECT w.doc_id, w.i,
         |        CAST(sum(b.bv * CASE CAST(b.p - w.i AS INT) $powCase END) % $RollMod AS BIGINT) AS hv
         |      FROM win w JOIN bytes b
         |        ON b.doc_id = w.doc_id AND b.p >= w.i AND b.p < w.i + $RollWindow
         |      GROUP BY 1, 2),
         |agg AS (SELECT doc_id, min(hv) AS fp_min, count(*) AS n_windows FROM h GROUP BY 1),
         |pos AS (SELECT h.doc_id, min(h.i - 1) AS fp_pos
         |        FROM h JOIN agg ON agg.doc_id = h.doc_id AND h.hv = agg.fp_min
         |        GROUP BY 1)
         |SELECT d.doc_id AS doc_id,
         |  coalesce(agg.fp_min, -1) AS fp_min,
         |  CAST(coalesce(pos.fp_pos, -1) AS BIGINT) AS fp_pos,
         |  CAST(coalesce(agg.n_windows, 0) AS BIGINT) AS n_windows
         |FROM d LEFT JOIN agg ON agg.doc_id = d.doc_id
         |       LEFT JOIN pos ON pos.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    // winnowing replay: same byte/window/hash CTEs as text_rollhash, then
    // per window-start s of width W the min hash, rightmost position on
    // ties (max(i) FILTER hv = min), distinct selected positions summed
    "text_winnowing" -> {
      import graft.functions.TextKernels.{RollMod, RollPow, RollWindow, WinnowW}
      val powCase = (0 until RollWindow)
        .map(k => s"WHEN $k THEN ${RollPow(RollWindow - 1 - k)}")
        .mkString(" ")
      s"""WITH d AS (SELECT doc_id, lower(hex(encode(text))) AS hx,
         |              octet_length(encode(text)) AS nb FROM documents),
         |bytes AS MATERIALIZED (
         |  SELECT doc_id, p, CAST(('0x' || substr(hx, 2*p - 1, 2)) AS BIGINT) AS bv
         |  FROM d, LATERAL (SELECT unnest(range(1, nb + 1)) AS p) r),
         |win AS (SELECT doc_id, i FROM d,
         |        LATERAL (SELECT unnest(range(1, greatest(nb - ${RollWindow - 1}, 0) + 1)) AS i) rr),
         |h AS MATERIALIZED (
         |  SELECT w.doc_id, w.i,
         |    CAST(sum(b.bv * CASE CAST(b.p - w.i AS INT) $powCase END) % $RollMod AS BIGINT) AS hv
         |  FROM win w JOIN bytes b
         |    ON b.doc_id = w.doc_id AND b.p >= w.i AND b.p < w.i + $RollWindow
         |  GROUP BY 1, 2),
         |hn AS (SELECT doc_id, greatest(nb - ${RollWindow - 1}, 0) AS nh FROM d),
         |starts AS (SELECT hn.doc_id, s FROM hn,
         |           LATERAL (SELECT unnest(range(1, nh - $WinnowW + 2)) AS s) r
         |           WHERE nh >= $WinnowW),
         |wmin AS MATERIALIZED (
         |  SELECT st.doc_id, st.s, min(h.hv) AS mh
         |  FROM starts st JOIN h
         |    ON h.doc_id = st.doc_id AND h.i >= st.s AND h.i < st.s + $WinnowW
         |  GROUP BY 1, 2),
         |sel AS (SELECT w.doc_id, max(h.i) AS pick
         |        FROM wmin w JOIN h
         |          ON h.doc_id = w.doc_id AND h.i >= w.s AND h.i < w.s + $WinnowW
         |         AND h.hv = w.mh
         |        GROUP BY w.doc_id, w.s),
         |pos AS (SELECT DISTINCT doc_id, pick FROM sel),
         |agg AS (SELECT p.doc_id, count(*) AS n_sel, sum(h.hv) AS fps
         |        FROM pos p JOIN h ON h.doc_id = p.doc_id AND h.i = p.pick
         |        GROUP BY 1)
         |SELECT hn.doc_id,
         |  CAST(hn.nh AS BIGINT) AS n_windows,
         |  CAST(coalesce(a.n_sel, 0) AS BIGINT) AS n_selected,
         |  CAST(coalesce(a.fps, 0) AS BIGINT) AS fp_sum
         |FROM hn LEFT JOIN agg a USING (doc_id)
         |ORDER BY hn.doc_id""".stripMargin
    },
    "text_pii" ->
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS INT) AS n_email,
         |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS INT) AS n_phone,
         |  CAST(len(regexp_extract_all(text, '$IdRe')) AS INT) AS n_id,
         |  md5(regexp_replace(regexp_replace(regexp_replace(text,
         |    '$EmailRe', '<EMAIL>', 'g'),
         |    '$PhoneRe', '<PHONE>', 'g'),
         |    '$IdRe', '<ID>', 'g')) AS redacted_md5
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" -> langidSql,
    "text_confusion" ->
      s"""WITH base AS ($langidSql),
         |g AS (SELECT true_lang, pred_lang, count(*) AS n
         |  FROM base GROUP BY 1, 2)
         |SELECT true_lang, pred_lang, n,
         |  CAST(sum(n) OVER (PARTITION BY true_lang) AS BIGINT) AS row_n,
         |  CAST(sum(n) OVER (PARTITION BY pred_lang) AS BIGINT) AS col_n,
         |  CAST((1000 * n) // (sum(n) OVER (PARTITION BY true_lang)) AS BIGINT)
         |    AS recall_pm,
         |  CAST((1000 * n) // (sum(n) OVER (PARTITION BY pred_lang)) AS BIGINT)
         |    AS precision_pm
         |FROM g ORDER BY 1, 2""".stripMargin,
    "text_ttr" ->
      s"""WITH d AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |t AS (SELECT doc_id, unnest(toks) AS tok FROM d),
         |c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
         |a AS (SELECT doc_id, count(*) AS n_types,
         |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         |    CAST(sum(c) AS BIGINT) AS n_toks
         |  FROM c GROUP BY 1)
         |SELECT d.doc_id, greatest(1, coalesce(a.n_toks, 0)) AS n_toks,
         |  CAST(coalesce(a.n_types, 0) AS BIGINT) AS n_types,
         |  coalesce(a.n_hapax, 0) AS n_hapax,
         |  CAST((1000 * coalesce(a.n_types, 0))
         |    // greatest(1, coalesce(a.n_toks, 0)) AS BIGINT) AS ttr_pm
         |FROM d LEFT JOIN a USING (doc_id)""".stripMargin,
    "text_readability" ->
      """WITH c AS (SELECT doc_id,
        |    greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sent,
        |    greatest(1, len(regexp_extract_all(text, '[a-z]+'))) AS n_words,
        |    len(regexp_extract_all(text, '[aeiouy]+')) AS n_syll
        |  FROM documents)
        |SELECT doc_id, CAST(n_sent AS BIGINT) AS n_sent,
        |  CAST(n_words AS BIGINT) AS n_words, CAST(n_syll AS BIGINT) AS n_syll,
        |  CAST(206835 - (1015 * n_words) // n_sent
        |    - (84600 * n_syll) // n_words AS BIGINT) AS fre_m,
        |  CAST((390 * n_words) // n_sent + (11800 * n_syll) // n_words
        |    - 15590 AS BIGINT) AS fkg_m
        |FROM c""".stripMargin,
    "text_quality" ->
      s"""SELECT doc_id, n_words,
         |  CAST(sum_wlen AS DOUBLE) / n_words AS avg_wlen,
         |  CAST(length(text) - clean_len AS DOUBLE) / length(text) AS punct_ratio,
         |  CAST(stop_n AS DOUBLE) / n_words AS stop_ratio,
         |  0.4 * least(n_words / 50.0, 1.0)
         |    + 0.3 * (1.0 - CAST(length(text) - clean_len AS DOUBLE) / length(text))
         |    + 0.3 * least(CAST(sum_wlen AS DOUBLE) / n_words / 5.0, 1.0) AS quality
         |FROM (SELECT doc_id, text, len(toks) AS n_words,
         |        list_sum(list_transform(toks, t -> length(t))) AS sum_wlen,
         |        length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS clean_len,
         |        len(list_filter(toks, t -> t IN ('the', 'a'))) AS stop_n
         |      FROM (SELECT doc_id, text, $toksSql AS toks FROM documents) t0) t1
         |ORDER BY doc_id""".stripMargin,
    "text_hashtf" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(('0x' || substr(md5(w), 1, 12)) AS BIGINT) % 256 AS b
         |  FROM (SELECT doc_id, unnest($toksSql) AS w FROM documents)),
         |tf AS (SELECT doc_id, b, count(*) AS c FROM t GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_terms, count(*) AS nnz,
         |  CAST(sum(c * (b + 1)) AS BIGINT) AS dot_idx,
         |  CAST(sum(c * c) AS BIGINT) AS l2_sq
         |FROM tf GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "text_keyness" ->
      s"""WITH toks AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
         |    unnest($toksSql) AS term FROM documents),
         |cnt AS (SELECT term, CAST(sum(is_en) AS BIGINT) AS n_en,
         |    CAST(sum(1 - is_en) AS BIGINT) AS n_rest
         |  FROM toks GROUP BY 1),
         |t AS (SELECT *, CAST(sum(n_en) OVER () AS BIGINT) AS na,
         |    CAST(sum(n_rest) OVER () AS BIGINT) AS nb FROM cnt)
         |SELECT term, n_en, n_rest,
         |  CAST((CAST(1000000 AS HUGEINT) * CAST(na + nb AS HUGEINT)
         |    * CAST(n_en * (nb - n_rest) - n_rest * (na - n_en) AS HUGEINT)
         |    * CAST(n_en * (nb - n_rest) - n_rest * (na - n_en) AS HUGEINT))
         |   // (CAST(n_en + n_rest AS HUGEINT)
         |    * CAST(na + nb - n_en - n_rest AS HUGEINT)
         |    * CAST(na AS HUGEINT) * CAST(nb AS HUGEINT)) AS BIGINT) AS chi2_ppm,
         |  CASE WHEN n_en * nb > n_rest * na THEN 'en' ELSE 'rest' END AS overused
         |FROM t ORDER BY chi2_ppm DESC, term""".stripMargin,
    "text_zipf" ->
      s"""WITH toks AS (SELECT unnest($toksSql) AS tok FROM documents),
         |freq AS (SELECT tok, count(*) AS freq FROM toks GROUP BY 1),
         |r AS (SELECT freq,
         |    row_number() OVER (ORDER BY freq DESC, tok) AS rank
         |  FROM freq)
         |SELECT CAST(length(bin(rank)) AS BIGINT) AS bucket,
         |  count(*) AS n_toks, CAST(sum(freq) AS BIGINT) AS sum_freq,
         |  max(freq) AS max_freq, min(freq) AS min_freq
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_tokens" ->
      s"""SELECT doc_id, len($toksSql) AS ws_tokens,
         |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpe_tokens,
         |  CAST(length(text) AS DOUBLE) / len($toksSql) AS chars_per_tok
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      s"""SELECT doc_id, fp, min(doc_id) OVER (PARTITION BY fp) AS keep_id,
         |  doc_id = min(doc_id) OVER (PARTITION BY fp) AS is_canonical
         |FROM (SELECT doc_id,
         |        md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) AS fp
         |      FROM documents) t
         |ORDER BY doc_id""".stripMargin)
}
