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

  private val toksExpr = "filter(split(text, ' '), t -> t <> '')"
  private val toksSql = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** Marker-word profiles per language (derived from the corpus' observed
    * per-lang vocabulary skew) — the classic stopword-profile language-ID
    * heuristic, scored by token hits.
    */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("order", "window", "table", "group"),
    "de" -> Seq("customer", "hash", "part", "row"),
    "es" -> Seq("agg", "slow", "merge", "vector"),
    "fr" -> Seq("query", "scan", "data", "batch"),
    "zh" -> Seq("join", "the", "fast", "small"))

  def textLangid(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).withColumn("toks", expr(toksExpr))
    val scored = Profiles.foldLeft(base) { case (df, (l, ws)) =>
      df.withColumn(s"s_$l",
        expr(s"size(filter(toks, t -> t in (${ws.map("'" + _ + "'").mkString(",")})))"))
    }
    val m = greatest(Profiles.map { case (l, _) => col(s"s_$l") }: _*)
    val pred = Profiles.foldLeft(when(lit(false), "")) { case (c, (l, _)) =>
      c.when(col(s"s_$l") === m, l)
    }
    scored
      .select(col("doc_id") +: Profiles.map { case (l, _) => col(s"s_$l") } :+
        pred.as("pred_lang") :+ col("lang").as("true_lang") :+
        (pred === col("lang")).as("correct"): _*)
      .orderBy("doc_id")
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
      .orderBy("doc_id")

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
      .orderBy("doc_id")

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
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_langid" -> (textLangid _),
    "text_quality" -> (textQuality _),
    "text_tokens" -> (textTokens _),
    "text_fingerprint" -> (textFingerprint _))

  val oracles: Map[String, String] = Map(
    "text_langid" -> {
      val scores = Profiles.map { case (l, ws) =>
        s"len(list_filter(toks, t -> t IN (${ws.map("'" + _ + "'").mkString(",")}))) AS s_$l"
      }.mkString(",\n    ")
      val m = s"greatest(${Profiles.map("s_" + _._1).mkString(", ")})"
      val pred = "CASE " + Profiles.map { case (l, _) => s"WHEN s_$l = $m THEN '$l'" }
        .mkString(" ") + " END"
      s"""SELECT doc_id, ${Profiles.map("s_" + _._1).mkString(", ")},
         |  $pred AS pred_lang, lang AS true_lang, ($pred = lang) AS correct
         |FROM (SELECT doc_id, lang, $scores
         |      FROM (SELECT doc_id, lang, $toksSql AS toks FROM documents) t0) t1
         |ORDER BY doc_id""".stripMargin
    },
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
