package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Both operators key every keep/drop decision on a salted md5 of the
  * row id, never on `rand()`: the sample is reproducible across runs,
  * engines (the oracle replays it bit-for-bit in DuckDB), cluster sizes,
  * and partitionings — the property a data lineage audit needs. Both are
  * scan-shaped: the rate filter is a pure map (pushes down, no shuffle);
  * the quota is one hash partition per stratum with Spark 4's
  * WindowGroupLimit pushing the rank cutoff map-side.
  */
object Sampling {

  /** Hash bucket in [0, 100): first 24 bits of md5("smp|" + id), mod 100.
    * Engine-portable — DuckDB replays it as CAST('0x' || substr(md5(..)))
    * arithmetic on the same hex digits.
    */
  private def bucket(id: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("smp|"), id.cast("string"))), 1, 6), 16, 10)
      .cast("bigint") % 100

  /** Stratified rate sample: per-language sampling rates (downsample the
    * majority language, keep more of the tail) applied via the hash
    * bucket — the class-balancing step before training-corpus assembly.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("bucket", bucket(col("doc_id")))
      .withColumn("rate", when(col("lang") === "en", lit(5)).otherwise(lit(20)))
      .filter(col("bucket") < col("rate"))
      .select("doc_id", "lang", "bucket")

  /** Per-stratum quota: keep the k=20 documents with the smallest salted
    * hash per language — a deterministic "reservoir" that caps any one
    * stratum (domain/source/language) regardless of its size. Hash-order
    * ranking means adding documents never evicts more than it must.
    */
  def sampleQuota(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("hk", md5(concat(lit("quota|"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy("hk", "doc_id")))
      .filter(col("rk") <= 20)
      .select("doc_id", "lang", "rk")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_stratified" -> (sampleStratified _),
    "sample_quota" -> (sampleQuota _))

  val oracles: Map[String, String] = Map(
    "sample_stratified" ->
      """SELECT doc_id, lang, bucket FROM (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS bucket
        |  FROM documents) t
        |WHERE bucket < CASE WHEN lang = 'en' THEN 5 ELSE 20 END
        |ORDER BY doc_id""".stripMargin,
    "sample_quota" ->
      """SELECT doc_id, lang, CAST(rk AS INT) AS rk FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('quota|' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) t
        |WHERE rk <= 20
        |ORDER BY lang, rk""".stripMargin)
}
