package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * A hot key (one user touching half the edits, one mega-changeset) makes
  * one shuffle partition the straggler. Salting splits each key into
  * `salts` sub-keys for a partial aggregate, then combines partials — the
  * classic two-stage rewrite, made explicit for aggregations whose partial
  * form Catalyst can't derive on its own. AQE's skew-join handles the join
  * case at runtime; this handles groupBy fan-in.
  */
object Skew {

  /** Two-stage salted sum/count aggregation: groupBy(key) where one key
    * dominates → groupBy(key, salt) partials → groupBy(key) combine.
    * The salt is a deterministic hash of the whole row, so results are
    * reproducible run-to-run.
    *
    * @param salts number of sub-keys per key (≈ desired fan-out of the hot key)
    * @param sums  numeric columns to sum (pass DECIMAL/BIGINT columns for
    *              exactness, per SURVEY §3)
    */
  def saltedSumCount(df: DataFrame, key: String, salts: Int,
      sums: Seq[String]): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sums.map(c => sum(col(c)).as(s"__s_$c")): _*)
    partial
      .groupBy(col(key))
      .agg(sum("__n").cast("bigint").as("n"),
        sums.map(c => sum(s"__s_$c").as(s"sum_$c")): _*)
  }

  /** Oracle-checked face of the salted rewrite: events grouped by
    * event_type (few keys, naturally hot at scale) through the two-stage
    * salted aggregation — the result is BY CONSTRUCTION identical to the
    * plain GROUP BY the oracle runs, which is exactly the point: salting
    * changes the shuffle fan-in, never the answer.
    */
  def skewAgg(s: SparkSession, dir: String): DataFrame =
    saltedSumCount(
      Tables.events(s, dir)
        .withColumn("value_c", round(col("value") * 100).cast("bigint"))
        .select("event_type", "value_c"),
      "event_type", 16, Seq("value_c"))

  /** Salted-JOIN repair — the join-side counterpart of [[saltedSumCount]]
    * (what you deploy when AQE's runtime skew split can't see the skew —
    * a derived build side with no stats, or a deliberately pinned plan):
    * the FACT side salts each key into `salts` sub-keys, the DIM side
    * replicates `salts`× map-side (explode of a literal range — dims are
    * the small side by definition), and the equi-join runs on
    * (key, salt) so a hot key's probe rows spread over `salts` reducers
    * instead of one straggler. By construction the result equals the
    * plain join — salting changes the shuffle fan-in, never the answer —
    * which is exactly what the oracle checks.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(salts)))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Oracle-checked face of the salted join: events (user_id is the
    * natural hot key at scale — one power user dominates a partition)
    * joined to the per-user total-spend dim through the (key, salt)
    * equi-join, then rolled up per segment — identical to the plain
    * join + rollup the oracle runs.
    */
  def skewJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(s, dir)
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"))
    val fact = Tables.events(s, dir)
      .withColumn("value_c", round(col("value") * 100).cast("bigint"))
      .select("user_id", "event_type", "value_c")
    saltedJoin(fact, dim, "user_id", 16)
      .groupBy("segment", "event_type")
      .agg(count(lit(1)).as("n"), sum("value_c").as("sum_value_c"))
      .orderBy("segment", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_agg" -> (skewAgg _),
    "skew_join" -> (skewJoin _))

  val oracles: Map[String, String] = Map(
    "skew_agg" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "skew_join" ->
      """SELECT c.c_mktsegment AS segment, e.event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_value_c
        |FROM events e JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
