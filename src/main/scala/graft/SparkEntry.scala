package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory; each `queries` key maps to exactly one inventory row.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full contribution assembly exercises every engine at once.
    */
  def entry(spark: SparkSession): DataFrame =
    Contributions.contribFull(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ History.queries ++ Changesets.queries ++
      Replication.queries ++ Geometry.queries ++ Contributions.queries ++ Dedup.queries ++
      TextOps.queries ++ Ann.queries ++ Multimodal.queries ++ Skew.queries ++
      Temporal.queries ++ Sampling.queries ++ ChangesetCatchup.queries ++
      Events.queries ++ Sketches.queries ++ Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ History.oracles ++ Changesets.oracles ++
      Replication.oracles ++ Geometry.oracles ++ Contributions.oracles ++ Dedup.oracles ++
      TextOps.oracles ++ Ann.oracles ++ Multimodal.oracles ++ Skew.oracles ++
      Temporal.oracles ++ Sampling.oracles ++ ChangesetCatchup.oracles ++
      Events.oracles ++ Sketches.oracles ++ Graph.oracles
}
