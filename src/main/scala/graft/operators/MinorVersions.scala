package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Minor versions — member-induced contribution rows
  * (ContributionsAvroConverter.java:90-97): when a way's member node
  * changes while the way's own version is unchanged, the reference emits a
  * new contribution row with the same `osm_version` and an incremented
  * `osm_minor_version` (reset to 0 on every real version).
  *
  * Spark-first: explode way membership, shuffle-join node edits on node
  * id restricted to the way-version validity interval, union with the
  * major rows, then `minor = row_number within (way, version) - 1`. The
  * join is the same node-id partitioning the way-assembly join uses; no
  * range explosion (each node edit lands in exactly one version interval).
  */
object MinorVersions {

  /** @param wayVersions (way_id, osm_version, valid_from, refs) — major versions
    * @param nodeEdits   (node_id, ts) — member-node change events
    */
  def compute(wayVersions: DataFrame, nodeEdits: DataFrame): DataFrame = {
    val byWay = Window.partitionBy("way_id").orderBy("osm_version")
    val vers = wayVersions
      .withColumn("valid_to", lead("valid_from", 1).over(byWay))
    val memberEdits = vers
      .select(col("way_id"), col("osm_version"), col("valid_from"),
        col("valid_to"), explode(col("refs")).as("node_id"))
      .join(nodeEdits, Seq("node_id"))
      .filter(col("ts") > col("valid_from") &&
        (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select(col("way_id"), col("osm_version"), col("ts"),
        lit("MINOR_GEOMETRY").as("trigger"))
    val major = vers.select(col("way_id"), col("osm_version"),
      col("valid_from").as("ts"), lit("MAJOR").as("trigger"))
    major.unionByName(memberEdits)
      .withColumn("osm_minor_version",
        row_number().over(
          Window.partitionBy("way_id", "osm_version").orderBy("ts", "trigger")) - 1)
      .orderBy("way_id", "osm_version", "osm_minor_version")
  }
}
