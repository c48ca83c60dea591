package graft.streaming

import graft.operators.Changesets
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One changeset extent in flight: the cs_bbox row shape (session key,
  * located-edit bbox corners — null when the changeset has no located
  * edit — and its edit count).
  */
final case class CsBoxRow(user_id: Long, cs_seq: Long,
  min_lon: Option[Double], min_lat: Option[Double],
  max_lon: Option[Double], max_lat: Option[Double], num_changes: Long)

/** Continuous "changesets touching region X" monitor — the streaming
  * face of [[graft.operators.Changesets.csRegionJoin]], the query a
  * replication consumer runs against the minutely changeset feed
  * ("alert on edits in my country").
  *
  * Each micro-batch runs the SAME shared kernel as the batch operator
  * ([[Changesets.regionOverlaps]]): conservative grid-cell explode →
  * equi-join against the BROADCAST region table on the cell key → exact
  * bbox-overlap predicate; geometry-less changesets drop at the explode
  * (null cell sequence), exactly like the batch side. The per-country
  * running totals are a streaming `groupBy` over the ~|regions|-bounded
  * key space in Complete output mode — state is one row per country, so
  * the sink rewrite is constant-size no matter how long the stream runs.
  *
  * Scale shape: the stream side never shuffles before the join (the
  * region table broadcasts; cell explode is map-side); the only
  * exchange is the bounded country rollup — identical to the batch
  * plan's shape, which is what makes drained-equals-batch hold row for
  * row.
  */
object RegionStream {

  /** @param rows    changeset extents (a replication consumer feeds the
    *                changesets closed in each minutely diff)
    * @param regions static region boxes
    *                ([[Changesets.regionBoxes]] shape: country, gx, gy,
    *                r_lon_min, r_lat_min)
    */
  def apply(rows: Dataset[CsBoxRow], regions: DataFrame): DataFrame =
    Changesets.regionOverlaps(rows.toDF(), regions)
      .groupBy("country")
      .agg(count(lit(1)).as("n_changesets"), sum("num_changes").as("n_edits"))
}
