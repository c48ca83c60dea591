package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** One member way's line geometry, keyed to its parent relation. */
case class MemberLine(rel_id: Long, way_id: Long,
    lons: Array[Double], lats: Array[Double])

/** Assembled relation geometry. */
case class RelationRings(rel_id: Long, n_ways: Int, n_rings: Int,
    closed: Boolean, n_points: Int, area_deg2: Double, wkb: String)

/** Relation (multi)polygon assembly — the osm-geometry ring-stitching
  * analog: member ways chain end-to-end (either orientation) into closed
  * rings, encoded as one WKB polygon (rings = outer + holes; the
  * full outer/inner classification of the reference is out of scope).
  *
  * Spark shape: member explode → join way geometries (shuffle on way id)
  * → `mapGroups` per relation. The per-relation stitch is genuinely
  * imperative small-N work — the one place `mapGroups` beats expressions —
  * while all data movement stays declarative joins. Relations are tiny
  * (≤ thousands of members) so per-group state is bounded.
  */
object RelationGeometry {

  /** Chain ways into rings: repeatedly extend the current chain with an
    * unused way that starts or ends at the chain's endpoint (reversing as
    * needed); a chain closes when it returns to its first point.
    */
  def stitch(ways: Seq[(Array[Double], Array[Double])]): Seq[(ArrayBuffer[Double], ArrayBuffer[Double], Boolean)] = {
    val remaining = ArrayBuffer.from(ways)
    val rings = ArrayBuffer[(ArrayBuffer[Double], ArrayBuffer[Double], Boolean)]()
    while (remaining.nonEmpty) {
      val (ls, la) = remaining.remove(0)
      val xs = ArrayBuffer.from(ls)
      val ys = ArrayBuffer.from(la)
      var extended = true
      while (extended && !(xs.length > 3 && xs.head == xs.last && ys.head == ys.last)) {
        val i = remaining.indexWhere { case (wx, wy) =>
          (wx.head == xs.last && wy.head == ys.last) ||
            (wx.last == xs.last && wy.last == ys.last)
        }
        if (i < 0) extended = false
        else {
          val (wx, wy) = remaining.remove(i)
          if (wx.head == xs.last && wy.head == ys.last) {
            xs ++= wx.drop(1); ys ++= wy.drop(1)
          } else {
            xs ++= wx.reverse.drop(1); ys ++= wy.reverse.drop(1)
          }
        }
      }
      val closed = xs.length > 3 && xs.head == xs.last && ys.head == ys.last
      rings += ((xs, ys, closed))
    }
    rings.toSeq
  }

  /** Planar shoelace area of one ring (absolute, deg²). */
  def ringArea(xs: Seq[Double], ys: Seq[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = xs.length
    while (i < n - 1) {
      acc += xs(i) * ys(i + 1) - xs(i + 1) * ys(i)
      i += 1
    }
    math.abs(acc) / 2.0
  }

  /** @param members (rel_id, way_id) relation → member-way edges
    * @param wayGeoms way geometries as produced by PBF decode + assembly:
    *                 (way_id, lons, lats)
    */
  def assemble(members: DataFrame, wayGeoms: DataFrame): Dataset[RelationRings] = {
    val spark = members.sparkSession
    import spark.implicits._
    members.select(col("rel_id"), col("way_id"))
      .join(wayGeoms.select(col("way_id"), col("lons"), col("lats")), "way_id")
      .select(col("rel_id"), col("way_id"), col("lons"), col("lats"))
      .as[MemberLine]
      .groupByKey(_.rel_id)
      .mapGroups { (relId, it) =>
        val ways = it.toSeq.sortBy(_.way_id)
        val rings = stitch(ways.map(w => (w.lons, w.lats)))
        val wkb = graft.functions.Geo.wkbPolygonHex(
          rings.map { case (xs, ys, _) => (xs.toArray, ys.toArray) })
        // largest closed ring is the outer shell, others are holes
        val areas = rings.filter(_._3).map { case (xs, ys, _) => ringArea(xs.toSeq, ys.toSeq) }
        val area = if (areas.isEmpty) 0.0 else 2 * areas.max - areas.sum
        RelationRings(relId, ways.length, rings.length,
          rings.nonEmpty && rings.forall(_._3), rings.map(_._1.length).sum, area, wkb)
      }
  }
}
