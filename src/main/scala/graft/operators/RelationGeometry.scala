package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** One member way's line geometry, keyed to its parent relation. */
case class MemberLine(rel_id: Long, way_id: Long,
    lons: Array[Double], lats: Array[Double])

/** Assembled relation geometry. */
case class RelationRings(rel_id: Long, n_ways: Int, n_rings: Int,
    n_shells: Int, n_holes: Int, closed: Boolean, n_points: Int,
    area_deg2: Double, wkb: String)

/** Relation (multi)polygon assembly — the osm-geometry ring-stitching +
  * shell/hole classification analog: member ways chain end-to-end (either
  * orientation) into closed rings, rings classify into outer shells and
  * their holes, and the result encodes as polygon or multipolygon WKB.
  *
  * Classification follows the reference's core rule
  * (osm-geometry GeometryBuilder.java:32-49): rings sorted by area
  * descending; each ring's nearest containing ring (scanning back through
  * larger rings) decides its role — contained in a shell → hole of that
  * shell; contained in a hole (nested island) or in nothing → shell. The
  * JTS-based overlap/touch repair paths (GeometryBuilder.java:52-110) are
  * out of scope.
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

  /** One classified shell with its direct holes (ring = coordinate pair). */
  case class ShellWithHoles(shell: (ArrayBuffer[Double], ArrayBuffer[Double]),
      holes: ArrayBuffer[(ArrayBuffer[Double], ArrayBuffer[Double])])

  /** Shell/hole classification of closed rings, reference rule
    * (GeometryBuilder.java:32-49): area-descending order, nearest container
    * decides. Containment is tested with the first ring vertex (rings in
    * valid multipolygons don't cross, and shared-vertex touching rings are
    * the out-of-scope repair path).
    */
  def classify(closedRings: Seq[(ArrayBuffer[Double], ArrayBuffer[Double])]): Seq[ShellWithHoles] = {
    val sorted = closedRings.map(r => (r, ringArea(r._1.toSeq, r._2.toSeq)))
      .sortBy(-_._2).map(_._1)
    val shells = ArrayBuffer[ShellWithHoles]()
    val roles = new Array[Int](sorted.length) // index into shells, or -1 for hole
    for (i <- sorted.indices) {
      val (xs, ys) = sorted(i)
      // nearest container: the smallest already-placed ring containing us
      var container = -1
      var j = i - 1
      while (container < 0 && j >= 0) {
        val (cx, cy) = sorted(j)
        if (graft.functions.Geo.pointInRingD(xs.head, ys.head, cx.toSeq, cy.toSeq))
          container = j
        else j -= 1
      }
      if (container >= 0 && roles(container) >= 0) {
        // contained directly in a shell → one of its holes
        shells(roles(container)).holes += ((xs, ys))
        roles(i) = -1
      } else {
        // top-level, or an island nested inside a hole → new shell
        shells += ShellWithHoles((xs, ys), ArrayBuffer.empty)
        roles(i) = shells.length - 1
      }
    }
    shells.toSeq
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
        val shells = classify(rings.filter(_._3).map(r => (r._1, r._2)))
        // reference area semantics (GeometryTools.areaOf(Polygon/Multi)):
        // per shell abs(outer) − Σ abs(holes), clamped at 0, summed
        val area = shells.map { s =>
          math.max(0.0, ringArea(s.shell._1.toSeq, s.shell._2.toSeq) -
            s.holes.map(h => ringArea(h._1.toSeq, h._2.toSeq)).sum)
        }.sum
        val polys = shells.map(s =>
          ((s.shell._1.toArray, s.shell._2.toArray)) +:
            s.holes.toSeq.map(h => (h._1.toArray, h._2.toArray)))
        // polygon WKB is built from CLOSED rings only, in every branch —
        // unclosed chains mean an invalid/partial relation (reference
        // skips them in polygon assembly too); `closed=false` flags it,
        // n_rings/n_points still count the open chains
        val wkb =
          if (polys.length > 1) graft.functions.Geo.wkbMultiPolygonHex(polys)
          else graft.functions.Geo.wkbPolygonHex(polys.headOption.getOrElse(Seq.empty))
        RelationRings(relId, ways.length, rings.length,
          shells.length, shells.map(_.holes.length).sum,
          rings.nonEmpty && rings.forall(_._3), rings.map(_._1.length).sum, area, wkb)
      }
  }
}
