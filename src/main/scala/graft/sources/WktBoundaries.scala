package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream

/** WKT country-file ingestion — the reference's documented `--country-file`
  * contract (docs/CLI.md:31-50): a `;`-separated CSV whose geometry column
  * holds `POLYGON` / `MULTIPOLYGON` WKT, read into ring arrays and indexed
  * into a covering grid for the contribution spatial join
  * (SpatialJoiner.java:36-71 readCSV, SpatialGridJoiner.java,
  * GridIndex.java, BuildGridAction.java).
  *
  * Header detection replicates the reference (SpatialJoiner.java:44-55):
  * the geometry column is the first header equal to one of
  * `geometry|geom|geo|wkt` (case-insensitive), the id column the first
  * header STARTING WITH `id|iso|name`; `.gz` files are decompressed.
  *
  * The boundary file is a dimension artifact (hundreds of polygons), so —
  * exactly like the reference, which parses it single-node and builds the
  * grid in a driver-side ForkJoin pass — parsing and index construction
  * happen once on the driver; the resulting cell table broadcasts and the
  * 100 TB point/contribution side stays map-only.
  */
object WktBoundaries {

  /** A polygon-with-holes or multipolygon flattened to its rings: parallel
    * coordinate arrays plus ring start offsets (last entry = total length).
    * Even-odd containment treats shells and holes uniformly, so no
    * shell/hole bookkeeping is needed for point-in-geometry.
    */
  final case class MultiRing(xs: Array[Double], ys: Array[Double], offs: Array[Int]) {
    def bbox: (Double, Double, Double, Double) = {
      var (x0, y0, x1, y1) = (Double.MaxValue, Double.MaxValue, -Double.MaxValue, -Double.MaxValue)
      var i = 0
      while (i < xs.length) {
        if (xs(i) < x0) x0 = xs(i); if (xs(i) > x1) x1 = xs(i)
        if (ys(i) < y0) y0 = ys(i); if (ys(i) > y1) y1 = ys(i)
        i += 1
      }
      (x0, y0, x1, y1)
    }
  }

  /** Parses `POLYGON ((...), (...))` / `MULTIPOLYGON (((...)), ((...)))`
    * into flattened rings. Every innermost parenthesis group is one ring —
    * the nesting level (polygon vs multipolygon part) is irrelevant under
    * the even-odd rule. The WKT-mandated duplicated closing vertex is
    * dropped (rings close implicitly in [[graft.functions.Geo.pointInRings]]).
    */
  def parseWkt(wkt: String): MultiRing = {
    val t = wkt.trim
    val upper = t.toUpperCase
    require(upper.startsWith("POLYGON") || upper.startsWith("MULTIPOLYGON"),
      s"only POLYGON/MULTIPOLYGON supported (docs/CLI.md contract), got: ${t.take(30)}")
    val rings = scala.collection.mutable.ArrayBuffer.empty[(Array[Double], Array[Double])]
    var i = t.indexOf('(')
    while (i >= 0 && i < t.length) {
      val close = t.indexOf(')', i + 1)
      val nextOpen = t.indexOf('(', i + 1)
      if (nextOpen >= 0 && nextOpen < close) {
        i = nextOpen // not innermost yet
      } else if (close < 0) {
        i = -1
      } else {
        // innermost group t(i+1 until close) = "x y, x y, ..."
        val coords = t.substring(i + 1, close).split(',').map { c =>
          val p = c.trim.split("\\s+")
          require(p.length >= 2, s"bad WKT coordinate: '$c'")
          (p(0).toDouble, p(1).toDouble)
        }
        // drop the duplicated closing vertex
        val ring = if (coords.length >= 2 && coords.head == coords.last) coords.init else coords
        rings += ((ring.map(_._1), ring.map(_._2)))
        i = t.indexOf('(', close + 1)
      }
    }
    require(rings.nonEmpty, s"WKT without coordinate rings: ${t.take(30)}")
    val offs = rings.scanLeft(0)(_ + _._1.length).toArray
    MultiRing(rings.toArray.flatMap(_._1), rings.toArray.flatMap(_._2), offs)
  }

  /** Reads a `;`-separated country CSV (optionally gzipped) into
    * (id, rings) features — the `readCSV` contract of
    * SpatialJoiner.java:36-71 including its header-detection rules.
    */
  def readCountryCsv(path: String): Seq[(String, MultiRing)] = {
    val raw = Files.newInputStream(Paths.get(path))
    val in = if (path.endsWith(".gz")) new GZIPInputStream(raw) else raw
    val reader = new BufferedReader(new InputStreamReader(in, UTF_8))
    try {
      val header = Option(reader.readLine()).getOrElse(
        throw new IllegalArgumentException(s"empty country file: $path"))
      val cols = header.split(";").map(_.toLowerCase.trim)
      val geomIdx = Seq("geometry", "geom", "geo", "wkt")
        .flatMap(n => cols.indices.find(cols(_) == n)).headOption
        .getOrElse(throw new IllegalArgumentException(
          "could not find a valid geometry header [geometry, geom, geo, wkt]"))
      val idIdx = Seq("id", "iso", "name")
        .flatMap(n => cols.indices.find(cols(_).startsWith(n))).headOption
        .getOrElse(throw new IllegalArgumentException(
          "could not find a valid id header [id*, iso*, name*]"))
      val needed = math.max(idIdx, geomIdx) + 1
      Iterator.continually(reader.readLine()).takeWhile(_ != null)
        .zipWithIndex // before the empty-line filter so i+2 = 1-based file line
        .filter(_._1.nonEmpty)
        .map { case (line, i) =>
          val row = line.split(";")
          if (row.length < needed)
            throw new IllegalArgumentException(
              s"$path: data row ${i + 2} has ${row.length} field(s), " +
                s"need ${needed}: '${line.take(120)}'")
          (row(idIdx), parseWkt(row(geomIdx)))
        }
        .toVector
    } finally reader.close()
  }

  /** One broadcastable grid-cell row. Full cells (provably contained) carry
    * NO geometry — the short-circuit needs none and the broadcast stays
    * small; partial cells carry the feature's rings for the exact refine.
    */
  final case class GridCellRow(scid: Long, country: String, full_cell: Boolean,
      xs: Seq[Double], ys: Seq[Double], offs: Seq[Int])

  /** Builds the covering-grid index over arbitrary (concave, holed)
    * polygons — the GridIndex.java:69-160 / BuildGridAction.java semantics
    * on a fixed-resolution grid: for every cell a feature's bbox touches,
    *
    *  - if NO ring edge touches the closed cell rectangle, containment
    *    parity is constant across the whole cell: one interior probe
    *    classifies it FULL (short-circuit — BuildGridAction's
    *    `covers(bbox)` branch) or entirely outside (dropped — the
    *    `intersects.isEmpty && covers.isEmpty` branch);
    *  - otherwise the cell is PARTIAL and points in it take the exact
    *    even-odd refine (SpatialGridJoiner.java:54-59 fallback).
    *
    * Edge presence uses the segment-bbox ∩ cell test: exact for
    * axis-parallel edges, conservative for diagonal ones — a conservative
    * PARTIAL is always correct (it just runs the refine), so the
    * short-circuit fires only where containment is provable.
    *
    * Cell key: scid = (y div cellH) * nxCells + (x div cellW), the same
    * integer map-side arithmetic the point side uses — the index is the
    * only thing that moves (broadcast); the fact table never shuffles.
    */
  def gridCells(features: Seq[(String, MultiRing)], cellW: Long, cellH: Long,
      nxCells: Long): Seq[GridCellRow] = {
    val out = Vector.newBuilder[GridCellRow]
    features.foreach { case (id, mr) =>
      val (bx0, by0, bx1, by1) = mr.bbox
      val cx0 = math.floor(bx0 / cellW).toLong
      val cx1 = math.floor(bx1 / cellW).toLong
      val cy0 = math.floor(by0 / cellH).toLong
      val cy1 = math.floor(by1 / cellH).toLong
      var cy = cy0
      while (cy <= cy1) {
        var cx = cx0
        while (cx <= cx1) {
          val (rx0, ry0) = (cx * cellW.toDouble, cy * cellH.toDouble)
          val (rx1, ry1) = (rx0 + cellW, ry0 + cellH)
          if (anyEdgeTouches(mr, rx0, ry0, rx1, ry1))
            out += GridCellRow(cy * nxCells + cx, id, full_cell = false,
              mr.xs.toSeq, mr.ys.toSeq, mr.offs.toSeq)
          else if (graft.functions.Geo.pointInRings(
              (rx0 + rx1) / 2, (ry0 + ry1) / 2, mr.xs, mr.ys, mr.offs))
            out += GridCellRow(cy * nxCells + cx, id, full_cell = true, Nil, Nil, Nil)
          // else: cell entirely outside this feature — not indexed
          cx += 1
        }
        cy += 1
      }
    }
    out.result()
  }

  /** Does any ring edge's bounding box intersect the closed rectangle?
    * No-edge-touching implies constant containment parity over the cell
    * (the geometry boundary cannot enter it), which is what makes the
    * full-cell short-circuit provable.
    */
  private def anyEdgeTouches(mr: MultiRing, rx0: Double, ry0: Double,
      rx1: Double, ry1: Double): Boolean = {
    var r = 0
    while (r < mr.offs.length - 1) {
      val lo = mr.offs(r); val hi = mr.offs(r + 1)
      var i = lo
      while (i < hi) {
        val k = if (i + 1 == hi) lo else i + 1
        val sx0 = math.min(mr.xs(i), mr.xs(k)); val sx1 = math.max(mr.xs(i), mr.xs(k))
        val sy0 = math.min(mr.ys(i), mr.ys(k)); val sy1 = math.max(mr.ys(i), mr.ys(k))
        if (sx1 >= rx0 && sx0 <= rx1 && sy1 >= ry0 && sy0 <= ry1) return true
        i += 1
      }
      r += 1
    }
    false
  }
}
