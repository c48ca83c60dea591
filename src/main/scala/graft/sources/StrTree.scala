package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Packed R-tree over boundary-feature bounding boxes — the
  * SpatialIndexJoiner.java analog (the reference packs a JTS HPRtree over
  * feature envelopes and refines with prepared geometries;
  * SpatialIndexJoiner.java:17-45). Packing is sort-tile-recursive (STR):
  * sort by center x, tile into √G vertical slices, sort each slice by
  * center y, cut into nodes of `Branching` entries — the classic bulk-load
  * that keeps sibling overlap low.
  *
  * The tree is FLAT primitive arrays (no object graph), so one broadcast
  * ships it to every executor and the probe allocates nothing per row
  * beyond its result buffer — the same deployment shape as the
  * covering-grid joiner, but robust to boundary sets where a few huge
  * polygons would explode the grid's cell count. The even-odd refine stays
  * the shared [[graft.functions.Geo.pointInRings]] kernel in the caller.
  */
object StrTree {

  val Branching = 8

  /** Flat tree: per node a bbox + an entry range. Leaf ranges index
    * `featOrder` (feature ids); inner ranges index `childIdx` (node ids).
    * `root` is the last node built.
    */
  final case class Packed(
      minX: Array[Double], minY: Array[Double],
      maxX: Array[Double], maxY: Array[Double],
      start: Array[Int], count: Array[Int], leaf: Array[Boolean],
      featOrder: Array[Int], childIdx: Array[Int], root: Int) {
    def size: Int = minX.length
  }

  /** STR tiling of item indices by bbox centers: groups of at most
    * [[Branching]] indices, slice-sorted x then y.
    */
  private def tile(items: Seq[Int], cx: Int => Double, cy: Int => Double): Seq[Seq[Int]] = {
    val n = items.length
    if (n == 0) return Seq.empty
    val nGroups = (n + Branching - 1) / Branching
    val nSlices = math.ceil(math.sqrt(nGroups.toDouble)).toInt
    val sliceSize = ((n + nSlices - 1) / nSlices + Branching - 1) / Branching * Branching
    items.sortBy(cx)
      .grouped(math.max(sliceSize, Branching)).toSeq
      .flatMap(slice => slice.sortBy(cy).grouped(Branching).toSeq)
  }

  /** Bulk-load from feature bboxes (parallel arrays). */
  def pack(fMinX: Array[Double], fMinY: Array[Double],
      fMaxX: Array[Double], fMaxY: Array[Double]): Packed = {
    val n = fMinX.length
    val minX = ArrayBuffer[Double](); val minY = ArrayBuffer[Double]()
    val maxX = ArrayBuffer[Double](); val maxY = ArrayBuffer[Double]()
    val start = ArrayBuffer[Int](); val count = ArrayBuffer[Int]()
    val leaf = ArrayBuffer[Boolean]()
    val featOrder = ArrayBuffer[Int]()
    val childIdx = ArrayBuffer[Int]()

    if (n == 0)
      return Packed(Array(0.0), Array(0.0), Array(-1.0), Array(-1.0),
        Array(0), Array(0), Array(true), Array.empty, Array.empty, 0)

    // leaves over features
    val leafGroups = tile(0 until n,
      i => (fMinX(i) + fMaxX(i)) / 2, i => (fMinY(i) + fMaxY(i)) / 2)
    var level: Seq[Int] = leafGroups.map { g =>
      val id = minX.length
      start += featOrder.length; count += g.length; leaf += true
      var (x0, y0, x1, y1) = (Double.MaxValue, Double.MaxValue, -Double.MaxValue, -Double.MaxValue)
      g.foreach { fi =>
        featOrder += fi
        if (fMinX(fi) < x0) x0 = fMinX(fi); if (fMaxX(fi) > x1) x1 = fMaxX(fi)
        if (fMinY(fi) < y0) y0 = fMinY(fi); if (fMaxY(fi) > y1) y1 = fMaxY(fi)
      }
      minX += x0; minY += y0; maxX += x1; maxY += y1
      id
    }

    // pack upward until a single root remains
    while (level.length > 1) {
      val groups = tile(level,
        id => (minX(id) + maxX(id)) / 2, id => (minY(id) + maxY(id)) / 2)
      level = groups.map { g =>
        val id = minX.length
        start += childIdx.length; count += g.length; leaf += false
        g.foreach(childIdx += _)
        minX += g.map(minX(_)).min; minY += g.map(minY(_)).min
        maxX += g.map(maxX(_)).max; maxY += g.map(maxY(_)).max
        id
      }
    }
    Packed(minX.toArray, minY.toArray, maxX.toArray, maxY.toArray,
      start.toArray, count.toArray, leaf.toArray, featOrder.toArray,
      childIdx.toArray, level.head)
  }

  /** Feature indices whose leaf bbox contains (x, y) — iterative descend,
    * no per-row allocation beyond the result buffer. Callers refine with
    * the exact ring test (candidate ⊇ answer, like the reference's
    * envelope query + prepared-geometry intersects).
    */
  def query(t: Packed, x: Double, y: Double): Seq[Int] = {
    val out = ArrayBuffer[Int]()
    val stack = new java.util.ArrayDeque[Int]()
    stack.push(t.root)
    while (!stack.isEmpty) {
      val id = stack.pop()
      if (x >= t.minX(id) && x <= t.maxX(id) && y >= t.minY(id) && y <= t.maxY(id)) {
        var i = t.start(id)
        val end = t.start(id) + t.count(id)
        if (t.leaf(id)) while (i < end) { out += t.featOrder(i); i += 1 }
        else while (i < end) { stack.push(t.childIdx(i)); i += 1 }
      }
    }
    out.toSeq
  }
}
