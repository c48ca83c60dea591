package graft.operators

import graft.Tables
import graft.functions.GeoFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Geometry engine — the osm-geometry / contribution-geometry analog.
  *
  * The reference derives per-contribution geometry attributes: bbox,
  * centroid, length + length_delta, area + area_delta
  * (ContributionsAvroConverter.java:150-164), WKB encoding, and the
  * XZ-ordering curve code of the bbox (util/XZCode.java). Coordinates here
  * are derived deterministically from `events` columns (integer
  * centi-degrees) so every result is oracle-checkable: integer modular
  * arithmetic is exact in both engines, and all accumulation happens in
  * BIGINT/DECIMAL before one final float division.
  *
  * Scale: all per-entity attributes share ONE shuffle (partition by
  * user_id) reused across the window stages; bbox/centroid are plain
  * hash aggregates with map-side partials; the country join broadcasts the
  * boundary grid — the point side never shuffles.
  */
object Geometry {

  /** Deterministic synthetic points: integer centi-degree coords.
    * xi ∈ [0, 36000) → lon ∈ [-180, 180); yi ∈ [0, 18000) → lat ∈ [-90, 90).
    */
  private def points(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"))
      .withColumn("xi", (col("event_id") * 7919) % 36000)
      .withColumn("yi", (col("event_id") * 104729) % 18000)
      .withColumn("lon", col("xi") / 100.0 - 180.0)
      .withColumn("lat", col("yi") / 100.0 - 90.0)

  private val ptsSql =
    """SELECT event_id, user_id, xi, yi,
      |       xi / 100.0 - 180.0 AS lon, yi / 100.0 - 90.0 AS lat
      |FROM (SELECT event_id, user_id,
      |        (event_id * 7919) % 36000 AS xi,
      |        (event_id * 104729) % 18000 AS yi
      |      FROM events) raw""".stripMargin

  private val byUserEv = Window.partitionBy("user_id").orderBy("event_id")
  private val cumFrame = byUserEv.rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Bbox per entity — min/max over exact 2-decimal doubles. */
  def geoBbox(s: SparkSession, dir: String): DataFrame =
    points(s, dir).groupBy("user_id")
      .agg(min("lon").as("xmin"), min("lat").as("ymin"),
        max("lon").as("xmax"), max("lat").as("ymax"))

  /** Centroid per entity — integer coordinate sums (exact), one final
    * float division.
    */
  def geoCentroid(s: SparkSession, dir: String): DataFrame =
    points(s, dir).groupBy("user_id")
      .agg((sum("xi").cast("double") / count(lit(1)) / 100.0 - 180.0).as("cx"),
        (sum("yi").cast("double") / count(lit(1)) / 100.0 - 90.0).as("cy"),
        count(lit(1)).as("npts"))

  /** Haversine step distance — identical expression text runs in Spark and
    * DuckDB; transcendental output rounded to 4 decimals (SURVEY §3.2)
    * before DECIMAL accumulation.
    */
  private val stepSql =
    "round(2 * 6371000.0 * asin(sqrt(" +
      "sin(radians(lat - plat) / 2) * sin(radians(lat - plat) / 2) + " +
      "cos(radians(plat)) * cos(radians(lat)) * " +
      "sin(radians(lon - plon) / 2) * sin(radians(lon - plon) / 2))), 3)"

  /** Per-event step length + running line length per entity. Steps are
    * rounded to integer MILLIMETERS and then accumulated as fixed-point
    * longs — exact like a DECIMAL sum but the window stays in
    * primitive-long codegen. The mm granularity is the engine-portability
    * margin, same as the `geodesic_length_mm` kernel: sin/cos/asin are
    * not correctly rounded, so the two engines' step doubles can differ
    * by ~ulp — a flip needs the true value within that ulp of a 0.5 mm
    * boundary. The former 0.1 mm granularity made ties 10× denser and
    * one of 100 000 sf0.1 rows actually flipped (caught by an sf0.1
    * oracle sweep); at mm the expected flip count stays ≪ 1 through sf1.
    * Outputs are BIGINT mm: fixed-point integers are the only numeric
    * type that stringifies identically on both sides of the compare.
    */
  def geoLength(s: SparkSession, dir: String): DataFrame =
    points(s, dir)
      .withColumn("plon", lag("lon", 1).over(byUserEv))
      .withColumn("plat", lag("lat", 1).over(byUserEv))
      .withColumn("step3",
        when(col("plon").isNull, lit(0L))
          .otherwise(round(expr(stepSql) * 1000).cast("bigint")))
      .withColumn("step_mm", col("step3"))
      .withColumn("cum_mm", sum("step3").over(cumFrame))
      .select("event_id", "user_id", "step_mm", "cum_mm")

  /** Shoelace ring area per entity prefix (the ring closes back to the
    * entity's first point) + area_delta vs the previous prefix — all in
    * BIGINT centi-degree² until one final division.
    */
  def geoArea(s: SparkSession, dir: String): DataFrame =
    points(s, dir)
      .withColumn("cross_t",
        coalesce(lag("xi", 1).over(byUserEv) * col("yi")
          - col("xi") * lag("yi", 1).over(byUserEv), lit(0L)))
      .withColumn("x1", first("xi").over(byUserEv))
      .withColumn("y1", first("yi").over(byUserEv))
      .withColumn("s2",
        sum("cross_t").over(cumFrame) + (col("xi") * col("y1") - col("x1") * col("yi")))
      .withColumn("a2", abs(col("s2")))
      .withColumn("area_deg2", col("a2") / 20000.0)
      .withColumn("area_delta",
        (col("a2") - coalesce(lag("a2", 1).over(byUserEv), lit(0L))) / 20000.0)
      .select("event_id", "user_id", "area_deg2", "area_delta")

  /** Segment ORIENTATION rose — the compass-bearing census behind
    * street-network orientation studies (Boeing 2019, "Urban spatial
    * order"): each consecutive segment classified into one of 8 compass
    * octants by EXACT sign/magnitude comparisons on the integer
    * centi-degree deltas — |dx| vs |dy| and the two signs decide the
    * octant with zero trigonometry (an `atan2` bearing differs in the
    * last ulp between libms and flips boundary segments); per octant
    * the segment count, exact squared-length mass (no sqrt), and
    * per-mille share. Zero-length steps are excluded (no bearing).
    *
    * Scale shape: the one shared per-entity window exchange (same
    * partitioning as every geometry op), then map-side partials into
    * the FIXED 8-row rose; the share window runs over 8 rows.
    */
  def geoOrientation(s: SparkSession, dir: String): DataFrame =
    points(s, dir)
      .withColumn("pxi", lag("xi", 1).over(byUserEv))
      .withColumn("pyi", lag("yi", 1).over(byUserEv))
      .filter(col("pxi").isNotNull)
      .withColumn("dx", col("xi") - col("pxi"))
      .withColumn("dy", col("yi") - col("pyi"))
      .filter(col("dx") =!= 0 || col("dy") =!= 0)
      .withColumn("octant", expr(
        """CASE
          | WHEN dx >= 0 AND dy >= 0 AND abs(dx) >= abs(dy) THEN 0L
          | WHEN dx >= 0 AND dy >= 0 THEN 1L
          | WHEN dx < 0 AND dy >= 0 AND abs(dy) >= abs(dx) THEN 2L
          | WHEN dx < 0 AND dy >= 0 THEN 3L
          | WHEN dx < 0 AND dy < 0 AND abs(dx) >= abs(dy) THEN 4L
          | WHEN dx < 0 AND dy < 0 THEN 5L
          | WHEN dx >= 0 AND dy < 0 AND abs(dy) >= abs(dx) THEN 6L
          | ELSE 7L END""".stripMargin))
      .withColumn("len2", col("dx") * col("dx") + col("dy") * col("dy"))
      .groupBy("octant")
      .agg(count(lit(1)).as("n_segs"), sum("len2").as("len2_sum"),
        max("len2").as("len2_max"))
      .withColumn("share_pm", expr("(1000 * n_segs) div sum(n_segs) over ()"))
      .orderBy("octant")

  /** WKB point encoding via the custom codegen expression `wkb_point`
    * (graft.functions.WkbPoint). Integer-valued degrees keep the oracle's
    * IEEE-754 bit construction exact.
    */
  def geoWkb(s: SparkSession, dir: String): DataFrame = {
    GeoFunctions.register(s)
    Tables.events(s, dir)
      .select(col("event_id"),
        ((col("event_id") * 31) % 360 - 180).cast("double").as("lon_d"),
        ((col("event_id") * 17) % 180 - 90).cast("double").as("lat_d"))
      .withColumn("wkb", call_function("wkb_point", col("lon_d"), col("lat_d")))
  }

  /** GEOHASH SPATIAL BINNING (`geo_geohash`): the base-32 geohash of each
    * point via the `geohash8` codegen kernel (public algorithm — exact
    * dyadic bisection, see Geo.geohash8), aggregated into precision-4
    * cells: point count, exact distinct users, the cell's lexicographic
    * min full-precision hash. The standard heatmap/prefix-join layout —
    * a geohash prefix IS a spatial bucket, so co-located points share a
    * shuffle key at any precision without geometry math.
    *
    * Scale: kernel is scan-side codegen; the cell aggregate folds
    * map-side; distinct users ride the same cell-keyed exchange. Integer
    * degrees keep the oracle's closed-form BIGINT quantization
    * bit-identical to the kernel's bisection.
    */
  def geoGeohash(s: SparkSession, dir: String): DataFrame = {
    GeoFunctions.register(s)
    Tables.events(s, dir)
      .select(col("user_id"),
        ((col("event_id") * 31) % 360 - 180).cast("double").as("lon"),
        ((col("event_id") * 17) % 180 - 90).cast("double").as("lat"))
      .withColumn("gh", call_function("geohash8", col("lon"), col("lat")))
      .groupBy(substring(col("gh"), 1, 4).as("cell"))
      .agg(count(lit(1)).as("n_points"),
        countDistinct("user_id").as("n_users"),
        min("gh").as("min_gh"))
  }

  /** XZ-ordering curve (level, code) of each entity bbox — custom codegen
    * expressions; rows-only driver check (log2/pow semantics are not
    * portable SQL), ScalaTest covers the kernel.
    */
  def geoXzcode(s: SparkSession, dir: String): DataFrame = {
    GeoFunctions.register(s)
    // Element-sized boxes (extent varies 0..0.5° by event) — exercises the
    // level-selection logic across the whole resolution range, like the
    // reference's per-contribution envelope.
    points(s, dir)
      .withColumn("ext", (col("event_id") % 1000) / 2000.0)
      .withColumn("xmax", least(col("lon") + col("ext"), lit(180.0)))
      .withColumn("ymax", least(col("lat") + col("ext"), lit(90.0)))
      .withColumn("xz_level",
        call_function("xz_level", col("lon"), col("lat"), col("xmax"), col("ymax")))
      .withColumn("xz_code",
        call_function("xz_code", col("lon"), col("lat"), col("xmax"), col("ymax")))
      .select("event_id", "lon", "lat", "xmax", "ymax", "xz_level", "xz_code")
  }

  /** Point-in-polygon join vs a boundary grid (SpatialGridJoiner.java
    * analog): each point keys into its grid cell (integer arithmetic, no
    * shuffle of the point side), then a BROADCAST HASH join on the cell id
    * with an exact containment refine — the classic filter/refine spatial
    * join, expressed so Catalyst picks a hash join instead of a
    * nested-loop theta join.
    */
  def geoCountryJoin(s: SparkSession, dir: String): DataFrame = {
    val bounds = Tables.nation(s, dir).select(
      col("n_nationkey").cast("long").as("cell"),
      col("n_name").as("country"),
      ((col("n_nationkey") % 5) * 72 - 180).cast("double").as("lon_min"),
      (expr("n_nationkey div 5") * 36 - 90).cast("double").as("lat_min"))
    points(s, dir)
      .withColumn("cell", expr("(yi div 3600) * 5 + (xi div 7200)"))
      .join(broadcast(bounds), Seq("cell"))
      .filter(col("lon") >= col("lon_min") && col("lon") < col("lon_min") + 72 &&
        col("lat") >= col("lat_min") && col("lat") < col("lat_min") + 36)
      .select("event_id", "lon", "lat", "country")
  }

  /** Geodesic length + area per entity, with the reference's
    * flattening-corrected formulas (GeometryTools.java:43-61 length,
    * :203-240 area) — not the plain haversine/deg² of geo_length/geo_area.
    * Entity points are assembled into ordered coordinate arrays (one
    * entity-keyed shuffle, arrays stay small — the way-assembly shape) and
    * the custom codegen kernels do one pass each. Outputs are fixed-point
    * BIGINT (mm / m²): exact, order-independent, driver-compare-safe.
    */
  def geoGeodesic(s: SparkSession, dir: String): DataFrame = {
    GeoFunctions.register(s)
    points(s, dir)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("event_id"), col("lon"), col("lat")))).as("pts"))
      .withColumn("lons", expr("transform(pts, p -> p.lon)"))
      .withColumn("lats", expr("transform(pts, p -> p.lat)"))
      .select(col("user_id"), size(col("pts")).as("npts"),
        call_function("geodesic_length_mm", col("lons"), col("lats")).as("length_mm"),
        call_function("geodesic_area_m2", col("lons"), col("lats")).as("area_m2"))
  }

  /** Real polygon spatial join — the filter/refine semantics of the
    * reference's SpatialGridJoiner.java:49-63 + GridIndex.java: polygons
    * are indexed into a covering grid; grid cells FULLY inside a polygon
    * short-circuit containment (no exact test), partial cells fall through
    * to the exact point-in-polygon refine.
    *
    * Here: one convex integer-coordinate hexagon per nation (center = the
    * nation's cell center, odd radius derived from the key), a 1200×600
    * centi-degree subcell grid, and the `point_in_poly` codegen expression
    * as the refine. The whole polygon index is a few hundred rows —
    * broadcast — so the point side NEVER shuffles; this is the 100 TB
    * plan: fact-side map-only, index built once.
    *
    * Exactness of the short-circuit (so the rows-equal oracle can be pure
    * per-point ray-cast): the hexagon is convex, so a subcell whose 4
    * corners pass the ray-cast lies inside the CLOSED polygon (hull
    * argument), and a boundary point inside the open cell is impossible
    * (a boundary point with a neighborhood inside the polygon would be
    * interior). Odd radius keeps the two horizontal hexagon edges off the
    * subcell gridlines, excluding the collinear-face edge case; corners ON
    * the boundary fail the corner ray-cast and demote the cell to partial.
    */
  def geoPolyJoin(s: SparkSession, dir: String): DataFrame = {
    GeoFunctions.register(s)
    val two = lit(2L)
    val polys = Tables.nation(s, dir).select(
      col("n_nationkey").cast("long").as("nk"), col("n_name").as("country"))
      .withColumn("cx", (col("nk") % 5) * 7200 + 3600)
      .withColumn("cy", expr("nk div 5") * 3600 + 1800)
      .withColumn("r", lit(401L) + two * ((col("nk") * 53) % 199))
      // ccw hexagon: (±2r,0), (±r,±2r) offsets — convex, fits the cell
      .withColumn("xs", array(col("cx") + two * col("r"), col("cx") + col("r"),
        col("cx") - col("r"), col("cx") - two * col("r"),
        col("cx") - col("r"), col("cx") + col("r")))
      .withColumn("ys", array(col("cy"), col("cy") + two * col("r"),
        col("cy") + two * col("r"), col("cy"),
        col("cy") - two * col("r"), col("cy") - two * col("r")))
    def pip(x: Column, y: Column): Column =
      call_function("point_in_poly", x, y, col("xs"), col("ys"))
    // covering-grid index: every subcell the polygon bbox touches,
    // classified full (all 4 corners inside) vs partial — the
    // GridIndex.build analog, derived declaratively (25 polygons in, a few
    // hundred cells out, then broadcast)
    val cells = polys
      .withColumn("sx", explode(expr("sequence((cx - 2*r) div 1200, (cx + 2*r) div 1200)")))
      .withColumn("sy", explode(expr("sequence((cy - 2*r) div 600, (cy + 2*r) div 600)")))
      .withColumn("full_cell",
        pip(col("sx") * 1200, col("sy") * 600) &&
          pip((col("sx") + 1) * 1200, col("sy") * 600) &&
          pip(col("sx") * 1200, (col("sy") + 1) * 600) &&
          pip((col("sx") + 1) * 1200, (col("sy") + 1) * 600))
      .withColumn("scid", col("sy") * 30 + col("sx"))
      .select("scid", "country", "full_cell", "xs", "ys")
    points(s, dir)
      .withColumn("scid", expr("(yi div 600) * 30 + (xi div 1200)"))
      .join(broadcast(cells), Seq("scid"))
      .filter(col("full_cell") || pip(col("xi"), col("yi")))
      .select("event_id", "xi", "yi", "country")
  }

  // ---- WKT country-file join ------------------------------------------

  /** Synthetic `id;wkt` country file derived from `nation` — concave
    * L-shaped shells with square holes, and a disjoint second part
    * (MULTIPOLYGON) for even keys. Written in the integer planar space of
    * the synthetic points so the ray-cast replay is engine-exact, and fed
    * through the REAL ingestion path ([[graft.sources.WktBoundaries]]):
    * the docs/CLI.md `--country-file` contract end-to-end.
    */
  private[graft] def wktCountryFixture(s: SparkSession, dir: String): String = {
    val rows = Tables.nation(s, dir)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def ring(pts: Seq[(Long, Long)]): String =
      (pts :+ pts.head).map { case (x, y) => s"$x $y" }.mkString("(", ", ", ")")
    val lines = rows.map { case (nk, name) =>
      val cx = (nk % 5) * 7200 + 3600
      val cy = (nk / 5) * 3600 + 1800
      val r = 400 + 2 * ((nk * 53) % 199) // even → hr integral
      val hr = r / 2
      // concave L (big square minus its open top-right quadrant), CCW
      val shell = Seq((cx - 2 * r, cy - 2 * r), (cx + 2 * r, cy - 2 * r),
        (cx + 2 * r, cy), (cx, cy), (cx, cy + 2 * r), (cx - 2 * r, cy + 2 * r))
      // hole inside the bottom-left quadrant
      val hole = Seq((cx - r, cy - r), (cx - r + hr, cy - r),
        (cx - r + hr, cy - r + hr), (cx - r, cy - r + hr))
      // disjoint second part in the quadrant the L leaves empty
      val part2 = Seq((cx + r, cy + r), (cx + 2 * r, cy + r),
        (cx + 2 * r, cy + 2 * r), (cx + r, cy + 2 * r))
      val wkt =
        if (nk % 2 == 0) s"MULTIPOLYGON ((${ring(shell)}, ${ring(hole)}), (${ring(part2)}))"
        else s"POLYGON (${ring(shell)}, ${ring(hole)})"
      s"$name;$wkt"
    }
    val path = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_world_${Integer.toHexString(dir.hashCode)}.csv")
    java.nio.file.Files.write(path,
      ("id;wkt" +: lines).mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    path.toString
  }

  /** WKT country-file spatial join — the full `--country-file` pipeline
    * (docs/CLI.md:31-50 + SpatialGridJoiner.java semantics) over REAL
    * multi-ring geometries: parse the CSV's POLYGON/MULTIPOLYGON WKT
    * (holes included), build the covering-grid index (full-cell
    * short-circuit only where provable, GridIndex/BuildGridAction analog),
    * broadcast it, and refine partial cells with the `point_in_rings`
    * even-odd codegen kernel. The point side computes its cell id with
    * integer map-side arithmetic and NEVER shuffles — at 100 TB the only
    * data movement is the broadcast of the (tiny) cell index, and full
    * cells skip the exact test entirely.
    */
  def geoWktJoin(s: SparkSession, dir: String): DataFrame = {
    GeoFunctions.register(s)
    val csv = wktCountryFixture(s, dir)
    val feats = graft.sources.WktBoundaries.readCountryCsv(csv)
    val cells = graft.sources.WktBoundaries.gridCells(feats, 1200, 600, 30)
    val cellsDf = s.createDataFrame(cells)
    points(s, dir)
      // floor-division cell id: `div` truncates toward zero and would
      // disagree with WktBoundaries.gridCells' math.floor for negative
      // coordinates — real lon/lat boundary files are signed even though
      // this fixture happens to be all-positive
      .withColumn("scid", expr(
        "CAST(floor(yi / 600.0) AS BIGINT) * 30 + CAST(floor(xi / 1200.0) AS BIGINT)"))
      .join(broadcast(cellsDf), Seq("scid"))
      .filter(col("full_cell") || call_function("point_in_rings",
        col("xi").cast("double"), col("yi").cast("double"),
        col("xs"), col("ys"), col("offs")))
      .select("event_id", "xi", "yi", "country")
  }

  /** Ring-validity check as a first-class query (GeometryBuilder.java:52-110
    * trigger conditions over the per-entity point ring): repeated vertices
    * or non-adjacent edge contact → `self_intersects`, the condition that
    * sends the reference into its repair/throw paths. One codegen kernel
    * pass per assembled ring (`ring_self_intersects`); all arithmetic is
    * exact on the integer centi-degree coordinates, so the DuckDB oracle
    * replays the identical orientation tests in BIGINT.
    */
  def geoRingValid(s: SparkSession, dir: String): DataFrame = {
    GeoFunctions.register(s)
    points(s, dir)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("event_id"), col("xi"), col("yi")))).as("pts"))
      .withColumn("xs", expr("transform(pts, p -> CAST(p.xi AS DOUBLE))"))
      .withColumn("ys", expr("transform(pts, p -> CAST(p.yi AS DOUBLE))"))
      .select(col("user_id"), size(col("pts")).as("npts"),
        call_function("ring_self_intersects", col("xs"), col("ys")).as("self_intersects"),
        call_function("ring_cross_pairs", col("xs"), col("ys")).as("n_bad_pairs"),
        call_function("ring_self_intersects",
          expr("slice(xs, 1, 3)"), expr("slice(ys, 1, 3)")).as("tri_self"))
      .withColumn("valid", !col("self_intersects"))
      // the first-3-vertex triangle: valid unless degenerate — exercises
      // the kernel's negative branch too (full random rings always cross)
      .withColumn("tri_valid", !col("tri_self"))
      .drop("tri_self")
  }

  /** Candidate tag values for [[geoWayArea]] — chosen so every ruleset
    * mode branches both ways: whitelist hits (services/rest_area/elevator,
    * riverbank/dam, city_wall, station, plant) and misses (primary, park,
    * yes), blacklist exclusions (coastline/tree_row, cutline/pipeline,
    * taxiway) and pass-throughs.
    */
  private val WayAreaVals = Seq("services", "rest_area", "elevator",
    "coastline", "tree_row", "riverbank", "dam", "city_wall", "station",
    "plant", "taxiway", "cutline", "pipeline", "primary", "park", "yes")

  /** Area-vs-line classification of closed ways — the osm-polygon-features
    * ruleset (ContributionGeometry.isArea:163-172 + polygon_features.csv)
    * over synthetic ways: each event becomes a way with one derived tag,
    * an optional `area=no` override (every 11th), and a ref list that
    * closes for 2 of 3 rows. Exercises the SHARED
    * [[graft.functions.PolygonFeatures]] column builder that
    * `Contributions.withGeometries` uses for real way classification.
    * Scale: one scan + one partial-agg exchange on a 27-key space.
    */
  def geoWayArea(s: SparkSession, dir: String): DataFrame = {
    val keyArr = array(graft.functions.PolygonFeatures.rules.map(r => lit(r._1)): _*)
    val valArr = array(WayAreaVals.map(lit): _*)
    Tables.events(s, dir)
      .select(col("event_id"))
      .withColumn("tag_key", element_at(keyArr, (col("event_id") % 27 + 1).cast("int")))
      .withColumn("tag_val", element_at(valArr, (col("event_id") % 16 + 1).cast("int")))
      .withColumn("closed", col("event_id") % 3 =!= 0)
      .withColumn("area_no", col("event_id") % 11 === 0)
      // the synthetic key can itself be "area" — the override then
      // replaces its value instead of map-concat'ing a duplicate key
      .withColumn("tags",
        when(col("tag_key") === "area",
          map(col("tag_key"),
            when(col("area_no"), lit("no")).otherwise(col("tag_val"))))
          .when(col("area_no"),
            map(col("tag_key"), col("tag_val"), lit("area"), lit("no")))
          .otherwise(map(col("tag_key"), col("tag_val"))))
      .withColumn("refs",
        when(col("closed"), array(lit(1L), lit(2L), lit(3L), lit(1L)))
          .otherwise(array(lit(1L), lit(2L), lit(3L))))
      .withColumn("is_area",
        graft.functions.PolygonFeatures.isArea(col("tags"), col("refs")))
      .groupBy("tag_key")
      .agg(count(lit(1)).as("n_ways"),
        sum(when(col("closed"), 1L).otherwise(0L)).as("n_closed"),
        sum(when(col("is_area"), 1L).otherwise(0L)).as("n_area"))
  }

  /** Spike-vertex census — the ring-repair primitive
    * (RelationGeometry.removeSpikes / reference GeometryBuilder
    * .mergeSegments:261-283) as a declarative window query: a vertex b is
    * a spike tip when its neighbor segments collinearly overlap (next
    * vertex back on [prev, b], or [b, next] running back through prev).
    * Coordinates snap to a coarse integer grid so collinear backtracks
    * actually occur in the synthetic points; every comparison is exact
    * integer arithmetic — no epsilon, no cross-engine float hazard. Scan +
    * one keyed window + partial agg: the 100 TB shape is a single
    * exchange.
    */
  def geoSpikes(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    def between(p: Column, lo: Column, hi: Column) =
      p >= least(lo, hi) && p <= greatest(lo, hi)
    points(s, dir)
      .withColumn("bx", expr("xi div 6000")).withColumn("by", expr("yi div 6000"))
      .withColumn("ax", lag("bx", 1).over(w)).withColumn("ay", lag("by", 1).over(w))
      .withColumn("cx", lead("bx", 1).over(w)).withColumn("cy", lead("by", 1).over(w))
      .withColumn("collinear",
        (col("bx") - col("ax")) * (col("cy") - col("ay")) -
          (col("by") - col("ay")) * (col("cx") - col("ax")) === 0)
      .withColumn("is_spike",
        col("ax").isNotNull && col("cx").isNotNull && col("collinear") &&
          ((between(col("cx"), col("ax"), col("bx")) &&
            between(col("cy"), col("ay"), col("by"))) ||
            (between(col("ax"), col("bx"), col("cx")) &&
              between(col("ay"), col("by"), col("cy")))))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_vertices"),
        sum(when(col("is_spike"), 1L).otherwise(0L)).as("n_spikes"))
  }

  /** Grid-kNN cell-edge ladder + target occupancy: the edge halves until
    * the expected per-cell point count drops to ~[[KnnOccupancy]] (or the
    * 75-centidegree floor). A FIXED grid is a scale trap this operator
    * measured directly: at sf1 the 1200 edge held 10× the density, so
    * candidates grew 10× per probe × 10× probes = ×100 (35.9 s) — the
    * adaptive edge restores candidates ∝ probes.
    */
  private val KnnEdges = Seq(1200L, 600L, 300L, 150L, 75L)
  private val KnnOccupancy = 250L

  private def knnEdgeFor(n: Long): Long =
    KnnEdges.find(e => n <= KnnOccupancy * ((36000L / e) * (18000L / e)))
      .getOrElse(KnnEdges.last)

  /** Grid-kNN spatial join: the 5 nearest points to each query point,
    * candidates drawn from the query's 3×3 grid-cell neighborhood. The
    * cell edge is DENSITY-ADAPTIVE — the largest of [[KnnEdges]] whose
    * expected occupancy stays ≤ [[KnnOccupancy]] points/cell (a count()
    * over the scan; a deployment would read the catalog row count) — so
    * per-probe candidate work is bounded at any corpus size instead of
    * growing with density. The (adaptive) neighborhood IS the contract —
    * like LSH ANN, recall outside the probed cells is explicitly out of
    * scope, which is what makes the operator exact, engine-portable, and
    * distributable: the base side partitions by cell and never sees a
    * query it can't match; the oracle derives the same edge from the
    * same integer rule. Distances are exact squared-integer centidegree
    * sums (no float, no sqrt — ranking by d² equals ranking by d); the
    * tiny query sample (event_id ≡ 0 mod 1009) explodes into its 9 probe
    * cells and broadcasts, so the 100 TB point side joins
    * hash-partitioned on its own cell key, and the top-5 rank is
    * WindowGroupLimit-pruned map-side.
    */
  /** Point-count per corpus dir, memoized: the adaptive edge needs the
    * scan's row count at plan-CONSTRUCTION time, and without the cache
    * merely building the plan (explain, plan audits, every bench rep)
    * re-ran a full count job. A deployment would read the catalog row
    * count; the dirs here are write-once, so one count per dir is its
    * moral equivalent.
    */
  private val knnCountCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  def geoKnn(s: SparkSession, dir: String): DataFrame = {
    val pts = points(s, dir)
    val edge = knnEdgeFor(
      knnCountCache.computeIfAbsent(dir, _ => pts.count()))
    val p = pts
      .withColumn("cx", expr(s"xi div $edge"))
      .withColumn("cy", expr(s"yi div $edge"))
    val probes = p.filter(col("event_id") % 1009 === 0)
      .select(col("event_id").as("q_id"), col("xi").as("qx"),
        col("yi").as("qy"), col("cx"), col("cy"))
      .withColumn("dx", explode(typedLit(Seq(-1L, 0L, 1L))))
      .withColumn("dy", explode(typedLit(Seq(-1L, 0L, 1L))))
      .select(col("q_id"), col("qx"), col("qy"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    p.join(broadcast(probes), Seq("cx", "cy"))
      .filter(col("event_id") =!= col("q_id"))
      .withColumn("d2",
        (col("xi") - col("qx")) * (col("xi") - col("qx")) +
          (col("yi") - col("qy")) * (col("yi") - col("qy")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("q_id").orderBy("d2", "event_id")))
      .filter(col("rnk") <= 5)
      .select(col("q_id"), col("event_id").as("n_id"), col("rnk"), col("d2"))
  }

  /** Douglas–Peucker polyline simplification (the geometry
    * GENERALIZATION pass an OSM renderer / tile pipeline runs on every
    * way; cf. reference geometry assembly in GeometryBuilder.java —
    * simplification is the step after assembly): per entity, the
    * depth-capped DP keep-set summary from ONE `dp_keep` codegen kernel
    * call ([[graft.functions.Geo.dpKeep]]) over the event-ordered
    * integer centidegree polyline. All arithmetic is exact int64
    * (cross² vs ε²·|AB|² cross-multiplication; within a segment the
    * denominator is constant, so the interior argmax needs no ratio),
    * and the bounded depth ([[graft.functions.Geo.DpDepth]]) is part of
    * the contract — it is what lets DuckDB replay the recursion as a
    * fixed chain of per-level argmax CTEs, and what bounds the work a
    * pathological polyline can demand at 100 TB. ONE keyed exchange
    * (the per-entity collect); the kernel is O(depth · n) per entity,
    * entity size bounded by the source (OSM ways cap at 2 000 nodes).
    */
  def geoSimplify(s: SparkSession, dir: String): DataFrame = {
    GeoFunctions.register(s)
    points(s, dir)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("event_id"), col("xi"), col("yi")))).as("pts"))
      .select(col("user_id"), size(col("pts")).cast("long").as("n_points"),
        call_function("dp_keep",
          expr("transform(pts, p -> p.xi)"),
          expr("transform(pts, p -> p.yi)")).as("dp"))
      .select(col("user_id"), col("n_points"),
        col("dp").getItem(0).as("n_kept"),
        col("dp").getItem(1).as("idx_sum"),
        col("dp").getItem(2).as("x_sum"),
        col("dp").getItem(3).as("y_sum"))
      .orderBy("user_id")
  }

  /** Tile-PYRAMID rollup (zooms 2..6) — the density aggregation a tile
    * server / heat-map renderer precomputes over every zoom level at
    * once. Tiling is EQUIRECTANGULAR on the integer centidegree grid:
    * `tx = xi·2^z div 36000`, `ty = yi·2^z div 18000` — exact integer
    * division, no Mercator `ln∘tan` transcendental anywhere (Web-
    * Mercator Y is a monotone remap of the latitude bucket; it changes
    * tile labels, not the plan, and would reintroduce the cross-engine
    * libm risk geo_length already paid for once).
    *
    * Scale shape: ONE scan; the 5-zoom fan-out is a map-side explode
    * of a constant array (rows ×5 before partial aggregation, the
    * q15_cube Expand argument), and the aggregate key space is
    * Σ_z 4^z ≤ 5 456 tiles — domain-bounded, so the partial aggregate
    * collapses map-side and exactly ONE bounded exchange runs
    * regardless of corpus size. Per tile: point count + distinct
    * entities + an id checksum pinning membership.
    */
  def geoTilePyramid(s: SparkSession, dir: String): DataFrame =
    points(s, dir)
      .select(col("event_id"), col("user_id"), col("xi"), col("yi"),
        explode(typedLit(Seq(2, 3, 4, 5, 6))).as("z"))
      .withColumn("tx", expr("(xi * (1 << z)) div 36000"))
      .withColumn("ty", expr("(yi * (1 << z)) div 18000"))
      .groupBy("z", "tx", "ty")
      .agg(count(lit(1)).as("n_points"),
        countDistinct("user_id").as("n_entities"),
        sum("event_id").as("id_sum"))
      .orderBy("z", "tx", "ty")

  /** DBSCAN core-point census (Ester et al., KDD 1996 — the primitive
    * under every density clustering pass): per point, how many OTHER
    * points lie within ε (integer centidegrees, exact squared-integer
    * distance d² ≤ ε² — rank-safe, no sqrt), then the population rolled
    * up by core verdict (≥ minPts−1 neighbors) × log₂ density bucket
    * (`length(bin(n))` — the evt_histogram libm-free integer log₂).
    * ε = 400 cd, minPts = 4 (sized so the synthetic lattice's rigid
    * spacing — no pair sits closer than ~200 cd — still yields a mixed
    * core/noise census at every SF): the ε-grid IS the contract, like
    * geo_knn's neighborhood and LSH's bands.
    *
    * Scale shape: the neighbor count is a grid self-join — cell edge =
    * ε, so every ε-ball lives in the 3×3 neighborhood; the probe side
    * keys by its OWN cell, the candidate side map-side-explodes to its
    * 9 neighbor cells, and the join co-locates on the cell key (hash
    * exchanges both sides, no broadcast of a corpus-scale frame, AQE
    * handles dense-cell skew). Candidate work is Θ(n·ρ·ε²) — the
    * irreducible output of a density census (every true ε-pair must be
    * counted) — NOT corpus-quadratic. The SELF-pair (always present: a
    * point meets itself in its own cell at d² = 0) is counted and
    * subtracted, so every point survives the aggregate with n_nbr ≥ 0
    * and no zero-neighbor re-entry join is needed at all; the final
    * rollup key space is 2 × ≤64 buckets.
    */
  def geoDbscanCore(s: SparkSession, dir: String): DataFrame = {
    val eps = 400L
    // COLLAPSE DUPLICATE COORDINATES FIRST (r14): the ε-census depends
    // only on the coordinate — co-located points share one neighbor
    // count (S − 1 each, S = Σ multiplicities of qualifying coords,
    // which includes their own coord once for self), and the rollup's
    // masses are additive (n_points += m, id_sum += Σids). So the
    // quadratic grid join runs over UNIQUE weighted coordinates — the
    // micro-cluster trick every density engine uses — and the pair work
    // is bounded by the coordinate DOMAIN, not the corpus: 10× denser
    // data previously meant ×100 pairs (59 s at sf1); now the unique
    // frame saturates and sf1 ≈ sf0.1 (+ one map-side collapse).
    val uc = points(s, dir).groupBy("xi", "yi")
      .agg(count(lit(1)).as("m"), sum("event_id").as("sid"))
    // hash-partition the probe side on its cell key (the geo_knn layout
    // discipline): the join's OUTPUT is still up to 1000× its input and
    // AQE plans by INPUT bytes — without the exchange one task would
    // serialize the whole candidate stream (measured pre-fix at sf1).
    val left = uc
      .withColumn("cx", expr(s"xi div $eps")).withColumn("cy", expr(s"yi div $eps"))
      .repartition(col("cx"), col("cy"))
    val nbr = uc
      .select(col("xi").as("nxi"), col("yi").as("nyi"), col("m").as("nm"))
      .withColumn("dx", explode(typedLit(Seq(-1, 0, 1))))
      .withColumn("dy", explode(typedLit(Seq(-1, 0, 1))))
      .withColumn("cx", expr(s"nxi div $eps") + col("dx"))
      .withColumn("cy", expr(s"nyi div $eps") + col("dy"))
      .select("nxi", "nyi", "nm", "cx", "cy")
    left.join(nbr, Seq("cx", "cy"))
      .filter((col("nxi") - col("xi")) * (col("nxi") - col("xi")) +
        (col("nyi") - col("yi")) * (col("nyi") - col("yi")) <= lit(eps * eps))
      .groupBy("xi", "yi", "m", "sid")
      .agg((sum("nm") - 1L).as("n_nbr"))
      .withColumn("is_core", (col("n_nbr") >= 3L).cast("bigint"))
      .withColumn("bucket", expr(
        "cast(case when n_nbr = 0 then 0 else length(bin(n_nbr)) end as bigint)"))
      .groupBy("is_core", "bucket")
      .agg(sum("m").as("n_points"), sum("sid").as("id_sum"))
      .orderBy("is_core", "bucket")
  }

  /** HOTSPOT detection on the 1° cell grid (a Getis-Ord-style focal
    * statistic, the discrete convolution form): per occupied cell the
    * 3×3-neighborhood point total `nb_sum` (self included, empty
    * neighbors contribute 0) and the neighborhood density relative to
    * the global per-position mean,
    * `dens_pm = ⌊1000·P·nb_sum / (N·nb_cnt)⌋` with P = 360·180 grid
    * positions and nb_cnt the cell's in-bounds neighbor-position count
    * (edge cells have < 9) — all exact integer. Top 25 by
    * (nb_sum desc, cx, cy).
    *
    * Scale shape: the corpus is touched ONCE (the cell-count partial
    * aggregate); the 3×3 kernel is a map-side 9-way credit explode over
    * the bounded ≤ 64 800-cell frame — convolution as explode+aggregate,
    * never a self-join on the corpus — and N binds as a broadcast 1-row
    * aggregate. At a finer grid the cell frame grows but stays
    * resolution-bounded, independent of corpus size.
    */
  def geoHotspot(s: SparkSession, dir: String): DataFrame = {
    val cells = points(s, dir)
      .groupBy(expr("xi div 100").as("cx"), expr("yi div 100").as("cy"))
      .agg(count(lit(1)).as("n"))
    val credits = cells
      .select(col("cx"), col("cy"), col("n"),
        explode(expr("transform(sequence(0, 8), k -> " +
          "struct(cx + k div 3 - 1 AS tx, cy + k % 3 - 1 AS ty))")).as("t"))
      .select(col("t.tx").as("tx"), col("t.ty").as("ty"), col("n"))
      .filter(col("tx") >= 0 && col("tx") <= 359 &&
        col("ty") >= 0 && col("ty") <= 179)
      .groupBy("tx", "ty").agg(sum("n").as("nb_sum"))
    val nTot = cells.agg(sum("n").as("nn"))
    cells.join(credits.hint("shuffle_hash"),
        col("cx") === col("tx") && col("cy") === col("ty"))
      .crossJoin(broadcast(nTot))
      .withColumn("nb_cnt",
        (when(col("cx") === 0 || col("cx") === 359, 2L).otherwise(3L) *
          when(col("cy") === 0 || col("cy") === 179, 2L).otherwise(3L)))
      .select(col("cx"), col("cy"), col("n"), col("nb_sum"), col("nb_cnt"),
        expr("(1000L * 64800L * nb_sum) div (nn * nb_cnt)").as("dens_pm"))
      .orderBy(desc("nb_sum"), asc("cx"), asc("cy"))
      .limit(25)
  }

  /** SPATIAL GRID OCCUPANCY AUDIT — the index-health report that prices
    * a grid join before running it (the lesson `geo_knn`'s ×99 sf1 trap
    * taught: occupancy drives probe cost, and nothing reported it):
    * points bin into 1° cells (domain-bounded: 360×180), cells roll into
    * doubling occupancy bands, and the report shows per band the cell
    * count, point mass, densest cell, and per-mille shares — a skewed
    * tail band says "this grid needs the density-adaptive ladder" BEFORE
    * a cluster burns a day discovering it.
    *
    * Scale shape: the cell id is scan-side integer arithmetic; ONE
    * aggregate collapses the corpus into the ≤64800-cell domain frame
    * (map-side partials); the band rollup and its share windows ride
    * domain-scale frames. No joins.
    */
  def geoGridAudit(s: SparkSession, dir: String): DataFrame =
    points(s, dir)
      .withColumn("cell", expr("(yi div 100) * 360 + (xi div 100)"))
      .groupBy("cell").agg(count(lit(1)).as("np"))
      .withColumn("bucket",
        when(col("np") === 1, "a_1").when(col("np") <= 3, "b_2_3")
          .when(col("np") <= 7, "c_4_7").when(col("np") <= 15, "d_8_15")
          .otherwise("e_16p"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_cells"), sum("np").as("n_points"),
        max("np").as("max_in_bucket"))
      .withColumn("cell_share_pm",
        expr("(1000 * n_cells) div sum(n_cells) over ()"))
      .withColumn("point_share_pm",
        expr("(1000 * n_points) div sum(n_points) over ()"))

  /** ANTIMERIDIAN EXTENT AUDIT — the classic bbox defect every geo
    * engine eventually ships: an entity spanning ±180° gets a naive
    * lon-min/max box covering nearly the whole planet. Per entity this
    * reports the naive span AND the true minimal covering arc — 360°
    * minus the largest circular gap between its sorted distinct
    * longitudes — plus the `wraps` flag (naive span > 180° but true
    * arc ≤ 180°): exactly the rows whose bbox a wrap-naive spatial
    * index inflates. All arithmetic in exact centidegrees (the
    * point-grid's native integer), no float wraparound anywhere.
    *
    * Scale shape: one entity-keyed exchange collects each entity's
    * bounded distinct-longitude list (the way-assembly shape); the
    * gap scan is per-entity array work on domain-bounded arrays
    * (≤36000 distinct centidegrees by construction).
    */
  def geoAntimeridian(s: SparkSession, dir: String): DataFrame =
    points(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("npts"),
        array_sort(collect_set(col("xi"))).as("ls"))
      .withColumn("n_lons", size(col("ls")).cast("bigint"))
      .withColumn("span_raw_cd",
        (element_at(col("ls"), -1) - element_at(col("ls"), 1)).cast("bigint"))
      .withColumn("gmax", when(col("n_lons") === 1, lit(36000L)).otherwise(
        greatest(
          expr("CAST(array_max(zip_with(slice(ls, 2, size(ls) - 1), " +
            "slice(ls, 1, size(ls) - 1), (a, b) -> a - b)) AS BIGINT)"),
          lit(36000L) - col("span_raw_cd"))))
      .withColumn("arc_cd", lit(36000L) - col("gmax"))
      .withColumn("wraps",
        col("span_raw_cd") > 18000L && col("arc_cd") <= 18000L)
      .select("user_id", "npts", "n_lons", "span_raw_cd", "arc_cd", "wraps")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_antimeridian" -> (geoAntimeridian _),
    "geo_grid_audit" -> (geoGridAudit _),
    "geo_orientation" -> (geoOrientation _),
    "geo_hotspot" -> (geoHotspot _),
    "geo_dbscan_core" -> (geoDbscanCore _),
    "geo_tile_pyramid" -> (geoTilePyramid _),
    "geo_simplify" -> (geoSimplify _),
    "geo_knn" -> (geoKnn _),
    "geo_spikes" -> (geoSpikes _),
    "geo_way_area" -> (geoWayArea _),
    "geo_ring_valid" -> (geoRingValid _),
    "geo_wkt_join" -> (geoWktJoin _),
    "geo_poly_join" -> (geoPolyJoin _),
    "geo_geodesic" -> (geoGeodesic _),
    "geo_bbox" -> (geoBbox _),
    "geo_centroid" -> (geoCentroid _),
    "geo_length" -> (geoLength _),
    "geo_area" -> (geoArea _),
    "geo_wkb" -> (geoWkb _),
    "geo_geohash" -> (geoGeohash _),
    "geo_xzcode" -> (geoXzcode _),
    "geo_country_join" -> (geoCountryJoin _))

  /** DuckDB replay of geo_geohash: for integer-degree inputs the kernel's
    * bisection equals the closed-form quantization
    * x = ((lon+180)·2^20) // 360, y = ((lat+90)·2^20) // 180 (midpoint
    * ties resolve upward in both), so the oracle interleaves the 40 bits
    * and base-32-encodes them with plain BIGINT arithmetic.
    */
  private val geohashOracleSql: String = {
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    def bit(i: Int): String =
      if (i % 2 == 0) s"((x // ${1L << (19 - i / 2)}) % 2)"
      else s"((y // ${1L << (19 - (i - 1) / 2)}) % 2)"
    val chars = (0 until 8).map { j =>
      val v = (0 until 5).map(b => s"${bit(5 * j + b)} * ${1 << (4 - b)}")
        .mkString(" + ")
      s"substr('$alpha', CAST($v AS INT) + 1, 1)"
    }.mkString("\n|    || ")
    s"""WITH pts AS (SELECT event_id, user_id,
       |    (event_id * 31) % 360 - 180 AS lon, (event_id * 17) % 180 - 90 AS lat
       |  FROM events),
       |q AS (SELECT event_id, user_id,
       |    ((lon + 180) * 1048576) // 360 AS x, ((lat + 90) * 1048576) // 180 AS y
       |  FROM pts),
       |g AS (SELECT event_id, user_id, $chars AS gh FROM q)
       |SELECT substr(gh, 1, 4) AS cell, count(*) AS n_points,
       |  count(DISTINCT user_id) AS n_users, min(gh) AS min_gh
       |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
  }


  /** DuckDB replay of the XZ curve: the enlarged-element length from
    * floor(ln ext / ln 0.5) (+1 when the doubled cell still covers), then
    * the 16-step quadtree descent unrolled as chained CTE stages with the
    * identical midpoint arithmetic. Portable because this corpus' extents
    * are never exact powers of 0.5 (ln ulp can't cross a floor boundary)
    * and 0.5^k / midpoint halving are exact doubles in both engines.
    */
  /** The 16-stage unrolled XZ quadtree descent as chained CTEs: expects a
    * CTE `s0(event_id, x0, y0, length, xlo, xhi, ylo, yhi, code)` and
    * emits `s1 AS (...), ..., s16 AS (...),` (trailing comma included) —
    * the identical midpoint arithmetic of Geo.xzDescend. Shared by the
    * `geo_xzcode` and `contrib_full` oracles.
    */
  private[operators] val xzStagesSql: String = {
    val stages = new StringBuilder
    for (i <- 0 until 16) {
      val nElem = ((1L << (2 * (16 - i))) - 1L) / 3L
      stages.append(
        s"""s${i + 1} AS (SELECT event_id, x0, y0, length,
           |  CASE WHEN $i < length AND x0 >= xlo + (xhi - xlo) / 2 THEN xlo + (xhi - xlo) / 2 ELSE xlo END AS xlo,
           |  CASE WHEN $i < length AND NOT (x0 >= xlo + (xhi - xlo) / 2) THEN xlo + (xhi - xlo) / 2 ELSE xhi END AS xhi,
           |  CASE WHEN $i < length AND y0 >= ylo + (yhi - ylo) / 2 THEN ylo + (yhi - ylo) / 2 ELSE ylo END AS ylo,
           |  CASE WHEN $i < length AND NOT (y0 >= ylo + (yhi - ylo) / 2) THEN ylo + (yhi - ylo) / 2 ELSE yhi END AS yhi,
           |  CASE WHEN $i < length THEN code
           |    + (CASE WHEN x0 >= xlo + (xhi - xlo) / 2 THEN 1 ELSE 0 END
           |       + CASE WHEN y0 >= ylo + (yhi - ylo) / 2 THEN 2 ELSE 0 END) * $nElem + 1
           |    ELSE code END AS code
           |  FROM s$i),
           |""".stripMargin)
    }
    stages.toString
  }

  private val xzOracleSql: String = {
    val stages = xzStagesSql
    s"""WITH pts AS ($ptsSql),
       |boxes AS (SELECT event_id, lon, lat,
       |    least(lon + (event_id % 1000) / 2000.0, 180.0) AS xmax,
       |    least(lat + (event_id % 1000) / 2000.0, 90.0) AS ymax
       |  FROM pts),
       |nrm AS (SELECT event_id, lon, lat, xmax, ymax,
       |    (180.0 + lon) / 360.0 AS x0, (90.0 + lat) / 360.0 AS y0,
       |    (180.0 + xmax) / 360.0 AS x1, (90.0 + ymax) / 360.0 AS y1
       |  FROM boxes),
       |lvl AS (SELECT *, CASE WHEN l1 >= 16 THEN 16
       |    WHEN x1 <= floor(x0 / pow(0.5, l1 + 1)) * pow(0.5, l1 + 1) + 2 * pow(0.5, l1 + 1)
       |     AND y1 <= floor(y0 / pow(0.5, l1 + 1)) * pow(0.5, l1 + 1) + 2 * pow(0.5, l1 + 1)
       |    THEN l1 + 1 ELSE l1 END AS length
       |  FROM (SELECT *, CASE WHEN greatest(x1 - x0, y1 - y0) <= 0 THEN 16
       |          ELSE CAST(floor(ln(greatest(x1 - x0, y1 - y0)) / ln(0.5)) AS INT) END AS l1
       |        FROM nrm) t),
       |s0 AS (SELECT event_id, x0, y0, length,
       |    0.0 AS xlo, 1.0 AS xhi, 0.0 AS ylo, 1.0 AS yhi, CAST(0 AS BIGINT) AS code
       |  FROM lvl),
       |$stages
       |final AS (SELECT * FROM s16)
       |SELECT b.event_id, b.lon, b.lat, b.xmax, b.ymax,
       |  f.length AS xz_level, f.code AS xz_code
       |FROM final f JOIN boxes b ON b.event_id = f.event_id
       |ORDER BY b.event_id""".stripMargin
  }

  /** DuckDB: little-endian IEEE-754 hex of an integer-valued double
    * column `C` (exact: sign + biased exponent from bit length + shifted
    * mantissa, all in BIGINT/HUGEINT).
    */
  private[operators] def leBitsSql(c: String, out: String): String =
    s"""CASE WHEN $c = 0 THEN '0000000000000000' ELSE
       |  printf('%02x%02x%02x%02x%02x%02x%02x%02x',
       |    CAST(b_$out % 256 AS BIGINT), CAST(b_$out // 256 % 256 AS BIGINT),
       |    CAST(b_$out // 65536 % 256 AS BIGINT), CAST(b_$out // 16777216 % 256 AS BIGINT),
       |    CAST(b_$out // 4294967296 % 256 AS BIGINT), CAST(b_$out // 1099511627776 % 256 AS BIGINT),
       |    CAST(b_$out // 281474976710656 % 256 AS BIGINT), CAST(b_$out // 72057594037927936 % 256 AS BIGINT))
       |END""".stripMargin

  private[operators] def bitsDef(c: String, out: String): String =
    s"""CASE WHEN $c < 0 THEN CAST(9223372036854775808 AS HUGEINT) ELSE CAST(0 AS HUGEINT) END
       |+ CAST((1023 + length(bin(abs($c))) - 1) * 4503599627370496
       |       + (CAST(1 AS BIGINT) << (52 - (length(bin(abs($c))) - 1))) * abs($c)
       |       - 4503599627370496 AS HUGEINT) AS b_$out""".stripMargin

  /** DuckDB replay of geo_poly_join: per-point ray-cast against the 6
    * hexagon edges, unrolled (identical integer crossing test as
    * graft.functions.Geo.pointInPoly). The Spark side's full-cell
    * short-circuit is provably result-identical (see geoPolyJoin doc), so
    * the oracle needs no grid at all — bbox prefilter only for speed.
    */
  private val polyJoinOracleSql: String = {
    val verts = Seq(
      ("n.cx + 2*n.r", "n.cy"), ("n.cx + n.r", "n.cy + 2*n.r"),
      ("n.cx - n.r", "n.cy + 2*n.r"), ("n.cx - 2*n.r", "n.cy"),
      ("n.cx - n.r", "n.cy - 2*n.r"), ("n.cx + n.r", "n.cy - 2*n.r"))
    val crossings = verts.indices.map { i =>
      val (x1, y1) = verts(i)
      val (x2, y2) = verts((i + 1) % verts.length)
      val d = s"(($x2) - ($x1)) * (p.yi - ($y1)) - (p.xi - ($x1)) * (($y2) - ($y1))"
      s"""CASE WHEN (($y1) > p.yi) <> (($y2) > p.yi)
         |       AND (CASE WHEN ($y2) > ($y1) THEN $d > 0 ELSE $d < 0 END)
         |  THEN 1 ELSE 0 END""".stripMargin
    }.mkString(" + ")
    s"""WITH pts AS ($ptsSql),
       |nat AS (SELECT n_name AS country,
       |    (n_nationkey % 5) * 7200 + 3600 AS cx,
       |    (n_nationkey // 5) * 3600 + 1800 AS cy,
       |    401 + 2 * ((n_nationkey * 53) % 199) AS r
       |  FROM nation)
       |SELECT p.event_id, p.xi, p.yi, n.country
       |FROM pts p JOIN nat n
       |  ON p.xi BETWEEN n.cx - 2*n.r AND n.cx + 2*n.r
       | AND p.yi BETWEEN n.cy - 2*n.r AND n.cy + 2*n.r
       |WHERE ($crossings) % 2 = 1
       |ORDER BY p.event_id""".stripMargin
  }

  /** DuckDB replay of geo_geodesic: the identical per-step/per-term
    * arithmetic as graft.functions.Geo.geodesicLengthMm/geodesicAreaM2 —
    * transcendental intermediates snapped to fixed point (mm steps, 1e-9
    * terms, 9-decimal sin/cos) so libm least-bit differences can't cross a
    * rounding boundary, then exact BIGINT sums.
    */
  private val geodesicOracleSql: String = {
    val sf = "pow(1.0 - 1.0/298.257223563, 1.5)"
    s"""WITH pts AS ($ptsSql),
       |seq AS (SELECT user_id, event_id, lon, lat,
       |    lag(lon) OVER w AS plon, lag(lat) OVER w AS plat,
       |    coalesce(lead(lon) OVER w, first_value(lon) OVER wf) AS nlon,
       |    coalesce(lag(lon) OVER w, last_value(lon) OVER wf) AS prlon,
       |    count(*) OVER (PARTITION BY user_id) AS n,
       |    min(lat) OVER (PARTITION BY user_id) AS ymin,
       |    max(lat) OVER (PARTITION BY user_id) AS ymax
       |  FROM pts
       |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id),
       |         wf AS (PARTITION BY user_id ORDER BY event_id
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)),
       |terms AS (SELECT user_id, n, ymin, ymax,
       |    CASE WHEN plat IS NULL THEN 0 ELSE CAST(round(
       |      (sqrt(
       |         ((radians(lon) - radians(plon))
       |            * cos((atan($sf * tan(radians(lat))) + atan($sf * tan(radians(plat)))) / 2))
       |         * ((radians(lon) - radians(plon))
       |            * cos((atan($sf * tan(radians(lat))) + atan($sf * tan(radians(plat)))) / 2))
       |         + (atan($sf * tan(radians(lat))) - atan($sf * tan(radians(plat))))
       |         * (atan($sf * tan(radians(lat))) - atan($sf * tan(radians(plat)))))
       |       * 6371000.0) * 1000.0) AS BIGINT) END AS step_mm,
       |    CAST(round(
       |      radians(nlon - prlon)
       |      * (round(((1.0 - 1.0/298.257223563) * tan(radians(lat))
       |           / sqrt((1.0 - 1.0/298.257223563) * tan(radians(lat))
       |                  * (1.0 - 1.0/298.257223563) * tan(radians(lat)) + 1.0)) * 1000000000.0)
       |         / 1000000000.0)
       |      * 1000000000.0) AS BIGINT) AS term9
       |  FROM seq),
       |agg AS (SELECT user_id, max(n) AS npts, max(ymin) AS ymin, max(ymax) AS ymax,
       |    CAST(sum(step_mm) AS BIGINT) AS length_mm,
       |    CAST(sum(term9) AS BIGINT) AS sum9
       |  FROM terms GROUP BY user_id)
       |SELECT user_id, CAST(npts AS INT) AS npts, length_mm,
       |  CASE WHEN npts < 3 THEN 0 ELSE CAST(round(abs(
       |    (sum9 / 1000000000.0)
       |    * (0.5 * 6378137.0 * 6378137.0
       |       * (1.0 - 1.0/298.257223563
       |          * (round(cos(radians((ymax + ymin) / 2)) * 1000000000.0) / 1000000000.0)
       |          * (round(cos(radians((ymax + ymin) / 2)) * 1000000000.0) / 1000000000.0)))))
       |  AS BIGINT) END AS area_m2
       |FROM agg ORDER BY user_id""".stripMargin
  }

  /** DuckDB replay of geo_wkt_join: per-(point, nation) even-odd ray-cast
    * over ALL rings (L shell + hole always; the disjoint square only for
    * even keys), unrolled edge by edge with the identical integer crossing
    * test as graft.functions.Geo.pointInRings. The Spark side's full-cell
    * short-circuit is provably result-identical (no edge touches a full
    * cell → containment parity is constant across it), so the oracle needs
    * no grid — bbox prefilter only for speed.
    */
  private val wktJoinOracleSql: String = {
    def crossings(verts: Seq[(String, String)], guard: String): String =
      verts.indices.map { i =>
        val (x1, y1) = verts(i)
        val (x2, y2) = verts((i + 1) % verts.length)
        val d = s"(($x2) - ($x1)) * (p.yi - ($y1)) - (p.xi - ($x1)) * (($y2) - ($y1))"
        s"""CASE WHEN $guard(($y1) > p.yi) <> (($y2) > p.yi)
           |       AND (CASE WHEN ($y2) > ($y1) THEN $d > 0 ELSE $d < 0 END)
           |  THEN 1 ELSE 0 END""".stripMargin
      }.mkString(" + ")
    val shell = Seq(
      ("n.cx - 2*n.r", "n.cy - 2*n.r"), ("n.cx + 2*n.r", "n.cy - 2*n.r"),
      ("n.cx + 2*n.r", "n.cy"), ("n.cx", "n.cy"),
      ("n.cx", "n.cy + 2*n.r"), ("n.cx - 2*n.r", "n.cy + 2*n.r"))
    val hole = Seq(
      ("n.cx - n.r", "n.cy - n.r"), ("n.cx - n.r + n.hr", "n.cy - n.r"),
      ("n.cx - n.r + n.hr", "n.cy - n.r + n.hr"), ("n.cx - n.r", "n.cy - n.r + n.hr"))
    val part2 = Seq(
      ("n.cx + n.r", "n.cy + n.r"), ("n.cx + 2*n.r", "n.cy + n.r"),
      ("n.cx + 2*n.r", "n.cy + 2*n.r"), ("n.cx + n.r", "n.cy + 2*n.r"))
    val total = crossings(shell, "") + " + " + crossings(hole, "") +
      " + " + crossings(part2, "n.nk % 2 = 0 AND ")
    s"""WITH pts AS ($ptsSql),
       |nat AS (SELECT n_name AS country, n_nationkey AS nk,
       |    (n_nationkey % 5) * 7200 + 3600 AS cx,
       |    (n_nationkey // 5) * 3600 + 1800 AS cy,
       |    400 + 2 * ((n_nationkey * 53) % 199) AS r,
       |    (400 + 2 * ((n_nationkey * 53) % 199)) // 2 AS hr
       |  FROM nation)
       |SELECT p.event_id, p.xi, p.yi, n.country
       |FROM pts p JOIN nat n
       |  ON p.xi BETWEEN n.cx - 2*n.r AND n.cx + 2*n.r
       | AND p.yi BETWEEN n.cy - 2*n.r AND n.cy + 2*n.r
       |WHERE ($total) % 2 = 1
       |ORDER BY p.event_id, n.country""".stripMargin
  }

  /** DuckDB replay of geo_ring_valid: identical orientation tests in exact
    * BIGINT arithmetic over the integer centi-degree ring (edge k joins
    * vertex k → k mod n + 1; non-adjacent pairs = k2 ≥ k1+2 minus the
    * (1, n) wrap pair, matching the kernel's index skip).
    */
  /** DuckDB replay of geo_way_area. The tag algebra simplifies in the
    * oracle: with at most two tags {k:v} ∪ {area:"no"}, isArea reduces to
    * `closed AND NOT area_no AND rule(k, v)` — the `area=no` short-circuit
    * subsumes every case where the override tag exists (including k="area"
    * itself, whose value the override replaces), and an `area=no` tag
    * matching the `area;all` ruleset row is always vetoed by that same
    * short-circuit, so it never widens the match.
    */
  private val wayAreaOracleSql: String = {
    val keyList = graft.functions.PolygonFeatures.rules
      .map(r => s"'${r._1}'").mkString(", ")
    val valList = WayAreaVals.map(v => s"'$v'").mkString(", ")
    val ruleCase = graft.functions.PolygonFeatures.rules.collect {
      case (k, "whitelist", vs) =>
        s"WHEN '$k' THEN v IN (${vs.map(v => s"'$v'").mkString(", ")})"
      case (k, "blacklist", vs) =>
        s"WHEN '$k' THEN v NOT IN (${vs.map(v => s"'$v'").mkString(", ")})"
    }.mkString("\n    ")
    s"""WITH w AS (
       |  SELECT [$keyList][CAST(event_id % 27 AS INT) + 1] AS k,
       |         [$valList][CAST(event_id % 16 AS INT) + 1] AS v,
       |         (event_id % 3) <> 0 AS closed,
       |         (event_id % 11) = 0 AS area_no
       |  FROM events)
       |SELECT k AS tag_key, count(*) AS n_ways,
       |  CAST(sum(CASE WHEN closed THEN 1 ELSE 0 END) AS BIGINT) AS n_closed,
       |  CAST(sum(CASE WHEN closed AND NOT area_no AND (CASE k
       |    $ruleCase
       |    ELSE TRUE END) THEN 1 ELSE 0 END) AS BIGINT) AS n_area
       |FROM w GROUP BY 1 ORDER BY 1""".stripMargin
  }

  private val ringValidOracleSql: String = {
    def orient(px: String, py: String) =
      s"(e1.bx - e1.ax) * ($py - e1.ay) - (e1.b_y - e1.ay) * ($px - e1.ax)"
    def orient2(px: String, py: String) =
      s"(e2.bx - e2.ax) * ($py - e2.ay) - (e2.b_y - e2.ay) * ($px - e2.ax)"
    def onSeg1(px: String, py: String) =
      s"least(e1.ax, e1.bx) <= $px AND $px <= greatest(e1.ax, e1.bx) AND " +
        s"least(e1.ay, e1.b_y) <= $py AND $py <= greatest(e1.ay, e1.b_y)"
    def onSeg2(px: String, py: String) =
      s"least(e2.ax, e2.bx) <= $px AND $px <= greatest(e2.ax, e2.bx) AND " +
        s"least(e2.ay, e2.b_y) <= $py AND $py <= greatest(e2.ay, e2.b_y)"
    val d1 = orient("e2.ax", "e2.ay")
    val d2 = orient("e2.bx", "e2.b_y")
    val d3 = orient2("e1.ax", "e1.ay")
    val d4 = orient2("e1.bx", "e1.b_y")
    s"""WITH pts AS ($ptsSql),
       |ring AS (SELECT user_id, xi, yi,
       |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS k,
       |    count(*) OVER (PARTITION BY user_id) AS n
       |  FROM pts),
       |edges AS (SELECT a.user_id, a.k, a.n,
       |    a.xi AS ax, a.yi AS ay, b.xi AS bx, b.yi AS b_y
       |  FROM ring a JOIN ring b ON b.user_id = a.user_id AND b.k = a.k % a.n + 1),
       |dup AS (SELECT DISTINCT user_id FROM (
       |    SELECT user_id FROM ring GROUP BY user_id, xi, yi HAVING count(*) > 1) t),
       |dup3 AS (SELECT DISTINCT user_id FROM (
       |    SELECT user_id FROM ring WHERE k <= 3
       |    GROUP BY user_id, xi, yi HAVING count(*) > 1) t),
       |hits AS (SELECT e1.user_id, count(*) AS n_bad
       |  FROM edges e1 JOIN edges e2 ON e2.user_id = e1.user_id
       |    AND e2.k >= e1.k + 2 AND NOT (e1.k = 1 AND e2.k = e1.n)
       |  WHERE (((($d1) > 0) <> (($d2) > 0)) AND ((($d3) > 0) <> (($d4) > 0))
       |         AND ($d1) <> 0 AND ($d2) <> 0 AND ($d3) <> 0 AND ($d4) <> 0)
       |     OR (($d1) = 0 AND ${onSeg1("e2.ax", "e2.ay")})
       |     OR (($d2) = 0 AND ${onSeg1("e2.bx", "e2.b_y")})
       |     OR (($d3) = 0 AND ${onSeg2("e1.ax", "e1.ay")})
       |     OR (($d4) = 0 AND ${onSeg2("e1.bx", "e1.b_y")})
       |  GROUP BY e1.user_id),
       |base AS (SELECT user_id, max(n) AS npts FROM ring GROUP BY user_id)
       |SELECT b.user_id, CAST(b.npts AS INT) AS npts,
       |  (b.npts < 3 OR d.user_id IS NOT NULL OR coalesce(h.n_bad, 0) > 0) AS self_intersects,
       |  CAST(coalesce(h.n_bad, 0) AS INT) AS n_bad_pairs,
       |  NOT (b.npts < 3 OR d.user_id IS NOT NULL OR coalesce(h.n_bad, 0) > 0) AS valid,
       |  NOT (b.npts < 3 OR d3.user_id IS NOT NULL) AS tri_valid
       |FROM base b
       |LEFT JOIN dup d ON d.user_id = b.user_id
       |LEFT JOIN dup3 d3 ON d3.user_id = b.user_id
       |LEFT JOIN hits h ON h.user_id = b.user_id
       |ORDER BY b.user_id""".stripMargin
  }

  /** One DP level for the `geo_simplify` oracle: per live segment, the
    * interior argmax (exact — within a segment the denominator |AB|² is
    * constant, so `ORDER BY num DESC, idx` needs no ratio) and the split
    * test `num > ε²·den`; split children that can still hold an interior
    * point carry to the next level.
    */
  private def dpLevelSql(k: Int): String = {
    val e2 = graft.functions.Geo.DpEps * graft.functions.Geo.DpEps
    s"""b$k AS MATERIALIZED (
       |  SELECT u, i, j, k, num, den FROM (
       |    SELECT s.u, s.i, s.j, p.idx AS k,
       |      CASE WHEN (b.x-a.x)*(b.x-a.x)+(b.y-a.y)*(b.y-a.y) = 0
       |           THEN (p.x-a.x)*(p.x-a.x)+(p.y-a.y)*(p.y-a.y)
       |           ELSE ((b.x-a.x)*(a.y-p.y) - (a.x-p.x)*(b.y-a.y))
       |              * ((b.x-a.x)*(a.y-p.y) - (a.x-p.x)*(b.y-a.y)) END AS num,
       |      CASE WHEN (b.x-a.x)*(b.x-a.x)+(b.y-a.y)*(b.y-a.y) = 0 THEN 1
       |           ELSE (b.x-a.x)*(b.x-a.x)+(b.y-a.y)*(b.y-a.y) END AS den,
       |      row_number() OVER (PARTITION BY s.u, s.i, s.j ORDER BY
       |        CASE WHEN (b.x-a.x)*(b.x-a.x)+(b.y-a.y)*(b.y-a.y) = 0
       |             THEN (p.x-a.x)*(p.x-a.x)+(p.y-a.y)*(p.y-a.y)
       |             ELSE ((b.x-a.x)*(a.y-p.y) - (a.x-p.x)*(b.y-a.y))
       |                * ((b.x-a.x)*(a.y-p.y) - (a.x-p.x)*(b.y-a.y)) END DESC,
       |        p.idx) AS rn
       |    FROM s${k - 1} s
       |    JOIN dpp a ON a.u = s.u AND a.idx = s.i
       |    JOIN dpp b ON b.u = s.u AND b.idx = s.j
       |    JOIN dpp p ON p.u = s.u AND p.idx > s.i AND p.idx < s.j) t
       |  WHERE rn = 1),
       |s$k AS MATERIALIZED (
       |  SELECT u, i, j FROM (
       |    SELECT u, i, k AS j FROM b$k WHERE num > $e2 * den
       |    UNION ALL
       |    SELECT u, k AS i, j FROM b$k WHERE num > $e2 * den) t
       |  WHERE j - i >= 2)""".stripMargin
  }

  private val geoSimplifySql: String = {
    val d = graft.functions.Geo.DpDepth
    val e2 = graft.functions.Geo.DpEps * graft.functions.Geo.DpEps
    s"""WITH p0 AS ($ptsSql),
       |dpp AS MATERIALIZED (
       |  SELECT user_id u,
       |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS idx,
       |         xi AS x, yi AS y
       |  FROM p0),
       |ends AS (SELECT u, 0 AS i, max(idx) AS j FROM dpp GROUP BY 1),
       |s0 AS MATERIALIZED (SELECT u, i, j FROM ends WHERE j >= 2),
       |${(1 to d).map(dpLevelSql).mkString(",\n")},
       |kept AS (
       |  SELECT u, 0 AS idx FROM ends
       |  UNION SELECT u, j FROM ends
       |  ${(1 to d).map(k => s"UNION SELECT u, k FROM b$k WHERE num > $e2 * den").mkString("\n  ")}
       |),
       |np AS (SELECT u, count(*) AS n FROM dpp GROUP BY 1)
       |SELECT p.u AS user_id, CAST(any_value(np.n) AS BIGINT) AS n_points,
       |  count(*) AS n_kept, CAST(sum(p.idx) AS BIGINT) AS idx_sum,
       |  CAST(sum(p.x) AS BIGINT) AS x_sum, CAST(sum(p.y) AS BIGINT) AS y_sum
       |FROM kept k JOIN dpp p ON p.u = k.u AND p.idx = k.idx
       |JOIN np ON np.u = p.u
       |GROUP BY 1 ORDER BY user_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "geo_antimeridian" ->
      s"""WITH p AS ($ptsSql),
         |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS npts,
         |    list_sort(list_distinct(list(xi))) AS ls
         |  FROM p GROUP BY 1),
         |c AS (SELECT user_id, npts,
         |    CAST(len(ls) AS BIGINT) AS n_lons,
         |    CAST(ls[-1] - ls[1] AS BIGINT) AS span_raw_cd,
         |    CASE WHEN len(ls) = 1 THEN CAST(36000 AS BIGINT)
         |         ELSE greatest(
         |           CAST(list_max(list_transform(range(2, len(ls) + 1),
         |             i -> ls[i] - ls[i - 1])) AS BIGINT),
         |           36000 - CAST(ls[-1] - ls[1] AS BIGINT)) END AS gmax
         |  FROM g)
         |SELECT user_id, npts, n_lons, span_raw_cd,
         |  CAST(36000 - gmax AS BIGINT) AS arc_cd,
         |  span_raw_cd > 18000 AND 36000 - gmax <= 18000 AS wraps
         |FROM c ORDER BY user_id""".stripMargin,
    "geo_grid_audit" ->
      s"""WITH p AS ($ptsSql),
         |c AS (SELECT (yi // 100) * 360 + (xi // 100) AS cell,
         |    CAST(count(*) AS BIGINT) AS np FROM p GROUP BY 1),
         |b AS (SELECT CASE WHEN np = 1 THEN 'a_1' WHEN np <= 3 THEN 'b_2_3'
         |         WHEN np <= 7 THEN 'c_4_7' WHEN np <= 15 THEN 'd_8_15'
         |         ELSE 'e_16p' END AS bucket, np FROM c),
         |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_cells,
         |    CAST(sum(np) AS BIGINT) AS n_points,
         |    CAST(max(np) AS BIGINT) AS max_in_bucket
         |  FROM b GROUP BY 1)
         |SELECT bucket, n_cells, n_points, max_in_bucket,
         |  CAST((1000 * n_cells) // (sum(n_cells) OVER ()) AS BIGINT)
         |    AS cell_share_pm,
         |  CAST((1000 * n_points) // (sum(n_points) OVER ()) AS BIGINT)
         |    AS point_share_pm
         |FROM g ORDER BY bucket""".stripMargin,
    "geo_orientation" ->
      s"""WITH pts AS ($ptsSql),
         |seg AS (SELECT xi - lag(xi) OVER w AS dx, yi - lag(yi) OVER w AS dy
         |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
         |oc AS (SELECT CAST(CASE
         |    WHEN dx >= 0 AND dy >= 0 AND abs(dx) >= abs(dy) THEN 0
         |    WHEN dx >= 0 AND dy >= 0 THEN 1
         |    WHEN dx < 0 AND dy >= 0 AND abs(dy) >= abs(dx) THEN 2
         |    WHEN dx < 0 AND dy >= 0 THEN 3
         |    WHEN dx < 0 AND dy < 0 AND abs(dx) >= abs(dy) THEN 4
         |    WHEN dx < 0 AND dy < 0 THEN 5
         |    WHEN dx >= 0 AND dy < 0 AND abs(dy) >= abs(dx) THEN 6
         |    ELSE 7 END AS BIGINT) AS octant,
         |    dx * dx + dy * dy AS len2
         |  FROM seg WHERE dx IS NOT NULL AND (dx <> 0 OR dy <> 0)),
         |g AS (SELECT octant, count(*) AS n_segs,
         |    CAST(sum(len2) AS BIGINT) AS len2_sum,
         |    CAST(max(len2) AS BIGINT) AS len2_max
         |  FROM oc GROUP BY 1)
         |SELECT octant, n_segs, len2_sum, len2_max,
         |  CAST((1000 * n_segs) // (sum(n_segs) OVER ()) AS BIGINT) AS share_pm
         |FROM g ORDER BY octant""".stripMargin,
    "geo_simplify" -> geoSimplifySql,
    "geo_knn" ->
      s"""WITH pts AS ($ptsSql),
         |edge AS (SELECT coalesce(max(v), ${KnnEdges.last}) AS e
         |  FROM (VALUES ${KnnEdges.map(e => s"($e)").mkString(",")}) t(v)
         |  WHERE (SELECT count(*) FROM pts)
         |        <= $KnnOccupancy * ((36000 // v) * (18000 // v))),
         |p AS (SELECT event_id, xi, yi,
         |    xi // e AS cx, yi // e AS cy FROM pts, edge),
         |q AS (SELECT event_id AS q_id, xi AS qx, yi AS qy,
         |    cx + dx.range AS cx, cy + dy.range AS cy
         |  FROM p, range(-1, 2) dx, range(-1, 2) dy
         |  WHERE event_id % 1009 = 0),
         |cand AS (SELECT q.q_id, p.event_id AS n_id,
         |    (p.xi - q.qx) * (p.xi - q.qx)
         |      + (p.yi - q.qy) * (p.yi - q.qy) AS d2
         |  FROM q JOIN p ON p.cx = q.cx AND p.cy = q.cy
         |  WHERE p.event_id <> q.q_id),
         |ranked AS (SELECT q_id, n_id, d2,
         |    row_number() OVER (PARTITION BY q_id ORDER BY d2, n_id) AS rnk
         |  FROM cand)
         |SELECT q_id, n_id, CAST(rnk AS INT) AS rnk, CAST(d2 AS BIGINT) AS d2
         |FROM ranked WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin,
    "geo_spikes" ->
      s"""WITH pts AS ($ptsSql),
         |grid AS (
         |  SELECT user_id, event_id, xi // 6000 AS bx, yi // 6000 AS by
         |  FROM pts
         |), tri AS (
         |  SELECT user_id,
         |    lag(bx)  OVER (PARTITION BY user_id ORDER BY event_id) AS ax,
         |    lag(by)  OVER (PARTITION BY user_id ORDER BY event_id) AS ay,
         |    bx, by,
         |    lead(bx) OVER (PARTITION BY user_id ORDER BY event_id) AS cx,
         |    lead(by) OVER (PARTITION BY user_id ORDER BY event_id) AS cy
         |  FROM grid
         |)
         |SELECT user_id, count(*) AS n_vertices,
         |  CAST(sum(CASE WHEN ax IS NOT NULL AND cx IS NOT NULL
         |    AND (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) = 0
         |    AND ((cx BETWEEN least(ax, bx) AND greatest(ax, bx)
         |          AND cy BETWEEN least(ay, by) AND greatest(ay, by))
         |      OR (ax BETWEEN least(bx, cx) AND greatest(bx, cx)
         |          AND ay BETWEEN least(by, cy) AND greatest(by, cy)))
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_spikes
         |FROM tri GROUP BY user_id ORDER BY user_id""".stripMargin,
    "geo_ring_valid" -> ringValidOracleSql,
    "geo_way_area" -> wayAreaOracleSql,
    "geo_dbscan_core" ->
      s"""WITH pts AS ($ptsSql),
         |l AS (SELECT event_id, xi, yi, xi // 400 AS cx, yi // 400 AS cy FROM pts),
         |n AS (SELECT xi AS nxi, yi AS nyi,
         |    xi // 400 + dxy.dx AS cx, yi // 400 + dxy2.dy AS cy
         |  FROM pts,
         |    (SELECT unnest([-1, 0, 1]) AS dx) dxy,
         |    (SELECT unnest([-1, 0, 1]) AS dy) dxy2),
         |cnt AS (SELECT l.event_id, count(*) - 1 AS n_nbr
         |  FROM l JOIN n USING (cx, cy)
         |  WHERE (n.nxi - l.xi) * (n.nxi - l.xi)
         |      + (n.nyi - l.yi) * (n.nyi - l.yi) <= 160000
         |  GROUP BY 1)
         |SELECT is_core, bucket, count(*) AS n_points,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum
         |FROM (SELECT event_id,
         |    CAST(CASE WHEN n_nbr >= 3 THEN 1 ELSE 0 END AS BIGINT) AS is_core,
         |    CAST(CASE WHEN n_nbr = 0 THEN 0
         |         ELSE length(bin(n_nbr)) END AS BIGINT) AS bucket
         |  FROM cnt) t
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "geo_tile_pyramid" ->
      s"""WITH pts AS ($ptsSql)
         |SELECT z, (xi * (1 << z)) // 36000 AS tx, (yi * (1 << z)) // 18000 AS ty,
         |  count(*) AS n_points,
         |  count(DISTINCT user_id) AS n_entities,
         |  CAST(sum(event_id) AS BIGINT) AS id_sum
         |FROM pts, (SELECT unnest([2, 3, 4, 5, 6]) AS z) zs
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "geo_wkt_join" -> wktJoinOracleSql,
    "geo_poly_join" -> polyJoinOracleSql,
    "geo_geodesic" -> geodesicOracleSql,
    "geo_xzcode" -> xzOracleSql,
    "geo_hotspot" ->
      s"""WITH pts AS ($ptsSql),
         |cells AS MATERIALIZED (
         |  SELECT xi // 100 AS cx, yi // 100 AS cy, count(*) AS n
         |  FROM pts GROUP BY 1, 2),
         |nn AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
         |credits AS (
         |  SELECT cx + dx AS tx, cy + dy AS ty, n
         |  FROM cells,
         |    LATERAL (SELECT unnest(range(-1, 2)) AS dx) a,
         |    LATERAL (SELECT unnest(range(-1, 2)) AS dy) b
         |  WHERE cx + dx BETWEEN 0 AND 359 AND cy + dy BETWEEN 0 AND 179),
         |nb AS (SELECT tx, ty, CAST(sum(n) AS BIGINT) AS nb_sum
         |  FROM credits GROUP BY 1, 2)
         |SELECT CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
         |  c.n, nb.nb_sum,
         |  CAST((CASE WHEN cx IN (0, 359) THEN 2 ELSE 3 END)
         |    * (CASE WHEN cy IN (0, 179) THEN 2 ELSE 3 END) AS BIGINT) AS nb_cnt,
         |  (1000 * 64800 * nb.nb_sum)
         |    // ((SELECT nn FROM nn) * ((CASE WHEN cx IN (0, 359) THEN 2 ELSE 3 END)
         |       * (CASE WHEN cy IN (0, 179) THEN 2 ELSE 3 END))) AS dens_pm
         |FROM cells c JOIN nb ON nb.tx = c.cx AND nb.ty = c.cy
         |ORDER BY nb_sum DESC, cx, cy LIMIT 25""".stripMargin,
    "geo_bbox" ->
      s"""WITH pts AS ($ptsSql)
         |SELECT user_id, min(lon) AS xmin, min(lat) AS ymin,
         |       max(lon) AS xmax, max(lat) AS ymax
         |FROM pts GROUP BY user_id ORDER BY user_id""".stripMargin,
    "geo_centroid" ->
      s"""WITH pts AS ($ptsSql)
         |SELECT user_id,
         |       CAST(sum(xi) AS DOUBLE) / count(*) / 100.0 - 180.0 AS cx,
         |       CAST(sum(yi) AS DOUBLE) / count(*) / 100.0 - 90.0 AS cy,
         |       count(*) AS npts
         |FROM pts GROUP BY user_id ORDER BY user_id""".stripMargin,
    "geo_length" ->
      s"""WITH pts AS ($ptsSql),
         |lagged AS (SELECT *, lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
         |           FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
         |stepped AS (SELECT event_id, user_id,
         |    CASE WHEN plon IS NULL THEN 0
         |         ELSE CAST(round($stepSql * 1000) AS BIGINT) END AS step3
         |  FROM lagged)
         |SELECT event_id, user_id, step3 AS step_mm,
         |       CAST(sum(step3) OVER (PARTITION BY user_id ORDER BY event_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_mm
         |FROM stepped ORDER BY event_id""".stripMargin,
    "geo_area" ->
      s"""WITH pts AS ($ptsSql),
         |lagged AS (SELECT *,
         |    coalesce(lag(xi) OVER w * yi - xi * lag(yi) OVER w, 0) AS cross_t,
         |    first_value(xi) OVER w AS x1, first_value(yi) OVER w AS y1
         |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
         |areas AS (SELECT event_id, user_id,
         |    abs(sum(cross_t) OVER (PARTITION BY user_id ORDER BY event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        + (xi * y1 - x1 * yi)) AS a2
         |  FROM lagged)
         |SELECT event_id, user_id, a2 / 20000.0 AS area_deg2,
         |       (a2 - coalesce(lag(a2) OVER (PARTITION BY user_id ORDER BY event_id), 0)) / 20000.0 AS area_delta
         |FROM areas ORDER BY event_id""".stripMargin,
    "geo_geohash" -> geohashOracleSql,
    "geo_wkb" ->
      s"""WITH pts AS (SELECT event_id,
         |    (event_id * 31) % 360 - 180 AS lx, (event_id * 17) % 180 - 90 AS ly
         |  FROM events),
         |bits AS (SELECT event_id, lx, ly, ${bitsDef("lx", "x")}, ${bitsDef("ly", "y")} FROM pts)
         |SELECT event_id, CAST(lx AS DOUBLE) AS lon_d, CAST(ly AS DOUBLE) AS lat_d,
         |       '0101000000' || ${leBitsSql("lx", "x")} || ${leBitsSql("ly", "y")} AS wkb
         |FROM bits ORDER BY event_id""".stripMargin,
    "geo_country_join" ->
      s"""WITH pts AS ($ptsSql),
         |bounds AS (SELECT n_name AS country,
         |    CAST((n_nationkey % 5) * 72 - 180 AS DOUBLE) AS lon_min,
         |    CAST((n_nationkey // 5) * 36 - 90 AS DOUBLE) AS lat_min
         |  FROM nation)
         |SELECT event_id, lon, lat, country
         |FROM pts JOIN bounds
         |  ON lon >= lon_min AND lon < lon_min + 72
         | AND lat >= lat_min AND lat < lat_min + 36
         |ORDER BY event_id""".stripMargin)
}
