package graft.operators

import graft.functions.GeoFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Way-geometry assembly — the osm-geometry core: build each way's line
  * geometry from its member nodes' coordinates.
  *
  * The reference resolves member nodes through an in-memory/RocksDB lookup
  * while streaming ways (single-node). Spark-first, the same operation is:
  * explode `refs` with position → shuffle join on node id → ordered
  * re-collect per way → WKB linestring (custom codegen expression) +
  * derived attributes (n_points, bbox, haversine length).
  *
  * Scale: the node side is the big one (~90% of OSM) — the join shuffles
  * both sides hash-partitioned by node id (sort-merge at scale, AQE can
  * pick broadcast for small extracts), and the re-collect groups by way id.
  * These are the two unavoidable data movements of way assembly; everything
  * downstream (encoding, attributes) is map-side expression work.
  */
object WayGeometry {

  /** @param nodes (id, lat, lon) — node coordinates
    * @param ways  (id, refs)     — way member node-id lists
    */
  def assemble(nodes: DataFrame, ways: DataFrame): DataFrame = {
    GeoFunctions.register(nodes.sparkSession)
    val memberRefs = ways
      .select(col("id").as("way_id"), posexplode(col("refs")).as(Seq("pos", "ref")))
    val coords = nodes.select(col("id").as("ref"), col("lat"), col("lon"))
    memberRefs.join(coords, Seq("ref"))
      .groupBy("way_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("lon"), col("lat"))))
        .as("pts"))
      .select(col("way_id"),
        expr("transform(pts, p -> p.lon)").as("lons"),
        expr("transform(pts, p -> p.lat)").as("lats"))
      .withColumn("n_points", size(col("lons")))
      .withColumn("wkb", call_function("wkb_line", col("lons"), col("lats")))
      .withColumn("xmin", array_min(col("lons")))
      .withColumn("ymin", array_min(col("lats")))
      .withColumn("xmax", array_max(col("lons")))
      .withColumn("ymax", array_max(col("lats")))
      .withColumn("length_m", expr(
        """CASE WHEN n_points < 2 THEN CAST(0.0 AS DOUBLE) ELSE
          |aggregate(sequence(1, n_points - 1), CAST(0.0 AS DOUBLE), (acc, i) ->
          |  acc + round(2 * 6371000.0 * asin(sqrt(
          |    sin(radians(lats[i] - lats[i-1]) / 2) * sin(radians(lats[i] - lats[i-1]) / 2) +
          |    cos(radians(lats[i-1])) * cos(radians(lats[i])) *
          |    sin(radians(lons[i] - lons[i-1]) / 2) * sin(radians(lons[i] - lons[i-1]) / 2))), 4))
          |END""".stripMargin))
      .drop("lons", "lats")
  }
}
