package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The osm-polygon-features ruleset — decides whether a CLOSED way is an
  * area (Polygon) or a linear feature that merely returns to its start
  * (LineString). This is the reference's way-classification step
  * (ohsome-contributions ContributionGeometry.java:20-48 `polygonFeatures`
  * loaded from polygon_features.csv, applied by `isArea`:163-172): a way
  * is an area iff
  *
  *   1. `area=no` is NOT set (case-insensitive short-circuit, :165),
  *   2. it has > 2 member refs and the first and last ref are the same
  *      node (:169-170), and
  *   3. ANY present tag matches a ruleset row (:171) — `all` rows match
  *      any value, `whitelist` rows only the listed values, `blacklist`
  *      rows any value except the listed ones.
  *
  * The ruleset itself is the public osm-polygon-features convention (the
  * CSV rows mirrored here verbatim — the table IS the spec, like the
  * hashtag regex). Everything compiles to plain boolean Columns over the
  * tag map: codegen-friendly, no UDF, usable in any scan.
  */
object PolygonFeatures {

  /** (key, mode, values) rows of polygon_features.csv (reference resource,
    * keys/values lowercased at load like ContributionGeometry's static
    * init).
    */
  val rules: Seq[(String, String, Seq[String])] = Seq(
    ("building", "all", Nil),
    ("highway", "whitelist", Seq("services", "rest_area", "escape", "elevator")),
    ("natural", "blacklist", Seq("coastline", "cliff", "ridge", "arete", "tree_row")),
    ("landuse", "all", Nil),
    ("waterway", "whitelist", Seq("riverbank", "dock", "boatyard", "dam")),
    ("amenity", "all", Nil),
    ("leisure", "all", Nil),
    ("barrier", "whitelist", Seq("city_wall", "ditch", "hedge", "retaining_wall", "wall", "spikes")),
    ("railway", "whitelist", Seq("station", "turntable", "roundhouse", "platform")),
    ("area", "all", Nil),
    ("boundary", "all", Nil),
    ("man_made", "blacklist", Seq("cutline", "embankment", "pipeline")),
    ("power", "whitelist", Seq("plant", "substation", "generator", "transformer")),
    ("place", "all", Nil),
    ("shop", "all", Nil),
    ("aeroway", "blacklist", Seq("taxiway")),
    ("tourism", "all", Nil),
    ("historic", "all", Nil),
    ("public_transport", "all", Nil),
    ("office", "all", Nil),
    ("building:part", "all", Nil),
    ("military", "all", Nil),
    ("ruins", "all", Nil),
    ("area:highway", "all", Nil),
    ("craft", "all", Nil),
    ("golf", "all", Nil),
    ("indoor", "all", Nil))

  /** ANY present tag matches a ruleset row (`isPolygonFeature` anyMatch).
    * `false && null` folds to false, so absent keys short-circuit without
    * an explicit coalesce.
    */
  def matchesPolygonFeature(tags: Column): Column =
    rules.map { case (k, mode, vs) =>
      val has = map_contains_key(tags, lit(k))
      mode match {
        case "all"       => has
        case "whitelist" => has && element_at(tags, lit(k)).isin(vs.map(v => v: Any): _*)
        case "blacklist" => has && !element_at(tags, lit(k)).isin(vs.map(v => v: Any): _*)
      }
    }.reduce(_ || _)

  /** The full `isArea` contract over a tag map and the way's ref list. */
  def isArea(tags: Column, refs: Column): Column =
    lower(coalesce(element_at(tags, lit("area")), lit(""))) =!= "no" &&
      size(refs) > 2 &&
      element_at(refs, lit(1)) === element_at(refs, size(refs)) &&
      matchesPolygonFeature(tags)
}
