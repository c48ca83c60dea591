package graft

import graft.functions.GeoFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only stage-by-stage timer for contrib_full — not part of the
  * shipped surface; deleted once the round-6 perf pass lands.
  */
object ProfileScratch {
  def time(name: String)(f: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    f.write.mode("overwrite").format("noop").save()
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GeoFunctions.register(spark)
    import Contrib6._

    // warmup
    Tables.events(spark, dir).write.mode("overwrite").format("noop").save()
    val byEntity = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val entityAll = Window.partitionBy("user_id")
    val cumFrame = byEntity.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    def base = Tables.events(spark, dir).withColumn("ts_us", expr("ts div 1000"))

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      time("scan")(base)
      time("versions+cs windows")(stageVersions(base, byEntity, entityAll))
      time("+geom point cols")(stageGeomCols(stageVersions(base, byEntity, entityAll)))
      time("+window geo aggs")(stageWindowGeo(stageGeomCols(stageVersions(base, byEntity, entityAll)), byEntity, cumFrame))
      time("+step/area terms")(stageTerms(stageWindowGeo(stageGeomCols(stageVersions(base, byEntity, entityAll)), byEntity, cumFrame), byEntity, cumFrame))
      time("+decimal tail")(stageTail(stageTerms(stageWindowGeo(stageGeomCols(stageVersions(base, byEntity, entityAll)), byEntity, cumFrame), byEntity, cumFrame), byEntity))
      time("+cs struct windows")(stageCs(stageTail(stageTerms(stageWindowGeo(stageGeomCols(stageVersions(base, byEntity, entityAll)), byEntity, cumFrame), byEntity, cumFrame), byEntity)))
      time("full contribFull")(graft.operators.Contributions.contribFull(spark, dir))
    }
    spark.stop()
  }
}

/** Staged copies of the contrib_full column groups (kept verbatim from
  * Contributions.scala so timings attribute honestly).
  */
object Contrib6 {
  import graft.operators.{Changesets, Contributions}

  def stageVersions(e: DataFrame, byEntity: org.apache.spark.sql.expressions.WindowSpec,
      entityAll: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
    e.withColumn("gap_flag",
        when(col("ts_us") - lag("ts_us", 1).over(byEntity) > Changesets.GapUs ||
          lag("ts_us", 1).over(byEntity).isNull, 1).otherwise(0))
      .withColumn("cs_seq", sum("gap_flag").over(
        byEntity.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("osm_version", row_number().over(byEntity))
      .withColumn("valid_from", col("ts_us"))
      .withColumn("valid_to", lead("ts_us", 1).over(byEntity))
      .withColumn("visible", col("event_type") =!= "error")
      .withColumn("prev_visible", lag("visible", 1).over(byEntity))
      .withColumn("prev_props", lag("props", 1).over(byEntity))
      .withColumn("prev_value", lag("value", 1).over(byEntity))
      .withColumn("contrib_type",
        when(!col("visible"), "DELETION")
          .when(col("prev_visible").isNull || !col("prev_visible"), "CREATION")
          .otherwise(concat_ws("_",
            when(col("props") =!= col("prev_props"), "TAG"),
            when(col("value") =!= col("prev_value"), "GEOMETRY"))))
      .withColumn("osm_edits", count(lit(1)).over(entityAll))
      .withColumn("osm_last_edit", max("ts_us").over(entityAll))

  def stageGeomCols(df: DataFrame): DataFrame =
    df.withColumn("lon_i", (col("event_id") * 31) % 360 - 180)
      .withColumn("lat_i", (col("event_id") * 17) % 180 - 90)
      .withColumn("wkb", call_function("wkb_point",
        col("lon_i").cast("double"), col("lat_i").cast("double")))
      .withColumn("cell", expr("((lat_i + 90) div 36) * 5 + ((lon_i + 180) div 72)"))
      .withColumn("lon_d", col("lon_i").cast("double"))
      .withColumn("lat_d", col("lat_i").cast("double"))

  def stageWindowGeo(df: DataFrame, byEntity: org.apache.spark.sql.expressions.WindowSpec,
      cumFrame: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
    df.withColumn("plon", lag("lon_d", 1).over(byEntity))
      .withColumn("plat", lag("lat_d", 1).over(byEntity))
      .withColumn("lag2_lon", lag("lon_d", 2).over(byEntity))
      .withColumn("first_lon", first("lon_d").over(cumFrame))
      .withColumn("first_lat", first("lat_d").over(cumFrame))
      .withColumn("nth2_lon", nth_value(col("lon_d"), 2).over(cumFrame))
      .withColumn("ymin_c", min("lat_d").over(cumFrame))
      .withColumn("ymax_c", max("lat_d").over(cumFrame))
      .withColumn("bbox_xmin", min("lon_i").over(cumFrame))
      .withColumn("bbox_ymin", min("lat_i").over(cumFrame))
      .withColumn("bbox_xmax", max("lon_i").over(cumFrame))
      .withColumn("bbox_ymax", max("lat_i").over(cumFrame))
      .withColumn("xz_code", call_function("xz_code_i",
        col("bbox_xmin"), col("bbox_ymin"), col("bbox_xmax"), col("bbox_ymax")))
      .withColumn("centroid_x", sum("lon_i").over(cumFrame).cast("double") / col("osm_version"))
      .withColumn("centroid_y", sum("lat_i").over(cumFrame).cast("double") / col("osm_version"))

  def stageTerms(df: DataFrame, byEntity: org.apache.spark.sql.expressions.WindowSpec,
      cumFrame: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
    df.withColumn("step_mm", expr(Contributions.stepMmSql))
      .withColumn("length_mm", sum("step_mm").over(cumFrame))
      .withColumn("u9", expr(Contributions.u9Sql))
      .withColumn("interior9", sum("u9").over(cumFrame))
      .withColumn("b0_9", expr(Contributions.b09Sql))
      .withColumn("bk_9", expr(Contributions.bk9Sql))

  def stageCs(df: DataFrame): DataFrame = {
    val byCs = Window.partitionBy("user_id", "cs_seq")
    df.withColumn("cs_created_at", min("ts_us").over(byCs))
      .withColumn("cs_closed_at", max("ts_us").over(byCs))
      .withColumn("cs_num_changes", count(lit(1)).over(byCs))
      .withColumn("cs_editor", concat(lit("editor/"), col("user_id") % 7))
      .withColumn("geometry_type",
        when(col("osm_version") === 1, "Point")
          .when(col("osm_version") === 2, "LineString")
          .otherwise("Polygon"))
  }

  def stageTail(df: DataFrame, byEntity: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
    df.withColumn("area_w", expr(
        s"CAST(40680631590769 AS DECIMAL(38,0)) * CAST((${Contributions.areaVSql}) AS DECIMAL(38,0))"))
      .withColumn("area_w2", expr(Contributions.areaW2Sql))
      .withColumn("area_m2", expr(Contributions.areaM2SparkSql))
      .withColumn("area_delta_m2",
        col("area_m2") - coalesce(lag("area_m2", 1).over(byEntity), lit(0L)))
}
