package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GeoParquet-style writer — the reference's primary output contract
  * (ohsome-planet emits contribution GeoParquet; see
  * ohsome-planet/README and ohsome-contributions parquet output): a
  * BINARY WKB `geometry` column, optional partitioned layout, and the
  * GeoParquet `geo` metadata JSON (version / primary_column / encoding /
  * geometry types / CRS84 / dataset bbox).
  *
  * Spark's parquet writer offers no hook for custom file-footer
  * key-value metadata (that would take a custom FileFormat + committer),
  * so the `geo` JSON is written as a `_geo_metadata.json` sidecar at the
  * dataset root — same content, dataset granularity; readers that
  * require footer-embedded metadata can stamp it in with a parquet
  * rewrite pass, everything else (schema, binary WKB encoding, layout)
  * is GeoParquet-shaped as written.
  */
object GeoParquet {

  /** @param df         frame holding a hex-encoded WKB column
    * @param outDir     dataset root
    * @param wkbHexCol  hex WKB column to convert to the binary `geometry`
    * @param geomTypes  declared geometry types for the metadata
    * @param partitionCols optional partition layout (e.g. status, osm_type)
    * @param bboxLonLat optional (lon, lat) column names used to compute
    *                   the dataset bbox aggregate for the metadata
    */
  def write(df: DataFrame, outDir: String, wkbHexCol: String = "wkb",
      geomTypes: Seq[String] = Seq("Point"),
      partitionCols: Seq[String] = Nil,
      bboxLonLat: Option[(String, String)] = None): Unit = {
    val out = df
      .withColumn("geometry", unhex(col(wkbHexCol)))
      .drop(wkbHexCol)
    val writer = out.write.mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(outDir)

    val bboxJson = bboxLonLat.map { case (lonCol, latCol) =>
      val r = df.agg(min(col(lonCol)), min(col(latCol)),
        max(col(lonCol)), max(col(latCol))).head()
      s""","bbox":[${r.getDouble(0)},${r.getDouble(1)},${r.getDouble(2)},${r.getDouble(3)}]"""
    }.getOrElse("")
    val geo =
      s"""{"version":"1.0.0","primary_column":"geometry","columns":{"geometry":{
         |"encoding":"WKB","geometry_types":[${geomTypes.map("\"" + _ + "\"").mkString(",")}],
         |"crs":{"id":{"authority":"OGC","code":"CRS84"}}$bboxJson}}}""".stripMargin
      .replace("\n", "")
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val meta = fs.create(
      new org.apache.hadoop.fs.Path(outDir, "_geo_metadata.json"), true)
    try meta.write((geo + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally meta.close()
  }
}
