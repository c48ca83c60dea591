package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.format.{KeyValue, Util}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** GeoParquet writer — the reference's primary output contract
  * (ohsome-planet emits contribution GeoParquet; see ohsome-planet/README
  * and the ohsome-parquet writer): a BINARY WKB `geometry` column, optional
  * partitioned layout, and the GeoParquet `geo` metadata JSON
  * (version / primary_column / encoding / geometry types / CRS84 / dataset
  * bbox) embedded in every file's FOOTER key-value metadata, where
  * GeoParquet-aware tools sniff for it.
  *
  * Spark's parquet writer has no hook for custom footer key-value pairs,
  * so the `geo` entry is stamped in a post-write rewrite pass
  * ([[stampFooters]]): for each part file, parse the thrift footer
  * (parquet-format `Util`), append the key-value, and rewrite the file as
  * data-bytes + new-footer + length + magic. Row groups, column chunks,
  * and page offsets are untouched — footer offsets reference absolute data
  * positions that don't move, so the copy is byte-identical up to the
  * footer. The pass runs as one Spark task per file (the data copy is
  * sequential I/O, no decode), keeping the stamp distributed at
  * 100 TB dataset sizes.
  */
object GeoParquet {

  private val Magic = "PAR1".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

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
      // NaN coordinates (way/relation rows carry lat/lon = NaN in the mixed
      // entity frame) sort ABOVE every real value in Spark's min/max, so
      // they must be filtered out — an unguarded aggregate stamps literal
      // NaN into the footer JSON, which no reader parses.
      val r = df
        .filter(col(lonCol).isNotNull && col(latCol).isNotNull &&
          !isnan(col(lonCol)) && !isnan(col(latCol)))
        .agg(min(col(lonCol)), min(col(latCol)),
          max(col(lonCol)), max(col(latCol))).head()
      // no finite coordinates at all (e.g. a way/relation-only dataset) → no bbox
      if ((0 to 3).exists(i => r.isNullAt(i) || r.getDouble(i).isNaN)) ""
      else s""","bbox":[${r.getDouble(0)},${r.getDouble(1)},${r.getDouble(2)},${r.getDouble(3)}]"""
    }.getOrElse("")
    val geo =
      s"""{"version":"1.0.0","primary_column":"geometry","columns":{"geometry":{
         |"encoding":"WKB","geometry_types":[${geomTypes.map("\"" + _ + "\"").mkString(",")}],
         |"crs":{"id":{"authority":"OGC","code":"CRS84"}}$bboxJson}}}""".stripMargin
      .replace("\n", "")
    stampFooters(df.sparkSession, outDir, "geo", geo)
  }

  /** Embeds `key` → `value` into the footer key-value metadata of every
    * parquet part file under `outDir`, one Spark task per file. Idempotent:
    * an existing entry for `key` is replaced.
    */
  def stampFooters(spark: org.apache.spark.sql.SparkSession, outDir: String,
      key: String, value: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(outDir)
    val fs = root.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer[String]()
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        files += f.getPath.toString
    }
    if (files.isEmpty) return
    // Ship the DRIVER's resolved hadoop configuration (spark.hadoop.* —
    // filesystem credentials, fs.defaultFS, …) to the stamp tasks: a bare
    // `new Configuration()` on an executor sees only classpath XML defaults
    // and would resolve the wrong filesystem on real cluster deployments.
    // Configuration itself is not Serializable, so broadcast its entries.
    val confEntries: Array[(String, String)] = {
      val it = conf.iterator()
      val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
      while (it.hasNext) { val e = it.next(); buf += e.getKey -> e.getValue }
      buf.toArray
    }
    val bcConf = spark.sparkContext.broadcast(confEntries)
    spark.sparkContext
      .parallelize(files.toSeq, math.min(files.size, 32))
      .foreach { f =>
        val c = new Configuration(false)
        bcConf.value.foreach { case (k, v) => c.set(k, v) }
        stampOne(c, f, key, value)
      }
    bcConf.unpersist(blocking = false)
  }

  /** Footer surgery on one file: parse thrift footer, upsert the key-value,
    * rewrite as [unchanged data][new footer][footer length][PAR1] via a
    * temp file + rename. Data offsets in the footer are absolute positions
    * in the data section, which the rewrite never moves.
    */
  private[sources] def stampOne(conf: Configuration, file: String,
      key: String, value: String): Unit = {
    val path = new Path(file)
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    require(len > 12, s"$file: too short to be a parquet file")
    val in = fs.open(path)
    val (dataLen, footerBytes) =
      try {
        in.seek(len - 8)
        val tail = new Array[Byte](8)
        in.readFully(tail)
        require(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' && tail(7) == '1',
          s"$file: missing parquet magic (encrypted or corrupt footer?)")
        val footerLen = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
          ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
        val start = len - 8 - footerLen
        require(start >= 4, s"$file: implausible footer length $footerLen")
        in.seek(start)
        val fb = new Array[Byte](footerLen)
        in.readFully(fb)
        (start, fb)
      } finally in.close()

    val fmd = Util.readFileMetaData(new ByteArrayInputStream(footerBytes))
    if (fmd.isSetKey_value_metadata)
      fmd.getKey_value_metadata.removeIf(kv => kv.getKey == key)
    fmd.addToKey_value_metadata(new KeyValue(key).setValue(value))
    val bos = new ByteArrayOutputStream()
    Util.writeFileMetaData(fmd, bos)
    val newFooter = bos.toByteArray

    val tmp = new Path(file + ".geostamp.tmp")
    val dataIn = fs.open(path)
    val out = fs.create(tmp, true)
    try {
      val buf = new Array[Byte](1 << 20)
      var remaining = dataLen
      while (remaining > 0) {
        val n = dataIn.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
        require(n > 0, s"$file: unexpected EOF copying data section")
        out.write(buf, 0, n)
        remaining -= n
      }
      out.write(newFooter)
      out.write(Array[Byte](
        (newFooter.length & 0xff).toByte, ((newFooter.length >> 8) & 0xff).toByte,
        ((newFooter.length >> 16) & 0xff).toByte, ((newFooter.length >> 24) & 0xff).toByte))
      out.write(Magic)
    } finally {
      dataIn.close()
      out.close()
    }
    if (!fs.delete(path, false) || !fs.rename(tmp, path))
      throw new java.io.IOException(s"$file: failed to swap stamped file in")
  }

  /** Reads one file's footer key-value entry (test/verification helper). */
  def readFooterValue(conf: Configuration, file: String, key: String): Option[String] = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(file), conf))
    try Option(reader.getFooter.getFileMetaData.getKeyValueMetaData.get(key))
    finally reader.close()
  }
}
