package graft.sources

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{Row, SparkSession}

import java.util.{Map => JMap, Set => JSet}

/** DataSource V2 registration for OSM PBF:
  * `spark.read.format("osmpbf").load(path)`.
  *
  * Spark-native integration of the blob-indexed reader: the framing scan
  * runs once at planning time (metadata only), each blob range becomes an
  * `InputPartition`, and executors decode independently — the engine
  * schedules, retries, and locality-places blob decode like any other
  * scan. (The RDD path in `OsmPbf.read` remains for callers without the
  * catalog.)
  */
class OsmPbfSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "osmpbf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OsmPbf.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new OsmPbfTable(properties.get("path"))
}

class OsmPbfTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"osmpbf:$path"
  override def schema(): StructType = OsmPbf.schema
  override def capabilities(): JSet[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new OsmPbfScan(path)
    }
}

/** One partition = a contiguous run of OSMData blobs. */
case class PbfBlobPartition(refs: Seq[OsmPbf.BlobRef]) extends InputPartition

class OsmPbfScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType = OsmPbf.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val refs = OsmPbf.indexBlobs(spark, path).filter(_.blobType == "OSMData")
    val slices = math.max(1,
      math.min(refs.size, spark.sparkContext.defaultParallelism))
    refs.grouped(math.max(1, (refs.size + slices - 1) / slices))
      .map(PbfBlobPartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PbfReaderFactory(
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration))
}

class PbfReaderFactory(conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val refs = partition.asInstanceOf[PbfBlobPartition].refs
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(OsmPbf.schema)
    val rows: Iterator[InternalRow] = refs.iterator.flatMap { ref =>
      val hPath = new org.apache.hadoop.fs.Path(ref.path)
      val fs = hPath.getFileSystem(conf.value)
      val in = fs.open(hPath)
      val bytes = new Array[Byte](ref.size)
      try { in.seek(ref.offset); in.readFully(bytes) } finally in.close()
      OsmPbf.decodeBlock(OsmPbf.inflateBlob(bytes)).iterator.map { e =>
        toCatalyst(Row(e.osm_type, e.id, e.version, e.ts_ms, e.changeset,
          e.uid, e.user, e.visible, e.lat, e.lon, e.tags, e.refs,
          e.members.map(m => Row(m._1, m._2, m._3)))).asInstanceOf[InternalRow]
      }
    }
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
