package graft.sources

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{Row, SparkSession}

import java.util.{Map => JMap, Set => JSet}

/** DataSource V2 registration for OSM PBF:
  * `spark.read.format("osmpbf").load(path)`.
  *
  * Spark-native integration of the blob-indexed reader with real
  * pushdown:
  *  - the framing scan runs once at planning time (metadata only) and
  *    each blob range becomes an `InputPartition`;
  *  - `osm_type = …` / `osm_type IN (…)` filters push into the decoder,
  *    which then SKIPS whole primitive-group types (a node-only query
  *    never decodes way/relation groups — on OSM history, ~10% of bytes);
  *  - column pruning reaches the decoder too: rows carry only requested
  *    fields, and history queries that drop `tags`/`members` skip the
  *    map/struct construction entirely.
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
    new OsmPbfScanBuilder(path)
}

class OsmPbfScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var requiredSchema: StructType = OsmPbf.schema
  private var typeFilter: Option[Set[String]] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("osm_type", _: String) => true
      case In("osm_type", vs) if vs.forall(_.isInstanceOf[String]) => true
      case _ => false
    }
    typeFilter = accepted.foldLeft(Option.empty[Set[String]]) { (acc, f) =>
      val vs = f match {
        case EqualTo(_, v: String) => Set(v)
        case In(_, vals) => vals.map(_.asInstanceOf[String]).toSet
        case _ => Set.empty[String]
      }
      Some(acc.fold(vs)(_ intersect vs))
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new OsmPbfScan(path, requiredSchema, typeFilter)
}

/** One partition = a contiguous run of OSMData blobs. */
case class PbfBlobPartition(refs: Seq[OsmPbf.BlobRef]) extends InputPartition

class OsmPbfScan(path: String, requiredSchema: StructType,
    typeFilter: Option[Set[String]]) extends Scan with Batch {
  override def readSchema(): StructType = requiredSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"osmpbf $path, types=${typeFilter.map(_.mkString(",")).getOrElse("*")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val refs = OsmPbf.indexBlobsDistributed(spark, path).filter(_.blobType == "OSMData")
    val slices = math.max(1,
      math.min(refs.size, spark.sparkContext.defaultParallelism))
    refs.grouped(math.max(1, (refs.size + slices - 1) / slices))
      .map(PbfBlobPartition(_): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PbfReaderFactory(
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration),
      requiredSchema, typeFilter)
}

class PbfReaderFactory(conf: org.apache.spark.util.SerializableConfiguration,
    requiredSchema: StructType, typeFilter: Option[Set[String]])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val refs = partition.asInstanceOf[PbfBlobPartition].refs
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(requiredSchema)
    val fields = requiredSchema.fieldNames
    val keep = typeFilter
    // nested schema pruning can hand us a members element struct with fewer
    // than 3 fields (e.g. `select members.ref`): emit exactly the requested
    // subfields, in the requested order, or the struct converter mis-maps
    val memberFields: Array[String] = requiredSchema.find(_.name == "members")
      .map(_.dataType) match {
      case Some(org.apache.spark.sql.types.ArrayType(st: StructType, _)) => st.fieldNames
      case _ => Array("mtype", "ref", "role")
    }
    def memberRow(m: (String, Long, String)): Row =
      Row(memberFields.map {
        case "mtype" => m._1
        case "ref" => m._2
        case "role" => m._3
      }: _*)
    val rows: Iterator[InternalRow] = refs.iterator.flatMap { ref =>
      val hPath = new org.apache.hadoop.fs.Path(ref.path)
      val fs = hPath.getFileSystem(conf.value)
      val in = fs.open(hPath)
      val bytes = new Array[Byte](ref.size)
      try { in.seek(ref.offset); in.readFully(bytes) } finally in.close()
      OsmPbf.decodeBlock(OsmPbf.inflateBlob(bytes), keep).iterator
        .map { e =>
          val values: Array[Any] = fields.map {
            case "osm_type" => e.osm_type
            case "id" => e.id
            case "version" => e.version
            case "ts_ms" => e.ts_ms
            case "changeset" => e.changeset
            case "uid" => e.uid
            case "user" => e.user
            case "visible" => e.visible
            case "lat" => e.lat
            case "lon" => e.lon
            case "tags" => e.tags
            case "refs" => e.refs
            case "members" => e.members.map(memberRow)
          }
          toCatalyst(Row(values: _*)).asInstanceOf[InternalRow]
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
