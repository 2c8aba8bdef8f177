package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.sources.K8sSchemas

/** DataSource V2 connector for K8s snapshot lists (SURVEY §4 / §7.3
  * optional scope): `spark.read.format("k8s-snapshot").option("kind",
  * "pods").load(path)` reads a K8s list response (`{"items":[...]}` —
  * what `/api/v1/pods` returns, mirroring the reference's scans at
  * `/root/reference/ksql.js:190-247`) as a properly-schemed DataFrame
  * with the same stamped columns as `graft.sources.K8sSnapshot`.
  *
  * Column pruning is pushed into the reader (`SupportsPushDownRequiredColumns`):
  * a query touching only `uid` never materializes `spec`/`status`/`_raw`
  * — on a large cluster snapshot (or any list-shaped JSON source) the
  * JSON→row conversion cost scales with the pruned schema, not the full
  * object. A live-API implementation swaps the file read for an HTTPS
  * list call; everything from parse to InternalRow is shared.
  */
class K8sSnapshotSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "k8s-snapshot"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    K8sSnapshotTable.schemaFor(Option(options.get("kind")).getOrElse("pods"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new K8sSnapshotTable(
      Option(properties.get("kind")).getOrElse("pods"),
      Option(properties.get("path")).orElse(
        Option(properties.get("paths")).map(p =>
          // Spark passes .load(path) as a JSON array in "paths"
          p.stripPrefix("[\"").stripSuffix("\"]")))
        .getOrElse(sys.error("k8s-snapshot: path required")))
}

object K8sSnapshotTable {
  /** Full table schemas — modeled structs + stamped keys + _raw escape
    * hatch, identical to the view-based loader so queries are portable.
    */
  def schemaFor(kind: String): StructType = kind match {
    case "pods" => new StructType()
      .add("uid", StringType).add("node", StringType)
      .add("metadata", K8sSchemas.metadata)
      .add("spec", K8sSchemas.pod("spec").dataType)
      .add("status", K8sSchemas.pod("status").dataType)
      .add("_raw", StringType)
    case "nodes" => new StructType()
      .add("name", StringType).add("uid", StringType)
      .add("metadata", K8sSchemas.metadata)
      .add("spec", K8sSchemas.node("spec").dataType)
      .add("status", K8sSchemas.node("status").dataType)
      .add("_raw", StringType)
    case "services" => new StructType()
      .add("name", StringType).add("uid", StringType)
      .add("metadata", K8sSchemas.metadata)
      .add("spec", K8sSchemas.service("spec").dataType)
      .add("status", K8sSchemas.service("status").dataType)
      .add("_raw", StringType)
    case other => sys.error(s"k8s-snapshot: unknown kind '$other'")
  }
}

class K8sSnapshotTable(kind: String, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"k8s-snapshot:$kind:$path"
  override def schema(): StructType = K8sSnapshotTable.schemaFor(kind)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new K8sScanBuilder(kind, path, schema())
}

class K8sScanBuilder(kind: String, path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      Array(K8sInputPartition(kind, path))
    override def createReaderFactory(): PartitionReaderFactory =
      new K8sReaderFactory(required)
    override def description(): String =
      s"k8s-snapshot kind=$kind path=$path cols=${required.fieldNames.mkString(",")}"
  }
}

case class K8sInputPartition(kind: String, path: String)
    extends InputPartition

class K8sReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[K8sInputPartition]
    new K8sPartitionReader(part.kind, part.path, required)
  }
}

/** Parses the list file once and converts each item to an InternalRow of
  * the PRUNED schema (fields never requested are never converted).
  */
class K8sPartitionReader(kind: String, path: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper
  private val items: Iterator[JsonNode] = {
    val root = mapper.readTree(new java.io.File(path))
    val arr = root.get("items")
    if (arr == null) Iterator.empty else arr.elements().asScala
  }
  private var current: InternalRow = _

  override def next(): Boolean =
    if (items.hasNext) { current = convertItem(items.next()); true }
    else false
  override def get(): InternalRow = current
  override def close(): Unit = ()

  private def stamped(item: JsonNode, field: String): String = field match {
    case "uid" => textAt(item, "metadata", "uid")
    case "name" => textAt(item, "metadata", "name")
    case "node" => textAt(item, "spec", "nodeName")
    case _ => null
  }

  private def textAt(n: JsonNode, p1: String, p2: String): String = {
    val a = n.get(p1)
    if (a == null) null
    else { val b = a.get(p2); if (b == null || b.isNull) null else b.asText }
  }

  private def convertItem(item: JsonNode): InternalRow = {
    val values = required.fields.map { f =>
      f.name match {
        case "uid" | "name" | "node" =>
          Option(stamped(item, f.name)).map(UTF8String.fromString).orNull
        case "_raw" => UTF8String.fromString(item.toString)
        case other => convert(item.get(other), f.dataType)
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  private def convert(node: JsonNode, dt: DataType): Any = {
    if (node == null || node.isNull) return null
    dt match {
      case StringType => UTF8String.fromString(
        if (node.isTextual) node.asText else node.toString)
      case IntegerType => if (node.isNumber) Int.box(node.asInt) else null
      case LongType => if (node.isNumber) Long.box(node.asLong) else null
      case DoubleType => if (node.isNumber) Double.box(node.asDouble) else null
      case BooleanType => if (node.isBoolean) Boolean.box(node.asBoolean) else null
      case s: StructType =>
        InternalRow.fromSeq(s.fields.toIndexedSeq.map(f =>
          convert(node.get(f.name), f.dataType)))
      case ArrayType(et, _) =>
        if (!node.isArray) null
        else new GenericArrayData(node.elements().asScala.map(convert(_, et)).toArray)
      case MapType(StringType, vt, _) =>
        if (!node.isObject) null
        else {
          val ks = node.fieldNames().asScala.toArray
          ArrayBasedMapData(
            ks.map(k => UTF8String.fromString(k): Any),
            ks.map(k => convert(node.get(k), vt)))
        }
      case other => sys.error(s"k8s-snapshot: unsupported type $other")
    }
  }
}
