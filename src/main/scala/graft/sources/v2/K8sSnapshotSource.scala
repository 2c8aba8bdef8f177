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
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new K8sScanBuilder(kind, path, schema())
}

class K8sScanBuilder(kind: String, path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Push simple predicates on the STAMPED key columns (uid/name/node —
    * cheap text probes into the raw JSON) down to the reader: matching
    * happens BEFORE item conversion, so on a large cluster snapshot a
    * `WHERE node = 'x'` converts only x's pods, not the fleet (SURVEY §4
    * checklist). The evaluation is exact, so accepted filters produce no
    * residual for Spark to re-check.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val stampedCols = full.fieldNames.toSet
      .intersect(Set("uid", "name", "node"))
    def supported(f: Filter): Boolean = f match {
      case EqualTo(a, v) => stampedCols(a) && v.isInstanceOf[String]
      case In(a, vs) => stampedCols(a) && vs.forall(_.isInstanceOf[String])
      case IsNotNull(a) => stampedCols(a)
      case IsNull(a) => stampedCols(a)
      case StringStartsWith(a, _) => stampedCols(a)
      case StringContains(a, _) => stampedCols(a)
      case _ => false
    }
    val (ok, rest) = filters.partition(supported)
    pushed = ok
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      Array(K8sInputPartition(kind, path))
    override def createReaderFactory(): PartitionReaderFactory =
      new K8sReaderFactory(required, pushed)
    override def toMicroBatchStream(checkpointLocation: String)
        : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      new K8sMicroBatchStream(kind, path, required, pushed)
    override def description(): String =
      s"k8s-snapshot kind=$kind path=$path cols=${required.fieldNames.mkString(",")}" +
        s" filters=${pushed.mkString(",")}"
  }
}

/** Streaming face of the connector — the reference's snapshot REFRESH
  * loop (`ksql.js:280`: re-list 10 s after startup) generalized to a
  * Structured Streaming source: each re-list lands as a new generation
  * file `<kind>-<gen>.json` in the watched directory, and every
  * micro-batch picks up exactly the not-yet-committed generations.
  *
  * Offsets are the MAX GENERATION NUMBER consumed (parsed from the
  * trailing digits of the filename), not an index into a name-sorted
  * listing: unpadded names (`pods-10.json` sorts before `pods-2.json`)
  * and files landing between `latestOffset` and `planInputPartitions`
  * would both shift index-based slices, replaying one generation and
  * skipping another. A gen-range selection `(start, end]` is stable
  * under both, so restart-from-checkpoint replays exactly the right
  * snapshots. The listing is captured once per batch at `latestOffset`;
  * column pruning and stamped-key filter pushdown apply per generation
  * exactly as in the batch reader (same PartitionReader).
  *
  * At scale each generation file is one API list response; a live
  * implementation swaps the directory listing for a watch bookmark —
  * the offset contract (monotone generation number) is unchanged.
  */
class K8sMicroBatchStream(kind: String, dir: String, required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  /** Trailing digits of the basename (`pods-17.json` → 17). Files with
    * no generation number are not generations and are skipped.
    */
  private def genOf(name: String): Option[Long] = {
    val digits = name.stripSuffix(".json").reverse.takeWhile(_.isDigit).reverse
    if (digits.isEmpty || digits.length > 18) None else Some(digits.toLong)
  }

  private def listGenerations(): Array[(Long, String)] = {
    val d = new java.io.File(dir)
    val fs = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".json"))
      .flatMap(f => genOf(f.getName).map(g => (g, f.getAbsolutePath)))
      .sortBy(_._1)
    // a single-file path behaves as one generation (batch parity)
    if (fs.isEmpty && d.isFile) Array((0L, d.getAbsolutePath)) else fs
  }

  /** Listing captured at `latestOffset` so the batch planned against it
    * sees a consistent snapshot even if files land mid-plan.
    */
  @volatile private var captured: Array[(Long, String)] = Array.empty

  override def initialOffset(): Offset = K8sGenOffset(-1L)
  override def latestOffset(): Offset = {
    captured = listGenerations()
    K8sGenOffset(if (captured.isEmpty) -1L else captured.last._1)
  }
  override def deserializeOffset(json: String): Offset =
    K8sGenOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[K8sGenOffset].gen,
      end.asInstanceOf[K8sGenOffset].gen)
    // Replay after restart plans from the offset log without a fresh
    // latestOffset; re-list then — gen-range selection is stable anyway.
    val src =
      if (captured.nonEmpty && captured.last._1 >= e) captured
      else listGenerations()
    src.filter { case (g, _) => g > s && g <= e }
      .map { case (_, p) => K8sInputPartition(kind, p): InputPartition }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new K8sReaderFactory(required, filters)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class K8sGenOffset(gen: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = gen.toString
}

case class K8sInputPartition(kind: String, path: String)
    extends InputPartition

class K8sReaderFactory(required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[K8sInputPartition]
    new K8sPartitionReader(part.kind, part.path, required, filters)
  }
}

/** Parses the list file once and converts each item to an InternalRow of
  * the PRUNED schema (fields never requested are never converted). Pushed
  * filters on the stamped columns are evaluated against the raw JSON
  * BEFORE item conversion, so non-matching items are never converted at
  * all — the point of `SupportsPushDownFilters` here (SURVEY §4).
  */
class K8sPartitionReader(kind: String, path: String, required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends PartitionReader[InternalRow] {
  import org.apache.spark.sql.sources._
  private val mapper = new ObjectMapper
  private val items: Iterator[JsonNode] = {
    val root = mapper.readTree(new java.io.File(path))
    val arr = root.get("items")
    if (arr == null) Iterator.empty else arr.elements().asScala
  }
  private var current: InternalRow = _

  /** Items converted to rows — observable from K8sDsv2Spec to prove the
    * pushdown skips conversion, not just post-filters.
    */
  var converted: Long = 0L

  private def matches(item: JsonNode, f: Filter): Boolean = f match {
    case EqualTo(a, v) => stamped(item, a) == v
    case In(a, vs) => vs.contains(stamped(item, a))
    case IsNotNull(a) => stamped(item, a) != null
    case IsNull(a) => stamped(item, a) == null
    case StringStartsWith(a, p) =>
      Option(stamped(item, a)).exists(_.startsWith(p))
    case StringContains(a, s) =>
      Option(stamped(item, a)).exists(_.contains(s))
    case other => sys.error(s"k8s-snapshot: unpushable filter $other")
  }

  override def next(): Boolean = {
    while (items.hasNext) {
      val item = items.next()
      if (filters.forall(matches(item, _))) {
        current = convertItem(item); converted += 1
        return true
      }
    }
    false
  }
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
