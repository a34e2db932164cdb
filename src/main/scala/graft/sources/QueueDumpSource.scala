package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for Redis-queue dump files (SURVEY.md §7.1 step 7,
  * the optional `RedisQueueSource`): each line of each file is ONE queue
  * element — a JSON **array** of post documents (enqueue.py:45 shape,
  * FIXTURES.md §3). The scan explodes payloads into typed post rows.
  *
  * What this demonstrates beyond `spark.read.text` + `from_json`:
  *  - `TableProvider`/`SupportsRead` wiring with a fixed, declared schema
  *    (§1.3: no inference in production paths).
  *  - **Column pruning pushed INTO the source** (`SupportsPushDownRequiredColumns`):
  *    a `select("id")` never materializes the other 8 fields — the reader
  *    extracts only requested JSON keys. `.explain` shows the pruned output.
  *  - **Predicate pushdown** (`SupportsPushDownFilters`): string equality on
  *    any field plus `created_utc` ranges (ISO-8601 strings order
  *    chronologically) are evaluated on the raw JSON before a row is built —
  *    the connector-level analog of the reference's source-side predicates
  *    (`time_filter="week"`, reddit_harvester_comment.py:39-41; ES
  *    `multi_match` server-side, redditProcessor.py:69,74).
  *  - File-per-partition work distribution: scale = number of dump files.
  *
  * Usage: `spark.read.format("graft.sources.QueueDumpSource").load(dir)`.
  */
class QueueDumpSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QueueDumpSource.PostSchema

  // Accept a user-specified schema, but only the declared one: the reader
  // maps JSON keys by the FIXED post schema, so a divergent user schema
  // would silently mis-map columns instead of failing loudly.
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    if (schema != null && schema.map(f => (f.name, f.dataType))
      != QueueDumpSource.PostSchema.map(f => (f.name, f.dataType)))
      throw new IllegalArgumentException(
        s"queue dump source has the fixed schema ${QueueDumpSource.PostSchema.simpleString}; " +
          s"got user-specified ${schema.simpleString}")
    new QueueDumpTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("queue dump source requires a 'path'")))
  }
}

object QueueDumpSource {
  /** §1.2 post schema — identical to QueuePipeline.postSchema; restated here
    * as the connector's fixed table schema. */
  val PostSchema: StructType = graft.streaming.QueuePipeline.postSchema

  /** Which filters the source can evaluate itself, and how. Fully handled
    * (exact SQL semantics incl. null-comparison-is-false), so Spark drops
    * them from the post-scan Filter. */
  private[sources] object PushableFilters {
    private def stringField(a: String): Boolean =
      PostSchema.fields.exists(f => f.name == a && f.dataType == StringType)

    def supported(f: Filter): Boolean = f match {
      case EqualTo(a, _: String)            => stringField(a)
      case GreaterThan(a, _: String)        => a == "created_utc"
      case GreaterThanOrEqual(a, _: String) => a == "created_utc"
      case LessThan(a, _: String)           => a == "created_utc"
      case LessThanOrEqual(a, _: String)    => a == "created_utc"
      case IsNotNull(a)                     => PostSchema.fieldNames.contains(a)
      case _                                => false
    }

    private def text(doc: JsonNode, a: String): Option[String] = {
      val n = doc.get(a)
      if (n == null || n.isNull) None
      else Some(if (n.isTextual) n.asText() else n.toString)
    }

    def eval(f: Filter, doc: JsonNode): Boolean = f match {
      case EqualTo(a, v: String)            => text(doc, a).contains(v)
      case GreaterThan(a, v: String)        => text(doc, a).exists(_ > v)
      case GreaterThanOrEqual(a, v: String) => text(doc, a).exists(_ >= v)
      case LessThan(a, v: String)           => text(doc, a).exists(_ < v)
      case LessThanOrEqual(a, v: String)    => text(doc, a).exists(_ <= v)
      case IsNotNull(a)                     => text(doc, a).isDefined
      case _                                => true
    }
  }
}

private class QueueDumpTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"queuedump(`$path`)"
  override def schema(): StructType = QueueDumpSource.PostSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new QueueDumpScanBuilder(path)
}

private class QueueDumpScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = QueueDumpSource.PostSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, rest) = filters.partition(QueueDumpSource.PushableFilters.supported)
    pushed = sup
    rest // only these remain in the post-scan Filter
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new QueueDumpScan(path, required, pushed)
}

private class QueueDumpScan(path: String, required: StructType,
                            pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"QueueDumpScan(path=$path, columns=[${required.fieldNames.mkString(",")}], " +
      s"pushedFilters=[${pushed.mkString(",")}])"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = Paths.get(path)
    val files =
      if (Files.isDirectory(p)) {
        val listing = Files.list(p)
        try listing.iterator().asScala
          .filter(f => Files.isRegularFile(f) && !f.getFileName.toString.startsWith("_")
            && !f.getFileName.toString.startsWith("."))
          .map(_.toString).toArray.sorted
        finally listing.close()
      } else Array(path)
    files.map(f => QueueDumpPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new QueueDumpReaderFactory(required, pushed)
}

private case class QueueDumpPartition(file: String) extends InputPartition

private class QueueDumpReaderFactory(required: StructType, pushed: Array[Filter])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new QueueDumpReader(partition.asInstanceOf[QueueDumpPartition].file, required, pushed)
}

/** Streams one dump file: line → JSON array → one InternalRow per element,
  * evaluating pushed filters on the raw JSON (before any row is built) and
  * extracting ONLY the pruned columns. Malformed lines and non-array
  * payloads are skipped (the reference's decode-error branch,
  * addReddit.py:38-40). */
private class QueueDumpReader(file: String, required: StructType,
                              pushed: Array[Filter])
  extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper
  // held so close() can release the underlying file descriptor — Spark calls
  // close() per partition; relying on GC leaks fds across thousands of files
  private val lineStream = Files.lines(Paths.get(file), StandardCharsets.UTF_8)
  private val lines = lineStream.iterator()
  private var docs: Iterator[JsonNode] = Iterator.empty
  private var current: InternalRow = _

  private val fields: Array[(String, DataType)] =
    required.fields.map(f => (f.name, f.dataType))

  override def next(): Boolean = {
    while (true) {
      while (!docs.hasNext && lines.hasNext) {
        val line = lines.next()
        try {
          val node = mapper.readTree(line)
          if (node != null && node.isArray) docs = node.elements().asScala
        } catch { case _: Exception => /* malformed payload: skip (F4) */ }
      }
      if (!docs.hasNext) return false
      val doc = docs.next()
      if (pushed.forall(QueueDumpSource.PushableFilters.eval(_, doc))) {
        current = toRow(doc)
        return true
      }
    }
    false // unreachable
  }

  private def toRow(doc: JsonNode): InternalRow = {
    val values = fields.map { case (name, dt) =>
      val v = doc.get(name)
      if (v == null || v.isNull) null
      else dt match {
        case StringType => UTF8String.fromString(if (v.isTextual) v.asText() else v.toString)
        case IntegerType => Int.box(v.asInt())
        case LongType => Long.box(v.asLong())
        case DoubleType => Double.box(v.asDouble())
        case _ => null // schema is fixed; nothing else occurs
      }
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def get(): InternalRow = current
  override def close(): Unit = lineStream.close()
}
