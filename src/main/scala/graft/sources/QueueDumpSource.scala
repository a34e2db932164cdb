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
  *  - File-per-partition work distribution: scale = number of dump files.
  *
  * Usage: `spark.read.format("graft.sources.QueueDumpSource").load(dir)`.
  */
class QueueDumpSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    QueueDumpSource.PostSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new QueueDumpTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("queue dump source requires a 'path'")))
}

object QueueDumpSource {
  /** §1.2 post schema — identical to QueuePipeline.postSchema; restated here
    * as the connector's fixed table schema. */
  val PostSchema: StructType = graft.streaming.QueuePipeline.postSchema
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
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = QueueDumpSource.PostSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new QueueDumpScan(path, required)
}

private class QueueDumpScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"QueueDumpScan(path=$path, columns=[${required.fieldNames.mkString(",")}])"
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
    new QueueDumpReaderFactory(required)
}

private case class QueueDumpPartition(file: String) extends InputPartition

private class QueueDumpReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new QueueDumpReader(partition.asInstanceOf[QueueDumpPartition].file, required)
}

/** Streams one dump file: line → JSON array → one InternalRow per element,
  * extracting ONLY the pruned columns. Malformed lines and non-array
  * payloads are skipped (the reference's decode-error branch,
  * addReddit.py:38-40). */
private class QueueDumpReader(file: String, required: StructType)
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
    while (!docs.hasNext && lines.hasNext) {
      val line = lines.next()
      try {
        val node = mapper.readTree(line)
        if (node != null && node.isArray) docs = node.elements().asScala
      } catch { case _: Exception => /* malformed payload: skip (F4) */ }
    }
    if (docs.hasNext) { current = toRow(docs.next()); true } else false
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
