package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.VectorStore

/** DataSource V2 connector for the reference's single-file JSON+base64
  * format (/root/reference/src/lib.rs:40-71), so the format is a
  * first-class Spark source:
  * {{{
  *   spark.read.format("nanojson").load("/path/db.json")
  * }}}
  * Schema matches [[NanoJsonCodec.read]]: (__id__ STRING, vector
  * ARRAY<FLOAT>, fields_json STRING). One file = one partition (the
  * format is a single JSON document by the reference's own design —
  * docs/src/design_choices.md:20-29); the decode runs on the executor,
  * not the driver, and goes through Hadoop FS so any supported scheme
  * works. Load-time validation mirrors the reference
  * (matrix.len == data.len * dim, lib.rs:122-129).
  */
class NanoJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "nanojson"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NanoJsonSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NanoJsonTable(properties.get("path"))
}

object NanoJsonSource {
  val schema: StructType = StructType(Seq(
    StructField(VectorStore.IdCol, StringType, nullable = false),
    StructField(VectorStore.VectorCol, ArrayType(FloatType, containsNull = false)),
    StructField("fields_json", StringType)))
}

private[sources] class NanoJsonTable(path: String)
  extends Table with SupportsRead with SupportsWrite {
  require(path != null && path.nonEmpty, "nanojson source requires a path")
  override def name(): String = s"nanojson($path)"
  override def schema(): StructType = NanoJsonSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NanoJsonScan(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new NanoJsonWriteBuilder(path, info.schema())
}

/** Write path: the format is ONE JSON document, so per-partition writers
  * serialize their row slices into commit messages and the driver
  * assembles the file in `commit()` — sorted by partition id, making the
  * row order deterministic. Bounded by the format's own in-memory-sized
  * design (docs/src/design_choices.md:20-29); the scale sink is parquet
  * ([[graft.operators.VectorStore.save]]). Expects the read schema
  * (__id__, vector, fields_json). */
private[sources] class NanoJsonWriteBuilder(path: String, schema: StructType)
  extends WriteBuilder
  with org.apache.spark.sql.connector.write.SupportsTruncate {
  // overwrite mode arrives as truncate + write — the file is replaced
  private var truncated = false
  override def truncate(): WriteBuilder = { truncated = true; this }
  override def build(): Write = {
    // a whole-file format cannot append: commit() rebuilds the document
    // from the incoming rows only, so an append would silently drop the
    // existing data — reject it instead
    if (!truncated) throw new UnsupportedOperationException(
      "nanojson is a single-document format: only SaveMode.Overwrite is " +
        "supported (append would replace the file with just the new rows)")
    new Write {
      override def toBatch: BatchWrite = new NanoJsonBatchWrite(path, schema)
    }
  }
}

private[sources] final case class NanoJsonRowsMessage(
    partitionId: Int, ids: Array[String], vectors: Array[Array[Float]],
    fields: Array[String]) extends WriterCommitMessage

private[sources] class NanoJsonBatchWrite(path: String, schema: StructType)
  extends BatchWrite {
  private val required = Seq(VectorStore.IdCol, VectorStore.VectorCol, "fields_json")
  require(schema.fieldNames.toSeq == required,
    s"nanojson write expects columns $required, got ${schema.fieldNames.toSeq}")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new DataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
        new NanoJsonDataWriter(partitionId)
    }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    val dataArr = mapper.createArrayNode()
    val sorted = messages.map(_.asInstanceOf[NanoJsonRowsMessage]).sortBy(_.partitionId)
    val totalFloats = sorted.iterator.flatMap(_.vectors.iterator.map(_.length)).sum
    val matrix = new Array[Float](totalFloats)
    var used = 0
    var dim = -1
    sorted.foreach { m =>
      var i = 0
      while (i < m.ids.length) {
        if (dim < 0) dim = m.vectors(i).length
        require(m.vectors(i).length == dim,
          s"vector dim ${m.vectors(i).length} != $dim for id ${m.ids(i)}")
        val rec = mapper.createObjectNode()
        val f = mapper.readTree(m.fields(i))
        if (f.isObject) rec.setAll[ObjectNode](f.asInstanceOf[ObjectNode])
        // the id column wins over any "__id__" key smuggled inside
        // fields_json (mirrors the read path, which strips it)
        rec.put("__id__", m.ids(i))
        dataArr.add(rec)
        System.arraycopy(m.vectors(i), 0, matrix, used, dim)
        used += dim
        i += 1
      }
    }
    root.put("embedding_dim", math.max(dim, 0))
    root.set[ObjectNode]("data", dataArr)
    root.put("matrix", NanoJsonCodec.encodeMatrix(matrix))
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsString(root).getBytes("UTF-8")) finally out.close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class NanoJsonDataWriter(partitionId: Int)
  extends DataWriter[InternalRow] {
  private val ids = scala.collection.mutable.ArrayBuffer.empty[String]
  private val vectors = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
  private val fields = scala.collection.mutable.ArrayBuffer.empty[String]

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(0), "nanojson write: __id__ must not be null")
    require(!row.isNullAt(1),
      s"nanojson write: vector must not be null (id ${row.getUTF8String(0)})")
    ids += row.getUTF8String(0).toString
    vectors += row.getArray(1).toFloatArray()
    fields += (if (row.isNullAt(2)) "{}" else row.getUTF8String(2).toString)
  }
  override def commit(): WriterCommitMessage =
    NanoJsonRowsMessage(partitionId, ids.toArray, vectors.toArray, fields.toArray)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}

private[sources] class NanoJsonScan(path: String)
  extends ScanBuilder with Scan with Batch with Serializable
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
  // column pruning reaches the decoder: an unselected fields_json skips
  // the per-row JSON re-serialization, an unselected vector skips the
  // array copy — the DSv2 analogue of parquet ReadSchema pruning
  private var pruned: StructType = NanoJsonSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = { pruned = requiredSchema }
  override def build(): Scan = this
  override def readSchema(): StructType = pruned
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    // ship the session's Hadoop conf to the reader: fs credentials /
    // endpoints / scheme registrations live there, not in a fresh
    // Configuration()
    val conf = new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    Array(NanoJsonPartition(path, pruned.fieldNames, conf))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new NanoJsonReaderFactory
}

private[sources] final case class NanoJsonPartition(
    path: String, columns: Array[String],
    conf: org.apache.spark.util.SerializableConfiguration) extends InputPartition

private[sources] class NanoJsonReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[NanoJsonPartition]
    new NanoJsonPartitionReader(p.path, p.columns, p.conf.value)
  }
}

private[sources] class NanoJsonPartitionReader(path: String, columns: Array[String],
    hadoopConf: org.apache.hadoop.conf.Configuration)
  extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()

  private val (rows, dim, matrix) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val root = mapper.readTree(txt)
    val d = root.get("embedding_dim").asInt()
    val m = NanoJsonCodec.decodeMatrix(root.get("matrix").asText())
    val data = root.get("data")
    require(m.length == data.size() * d,
      s"Storage file corrupted: matrix length ${m.length} does not match " +
        s"data length ${data.size()} * embedding dim $d")
    (data.elements(), d, m)
  }

  private var idx = -1
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!rows.hasNext) return false
    val node = rows.next().asInstanceOf[ObjectNode]
    idx += 1
    val values = columns.map {
      case VectorStore.IdCol =>
        UTF8String.fromString(node.get("__id__").asText())
      case VectorStore.VectorCol =>
        UnsafeArrayData.fromPrimitiveArray(
          java.util.Arrays.copyOfRange(matrix, idx * dim, (idx + 1) * dim))
      case "fields_json" =>
        val fields = node.deepCopy[ObjectNode]()
        fields.remove("__id__")
        UTF8String.fromString(mapper.writeValueAsString(fields))
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
