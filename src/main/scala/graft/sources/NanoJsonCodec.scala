package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

import scala.collection.mutable.ArrayBuffer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.VectorStore

/** Interop codec for the reference's single-file JSON persistence format
  * (/root/reference/src/lib.rs:40-71, 116-147, 289-293):
  * {{{
  *   { "embedding_dim": N,
  *     "data": [ {"__id__": "...", ...flattened metadata...} ],
  *     "matrix": "<base64 of row-major little-endian f32, unit-normalized>",
  *     "additional_data": {...} }
  * }}}
  * `data[i].vector` is never serialized (lib.rs:33) — vectors live only in
  * the matrix. This codec runs on the driver by design: the format is a
  * single JSON file and the reference targets in-memory-sized DBs
  * (docs/src/design_choices.md:20-29). The native scale path is
  * [[VectorStore.save]]/[[VectorStore.load]] (parquet).
  */
object NanoJsonCodec {

  private val mapper = new ObjectMapper()

  /** Decode base64(little-endian f32) -> flat float array (lib.rs:61-70). */
  def decodeMatrix(b64: String): Array[Float] = {
    val bytes = Base64.getDecoder.decode(b64)
    require(bytes.length % 4 == 0, s"matrix byte length ${bytes.length} not a multiple of 4")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](bytes.length / 4)
    var i = 0
    while (i < out.length) { out(i) = bb.getFloat(); i += 1 }
    out
  }

  /** Encode flat float array -> base64(little-endian f32) (lib.rs:55-59). */
  def encodeMatrix(m: Array[Float]): String = {
    val bb = ByteBuffer.allocate(m.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    m.foreach(bb.putFloat)
    Base64.getEncoder.encodeToString(bb.array())
  }

  /** Read a reference-format file into a VectorStore. Metadata fields are
    * surfaced as a single JSON-string column `fields_json` (schemaless in
    * the reference; use from_json/get_json_object to project).
    * Validates matrix.len == data.len * dim exactly like the reference
    * load (lib.rs:122-129). */
  def read(spark: SparkSession, file: String): VectorStore = {
    val root = mapper.readTree(Files.readString(Paths.get(file)))
    val dim = root.get("embedding_dim").asInt()
    val matrix = decodeMatrix(root.get("matrix").asText())
    val data = root.get("data")
    require(matrix.length == data.size() * dim,
      s"Storage file corrupted: matrix length ${matrix.length} does not match " +
        s"data length ${data.size()} * embedding dim $dim")
    val rows = new ArrayBuffer[Row](data.size())
    var i = 0
    val it = data.elements()
    while (it.hasNext) {
      val node = it.next().asInstanceOf[ObjectNode]
      val id = node.get("__id__").asText()
      val fields = node.deepCopy[ObjectNode]()
      fields.remove("__id__")
      val vec = java.util.Arrays.copyOfRange(matrix, i * dim, (i + 1) * dim)
      rows += Row(id, vec.toSeq, mapper.writeValueAsString(fields))
      i += 1
    }
    val schema = StructType(Seq(
      StructField(VectorStore.IdCol, StringType, nullable = false),
      StructField(VectorStore.VectorCol, ArrayType(FloatType, containsNull = false)),
      StructField("fields_json", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)
    val ad = Option(root.get("additional_data")).map { n =>
      val b = Map.newBuilder[String, com.fasterxml.jackson.databind.JsonNode]
      val props = n.properties().iterator()
      while (props.hasNext) {
        val e = props.next()
        b += (e.getKey -> e.getValue)
      }
      b.result()
    }.getOrElse(Map.empty[String, com.fasterxml.jackson.databind.JsonNode])
    VectorStore(df, dim, "cosine", ad)
  }

  /** Write a VectorStore as a reference-format file (driver-side collect —
    * bounded by the format's own single-file design). Vectors are already
    * unit-normalized in the store, matching the reference's matrix. */
  def write(store: VectorStore, file: String): Unit = {
    val fieldCols = store.df.columns.filterNot(c =>
      c == VectorStore.IdCol || c == VectorStore.VectorCol)
    val collected = store.df
      .select(
        col(VectorStore.IdCol),
        col(VectorStore.VectorCol).cast(ArrayType(FloatType)),
        to_json(struct(fieldCols.map(col): _*)).as("fields_json"))
      .collect()
    val root = mapper.createObjectNode()
    root.put("embedding_dim", store.embeddingDim)
    val dataArr = root.putArray("data")
    val matrix = new ArrayBuffer[Float](collected.length * store.embeddingDim)
    collected.foreach { r =>
      val obj = mapper.readTree(r.getString(2)).asInstanceOf[ObjectNode]
      // a store built by read() carries its metadata as one fields_json
      // string column — re-flatten it so file -> store -> file round
      // trips preserve the reference layout instead of nesting
      Option(obj.get("fields_json")).filter(_.isTextual).foreach { fj =>
        obj.remove("fields_json")
        val inner = mapper.readTree(fj.asText())
        if (inner.isObject) obj.setAll[ObjectNode](inner.asInstanceOf[ObjectNode])
      }
      val rec = mapper.createObjectNode()
      rec.put("__id__", r.getString(0))
      rec.setAll[ObjectNode](obj)
      dataArr.add(rec)
      matrix ++= r.getSeq[Float](1)
    }
    root.put("matrix", encodeMatrix(matrix.toArray))
    if (store.additionalData.nonEmpty) {
      val ad = root.putObject("additional_data")
      // values are JsonNodes — set() embeds them as-is, so nested
      // objects/arrays survive the reference-format round trip
      store.additionalData.toSeq.sortBy(_._1)
        .foreach { case (k, v) => ad.set[ObjectNode](k, v) }
    }
    Files.writeString(Paths.get(file), mapper.writeValueAsString(root))
  }
}
