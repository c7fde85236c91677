package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorStore
import graft.sources.NanoJsonCodec

/** Interop tests for the reference's JSON/base64 single-file format
  * (/root/reference/src/lib.rs:40-71; serde tests src/lib.rs:369-425). */
class NanoJsonCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("matrix codec round-trips and is little-endian f32 (lib.rs:369-394)") {
    val m = Array(1.0f, -2.5f, 0.0f, 3.25f)
    val b64 = NanoJsonCodec.encodeMatrix(m)
    assert(NanoJsonCodec.decodeMatrix(b64).toSeq == m.toSeq)
    // hand-check endianness: 1.0f LE = 00 00 80 3f
    val bytes = java.util.Base64.getDecoder.decode(b64)
    assert((bytes(0) & 0xff, bytes(1) & 0xff, bytes(2) & 0xff, bytes(3) & 0xff) ==
      ((0x00, 0x00, 0x80, 0x3f)))
  }

  test("reads a hand-written reference-format file (lib.rs:116-147)") {
    // one row, dim 2, unit vector [0.6, 0.8], metadata color=red
    val b64 = NanoJsonCodec.encodeMatrix(Array(0.6f, 0.8f))
    val json =
      s"""{"embedding_dim": 2,
         | "data": [{"__id__": "v1", "color": "red"}],
         | "matrix": "$b64",
         | "additional_data": {"version": "0.1.1"}}""".stripMargin
    val f = Files.createTempFile("nano", ".json")
    Files.writeString(f, json)
    val st = NanoJsonCodec.read(spark, f.toString)
    assert(st.embeddingDim == 2)
    assert(st.additionalDataStrings == Map("version" -> "0.1.1"))
    val row = st.df.head()
    assert(row.getAs[String]("__id__") == "v1")
    assert(row.getAs[scala.collection.Seq[Float]]("vector").toSeq == Seq(0.6f, 0.8f))
    assert(row.getAs[String]("fields_json").contains("\"color\":\"red\""))
  }

  test("DSv2 source: spark.read.format(\"nanojson\") matches the driver codec") {
    val b64 = NanoJsonCodec.encodeMatrix(Array(0.6f, 0.8f, 1.0f, 0.0f))
    val json =
      s"""{"embedding_dim": 2,
         | "data": [{"__id__": "v1", "color": "red"}, {"__id__": "v2", "n": 7}],
         | "matrix": "$b64"}""".stripMargin
    val f = Files.createTempFile("nanodsv2", ".json")
    Files.writeString(f, json)
    val viaSource = spark.read.format("nanojson").load(f.toString)
      .orderBy("__id__").collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).toSeq, r.getString(2)))
    val viaCodec = NanoJsonCodec.read(spark, f.toString).df
      .orderBy("__id__").collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).toSeq, r.getString(2)))
    assert(viaSource.toSeq == viaCodec.toSeq)
    // projection works through the connector
    assert(spark.read.format("nanojson").load(f.toString)
      .selectExpr("get_json_object(fields_json, '$.color')").collect()
      .map(_.getString(0)).toSet == Set("red", null))
    // column pruning reaches the scan (DSv2 pruneColumns)
    val prunedDf = spark.read.format("nanojson").load(f.toString).select("__id__")
    assert(prunedDf.queryExecution.executedPlan.toString.contains("__id__"))
    assert(!prunedDf.queryExecution.optimizedPlan.schema.fieldNames.contains("fields_json"))
    assert(prunedDf.collect().map(_.getString(0)).sorted.toSeq == Seq("v1", "v2"))
  }

  test("DSv2 write: df.write.format(\"nanojson\") round-trips through the reader") {
    val f = Files.createTempDirectory("nanowrite").resolve("db.json")
    val df = Seq(
      ("a", Seq(0.6f, 0.8f), """{"color":"red"}"""),
      ("b", Seq(1.0f, 0.0f), """{"n":7}"""))
      .toDF("__id__", "vector", "fields_json")
      .select(org.apache.spark.sql.functions.col("__id__"),
        org.apache.spark.sql.functions.col("vector").cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)).as("vector"),
        org.apache.spark.sql.functions.col("fields_json"))
    df.write.format("nanojson").mode("overwrite").save(f.toString)
    val back = spark.read.format("nanojson").load(f.toString)
      .orderBy("__id__").collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).toSeq, r.getString(2)))
    assert(back.map(t => (t._1, t._2)).toSeq ==
      Seq(("a", Seq(0.6f, 0.8f)), ("b", Seq(1.0f, 0.0f))))
    assert(back(0)._3.contains("\"color\":\"red\"") && back(1)._3.contains("\"n\":7"))
    // the file is also readable by the driver codec (true format parity)
    val st = NanoJsonCodec.read(spark, f.toString)
    assert(st.embeddingDim == 2 && st.df.count() == 2)
    // append would silently replace the single-document file — rejected
    val ex = intercept[Exception] {
      df.write.format("nanojson").mode("append").save(f.toString)
    }
    assert(ex.getMessage.contains("Overwrite"), ex.getMessage)
  }

  test("rejects corrupted files: matrix size mismatch (lib.rs:396-425)") {
    val b64 = NanoJsonCodec.encodeMatrix(Array(0.1f)) // 1 element, claim dim 2
    val json = s"""{"embedding_dim": 2, "data": [{"__id__": "a"}], "matrix": "$b64"}"""
    val f = Files.createTempFile("nanobad", ".json")
    Files.writeString(f, json)
    val ex = intercept[IllegalArgumentException] { NanoJsonCodec.read(spark, f.toString) }
    assert(ex.getMessage.contains("does not match"))
  }

  test("additional_data nested JSON survives the reference-format round trip") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val nested = mapper.readTree("""{"a":{"b":[1,2]},"n":3.5}""")
    val st = VectorStore.fromDataFrame(
      Seq(("a", Seq(3f, 4f))).toDF("id", "vec"), "id", "vec", 2)
      .withAdditionalDataJson(Map("cfg" -> nested))
    val f = Files.createTempFile("nanonest", ".json").toString
    NanoJsonCodec.write(st, f)
    val back = NanoJsonCodec.read(spark, f)
    assert(back.additionalData("cfg") == nested) // structural, not a rendering
  }

  test("store -> file -> store round trip preserves ids, vectors, metadata") {
    val st = VectorStore.fromDataFrame(
      Seq(("a", Seq(3f, 4f), "x"), ("b", Seq(0f, 5f), "y")).toDF("id", "vec", "tag"),
      "id", "vec", 2).withAdditionalData(Map("k" -> "v"))
    val f = Files.createTempFile("nanorw", ".json").toString
    NanoJsonCodec.write(st, f)
    val back = NanoJsonCodec.read(spark, f)
    assert(back.embeddingDim == 2)
    assert(back.additionalDataStrings == Map("k" -> "v"))
    val rows = back.df.collect().map(r =>
      r.getAs[String]("__id__") -> r.getAs[Seq[Float]]("vector")).toMap
    // vectors come back unit-normalized (stored normalized, lib.rs:158,173)
    assert(math.abs(rows("a")(0) - 0.6f) < 1e-5)
    assert(math.abs(rows("a")(1) - 0.8f) < 1e-5)
    assert(math.abs(rows("b")(1) - 1.0f) < 1e-5)
    // querying the reloaded store works end-to-end
    val hit = back.query(Array(3f, 4f), 1).head()
    assert(hit.getAs[String]("__id__") == "a")
  }
}
