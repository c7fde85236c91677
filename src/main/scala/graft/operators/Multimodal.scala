package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque BINARY
  * columns with typed metadata; decode / feature-extraction runs
  * per-partition over the typed Dataset.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernel is a clearly-marked deterministic STUB
  * ([[Multimodal.stubDecode]]) — but the Spark-side plumbing (schema,
  * binary handling, per-partition batching, feature normalization) is real
  * and tested, and a production decoder drops into the same seam.
  */
object Multimodal {

  /** One media record: opaque payload + typed metadata. */
  final case class MediaRow(id: Long, media: Array[Byte], mimeHint: String)

  /** Extracted features: payload stats + fixed-dim embedding. */
  final case class MediaFeatures(
      id: Long, n_bytes: Long, format: String, feature: Array[Float])

  /** Container sniffing from magic bytes — pure Catalyst expression. */
  def sniffFormat(bin: Column): Column = {
    val magic = lower(hex(substring(bin, 1, 4)))
    when(magic.startsWith("ffd8ff"), "jpeg")
      .when(magic.startsWith("89504e47"), "png")
      .when(magic.startsWith("47494638"), "gif")
      .when(magic.startsWith("52494646"), "riff") // wav/avi/webp family
      .when(magic.startsWith("664c6143"), "flac")
      .otherwise("bin")
  }

  /** STUB decoder — deterministic fake standing in for a real image/audio
    * decode (libs absent in this container). Folds the payload bytes into
    * a fixed-dim L2-normalized float vector; same bytes -> same feature.
    * Replace this function body with a real codec in production. */
  def stubDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Double](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xff) / 255.0
      i += 1
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += acc(j) * acc(j); j += 1 }
    val inv = if (ss > 0) 1.0 / math.sqrt(ss) else 0.0
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    out
  }

  /** Per-partition feature extraction over the typed Dataset — the real
    * distributed plumbing: one decoder context per partition (the
    * expensive-init pattern real codecs need), streaming the rows. */
  def decodeFeatures(ds: Dataset[MediaRow], dim: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition decoder init would go here (real codec handle)
      rows.map { r =>
        val m = r.media
        val fmt =
          if (m.length >= 3 && (m(0) & 0xff) == 0xff && (m(1) & 0xff) == 0xd8) "jpeg"
          else if (m.length >= 4 && (m(0) & 0xff) == 0x89 && m(1) == 'P' && m(2) == 'N' && m(3) == 'G') "png"
          else if (r.mimeHint.nonEmpty) r.mimeHint
          else "bin"
        MediaFeatures(r.id, m.length.toLong, fmt, stubDecode(m, dim))
      }
    }
  }

  /** Frame/chunk sampling over a binary payload: fixed-size chunk offsets
    * as a generator (explode) — the shape of video frame-sampling with the
    * frame decode stubbed to a chunk checksum. */
  def sampleChunks(df: DataFrame, idCol: String, binCol: String,
      chunkBytes: Int, maxChunks: Int, portableHash: Boolean = false): DataFrame = {
    val nChunks = least(
      ceil(length(col(binCol)).cast(DoubleType) / chunkBytes).cast(IntegerType),
      lit(maxChunks))
    // sequence(0, -1) yields the DESCENDING array [0, -1], not empty —
    // guard zero-length payloads to zero chunks explicitly
    val offsets = when(nChunks > 0, sequence(lit(0), nChunks - 1))
      .otherwise(array().cast(ArrayType(IntegerType)))
    val chunk = col(binCol).substr(col("off") * chunkBytes + 1, lit(chunkBytes))
    // portable checksum = md5 over the chunk's lowercase hex (a VARCHAR
    // digest every engine has; md5-of-BLOB is not portable); crc32 is
    // the cheaper default
    val checksum = if (portableHash) md5(lower(hex(chunk))).as("chunk_md5")
      else crc32(chunk).as("chunk_crc")
    df.select(col(idCol), col(binCol),
        posexplode(offsets).as(Seq("chunk_idx", "off")))
      .select(col(idCol), col("chunk_idx"),
        (col("off").cast(LongType) * chunkBytes).as("offset"),
        checksum)
  }
}
