package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Symmetric int8 scalar quantization for embedding columns — the
  * storage-efficiency lever at corpus scale: a 1024-dim float32
  * embedding drops from 4 KB to 1 KB (plus one double scale) with ~0.3%
  * typical relative error, which quadruples the vectors per scan byte
  * for coarse stages (ANN candidate generation, near-dup blocking)
  * while exact float vectors remain the rerank source of truth.
  *
  * All pure Column expressions over DOUBLE math with away-from-zero
  * rounding, so the full pipeline is reproduced exactly by the DuckDB
  * oracle (`emb_quantize`). The reference stores raw f32 only
  * (/root/reference/src/lib.rs:24,44-45); this is north-star scope.
  */
object Quantize {

  /** Per-vector quantization scale: 127 / max|x|. Undefined (infinite)
    * for the all-zero vector — reject zero vectors upstream, as the
    * store already does on ingest ([[VectorStore.withNormalizedVector]]
    * panics on zero-magnitude input). */
  def int8Scale(v: Column): Column =
    lit(127.0) / array_max(transform(v, x => abs(x.cast(DoubleType))))

  /** Quantize to int8 codes (carried as INT; values are in [-127, 127]
    * by construction of the scale). */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x => round(x.cast(DoubleType) * scale).cast(IntegerType))

  /** Reconstruct the approximate vector from codes + scale. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast(DoubleType) / scale)

  /** Relative reconstruction error: ||v - dequant(quant(v))|| / ||v||. */
  def relError(v: Column, scale: Column): Column = {
    val vd = v.cast(ArrayType(DoubleType))
    val diff = zip_with(vd, dequantize(quantizeInt8(vd, scale), scale), (a, b) => a - b)
    sqrt(graft.functions.VectorFunctions.dotD(diff, diff)) /
      sqrt(graft.functions.VectorFunctions.dotD(vd, vd))
  }
}
