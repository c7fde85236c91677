package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Single-pass text sketch expressions.
  *
  * The composable HOF formulations (`transform(seq, s -> array_min(
  * transform(shingles, t -> xxhash64(t, s))))`) re-walk the shingle array
  * once per hash seed through interpreted lambdas. These expressions do
  * one pass over the UTF8 bytes per row: 2 base hashes per shingle, then
  * cheap per-seed mixing — the standard g_k(x) = h1(x) + k*h2(x) MinHash
  * family and a 64-bit SimHash. Per-row work is trivial, so
  * CodegenFallback costs nothing measurable here; the win is algorithmic.
  */
object TextHashes {
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(shingles), numHashes))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))

  private[functions] def checkStringArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name expects ARRAY<STRING>, got $other")
    }

  private[functions] final val Seed1 = 0x9747b28c00000000L
  private[functions] final val Seed2 = 0x7fb5d329283f0b17L
}

/** Distinct word n-gram shingles in one pass.
  *
  * Exactly equivalent to the composable formulation
  * `array_distinct(transform(sequence(0, size(toks)-n),
  *   i -> concat_ws(" ", slice(toks, i+1, n))))` with
  * `toks = split(text, " ")` — including empty tokens from repeated /
  * trailing separators (split keeps them) and first-occurrence distinct
  * order — but without materializing the token array or running n
  * interpreted lambda frames per shingle. Texts shorter than n words
  * yield [text], so they can still hash-match exactly.
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {
  require(n > 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"word_shingles expects STRING, got $other")
    }

  override def nullSafeEval(v: Any): Any = {
    val text = v.toString
    val toks = text.split(" ", -1) // keep empties: parity with split(text,' ')
    if (toks.length < n) {
      new GenericArrayData(Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(text)))
    } else {
      val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) {
        out(k) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
        k += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** MinHash signature: element k = min over shingles of h1 + k*h2. */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {
  require(numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.checkStringArray(child, prettyName)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, TextHashes.Seed1)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, TextHashes.Seed2)
        var k = 0
        var g = h1
        while (k < numHashes) {
          if (g < mins(k)) mins(k) = g
          g += h2
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** 64-bit SimHash fingerprint over a token array. */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.checkStringArray(child, prettyName)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, TextHashes.Seed1)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}
