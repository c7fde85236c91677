package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Engine-portable (md5-based) sketch kernels.
  *
  * The portable hash family is defined on the md5 HEX string so any SQL
  * engine can reproduce it: `h1 = int(hex[0:12])`, `h2 = int(hex[12:24])`
  * — i.e. the first and second 6 bytes of the digest as big-endian 48-bit
  * integers. All derived math stays below 2^53, exact in BIGINT and in
  * doubles.
  *
  * The HOF formulations of these kernels (see git history /
  * `Dedup.minhashSignaturePortable`'s Scaladoc) are semantically
  * identical but run every element through an interpreted lambda frame —
  * 30-40s on a 5000-doc corpus where these one-pass expressions take
  * well under a second. Per-row work dominates, so CodegenFallback costs
  * nothing measurable.
  */
object PortableHashes {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 6 digest bytes as a big-endian 48-bit value == BIGINT of
    * hex[0:12]; `second` reads bytes 6..11 == hex[12:24]. */
  private def h48(digest: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = off
    while (i < off + 6) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v
  }

  private[functions] def md5Of(bytes: Array[Byte]): Array[Byte] = {
    val md = md5Local.get()
    md.reset()
    md.digest(bytes)
  }

  def portableMinHash(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(PortableMinHash(ColumnBridge.expression(shingles), numHashes))

  def portableSimHash48(tokens: Column): Column =
    ColumnBridge.column(PortableSimHash48(ColumnBridge.expression(tokens)))

  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), k, w))

  def charBigramCounts(text: Column): Column =
    ColumnBridge.column(CharBigramCounts(ColumnBridge.expression(text)))

  /** MinHash update: g_k = h1 + k*h2 mins in one digest per element. */
  private[functions] def minhashUpdate(
      mins: Array[Long], bytes: Array[Byte], numHashes: Int): Unit = {
    val d = md5Of(bytes)
    val h1 = h48(d, 0)
    val h2 = h48(d, 6)
    var g = h1
    var k = 0
    while (k < numHashes) {
      if (g < mins(k)) mins(k) = g
      g += h2
      k += 1
    }
  }
}

/** Portable MinHash signature — value-identical to the HOF formulation
  * `transform(seq(0,n-1), k -> array_min(transform(shingles,
  *   s -> int48(md5hex(s)[0:12]) + k * int48(md5hex(s)[12:24]))))`
  * for any non-empty input (an EMPTY shingle array yields Long.MaxValue
  * sentinels like [[MinHashSignature]], where the HOF would yield nulls
  * — [[WordShingles]] never produces an empty array). numHashes is
  * capped at 32: g = h1 + 31*h2 < 2^53 is the largest k for which the
  * family stays exact in both BIGINT and double arithmetic. */
case class PortableMinHash(child: Expression, numHashes: Int)
  extends UnaryExpression with CodegenFallback {
  require(numHashes > 0 && numHashes <= 32,
    s"portable_minhash supports 1..32 hashes (h1 + k*h2 must stay below 2^53), got $numHashes")

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
        PortableHashes.minhashUpdate(mins, arr.getUTF8String(i).getBytes, numHashes)
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "portable_minhash"
}

/** Portable 48-bit SimHash — value-identical to voting `(h >> b) & 1`
  * per bit over `int48(md5hex(token)[0:12])`. */
case class PortableSimHash48(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.checkStringArray(child, prettyName)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val acc = new Array[Int](48)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = PortableHashes.md5Of(arr.getUTF8String(i).getBytes)
        var h = 0L
        var j = 0
        while (j < 6) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
        var b = 0
        while (b < 48) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 48) {
      if (acc(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "portable_simhash48"
}

/** Winnowing fingerprints in one pass — value-identical to the HOF
  * formulation in `TextAnalysis.winnowFingerprints`'s Scaladoc: hash
  * every `k`-code-point gram (48-bit md5 prefix), take the minimum of
  * each sliding window of `w` hashes, return the distinct minima sorted
  * ascending. Texts shorter than `k` hash whole; fewer than `w` grams
  * take the global minimum. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects STRING, got $other")
  }

  private def hashOf(s: String): Long = {
    val d = PortableHashes.md5Of(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.toString
    val cps = s.codePoints().toArray // substring semantics = code points
    val n = cps.length
    val hashes: Array[Long] =
      if (n < k) Array(hashOf(s))
      else {
        val out = new Array[Long](n - k + 1)
        var i = 0
        while (i <= n - k) { out(i) = hashOf(new String(cps, i, k)); i += 1 }
        out
      }
    val m = hashes.length
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (m < w) {
      var min = Long.MaxValue
      var i = 0
      while (i < m) { if (hashes(i) < min) min = hashes(i); i += 1 }
      selected.add(min)
    } else {
      // monotonic deque: O(m) sliding-window minima
      val deque = new java.util.ArrayDeque[Int]()
      var i = 0
      while (i < m) {
        while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(i)) deque.pollLast()
        deque.addLast(i)
        if (deque.peekFirst() <= i - w) deque.pollFirst()
        if (i >= w - 1) selected.add(hashes(deque.peekFirst()))
        i += 1
      }
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "winnow_fingerprints"
}

/** Per-row character-bigram counts as a MAP<STRING, BIGINT> — one pass
  * over the code points. Value-identical to exploding every overlapping
  * 2-code-point substring and counting per (row, bigram), but the
  * occurrence fan-out (text length rows per doc) never leaves the row:
  * downstream consumers explode an already-distinct map. Texts shorter
  * than 2 code points count the whole text once. */
case class CharBigramCounts(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(StringType, LongType, valueContainsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_bigram_counts expects STRING, got $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val s = v.toString
    val cps = s.codePoints().toArray
    val counts = new java.util.LinkedHashMap[String, Long]()
    if (cps.length < 2) {
      counts.put(s, 1L)
    } else {
      var i = 0
      while (i < cps.length - 1) {
        val g = new String(cps, i, 2)
        counts.merge(g, 1L, (a, b) => a + b)
        i += 1
      }
    }
    val keys = new Array[Any](counts.size)
    val vals = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = org.apache.spark.unsafe.types.UTF8String.fromString(e.getKey)
      vals(j) = e.getValue
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "char_bigram_counts"
}
