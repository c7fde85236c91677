package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.storage.StorageLevel

/** Int8-coarse / f32-exact two-phase scan cache — the latency lever on
  * a memory-bandwidth-bound exact scan ([[MatrixStore]] measures ~40 ms
  * for 100k x 1024 f32 = 400 MB per query on this box; the scan IS the
  * floor). Each partition pins the [[Quantize]]-style int8 codes
  * (1/4 the bytes) NEXT TO the exact f32 slab: a query first scans the
  * codes with an integer dot product to nominate `oversample * k` local
  * candidates, then computes the EXACT double-accumulated f32 score for
  * those candidates only. Emitted scores are therefore bitwise-identical
  * to [[MatrixStore.query]]'s for every returned row; what is
  * approximate is candidate NOMINATION — a true top-k row ranked below
  * a partition's `oversample*k` quantized scores would be missed, so
  * this is an additive fast path with a labeled contract (recall
  * asserted in specs), never a silent replacement of the exact scan.
  *
  * Memory cost: the f32 slab plus ~25% for codes/scales. The win is
  * per-query bytes touched: codes (100 MB at 100k x 1024) plus
  * ~oversample*k*dim floats, vs the full 400 MB.
  */
final class QuantizedMatrixStore private (
    private val blocks: RDD[QuantizedMatrixStore.QBlock],
    val dim: Int) extends Serializable {

  /** Two-phase top-k cosine: int8 nomination + exact f32 rerank.
    * Returned (id, score) pairs carry EXACT scores in the exact order
    * ([[MatrixStore.worstFirst]] semantics). `allowedIds` is the O4
    * metadata predicate lowered to the id level (same contract as
    * [[MatrixStore.queryBatch]]), gating rows before the CODES scan —
    * nomination then happens among allowed rows only, so the filter
    * never costs recall. */
  def query(queryVec: Array[Float], topK: Int, oversample: Int = 8,
      allowedIds: Option[Set[String]] = None): Array[(String, Double)] = {
    require(oversample >= 1, "oversample must be >= 1")
    val qn: Array[Double] = VectorStore.normalizeLocal(queryVec)
    require(qn.length == dim, s"query dim ${qn.length} != store dim $dim")
    // quantize the normalized query symmetrically (its own scale)
    var qmax = 0.0
    qn.foreach(x => if (math.abs(x) > qmax) qmax = math.abs(x))
    val qscale = if (qmax > 0) 127.0 / qmax else 0.0
    val qq: Array[Byte] = qn.map(x => math.round(x * qscale).toByte)
    val d = dim
    val k = topK
    val nCand = math.max(k * oversample, k)
    val worstFirst = MatrixStore.worstFirst
    val qB = blocks.sparkContext.broadcast((qq, qn))
    val allowedB = allowedIds.map(blocks.sparkContext.broadcast(_))
    val partials = blocks.mapPartitions { it =>
      val (q8, qd) = qB.value
      val allowed = allowedB.map(_.value).orNull
      val exactHeap = scala.collection.mutable.PriorityQueue.empty[(Double, String)](worstFirst)
      it.foreach { b =>
        val codes = b.codes
        val n = b.ids.length
        // phase 1: integer dot over the codes, nominate local top-nCand
        // (int score ordering is scale-free per row only after applying
        // the per-row inverse scale; track the rescaled approx score)
        val candHeap = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
          Ordering.by[(Double, Int), Double](_._1).reverse) // min-heap on approx score
        var r = 0
        while (r < n) {
          if (allowed == null || allowed.contains(b.ids(r))) {
            val off = r * d
            var acc = 0
            var i = 0
            while (i < d) { acc += codes(off + i) * q8(i); i += 1 }
            val approx = acc * b.invScale(r)
            if (candHeap.size < nCand) candHeap.enqueue((approx, r))
            else if (approx > candHeap.head._1) { candHeap.dequeue(); candHeap.enqueue((approx, r)) }
          }
          r += 1
        }
        // phase 2: exact double-accumulated f32 dot for the candidates
        val m = b.matrix
        candHeap.foreach { case (_, row) =>
          val off = row * d
          var s = 0.0
          var i = 0
          while (i < d) { s += m(off + i).toDouble * qd(i); i += 1 }
          val e = (s, b.ids(row))
          if (exactHeap.size < k) exactHeap.enqueue(e)
          else if (worstFirst.compare(e, exactHeap.head) < 0) { exactHeap.dequeue(); exactHeap.enqueue(e) }
        }
      }
      Iterator.single(exactHeap.toArray)
    }.collect()
    partials.iterator.flatten.toArray.sorted(worstFirst).take(k)
      .map { case (s, id) => (id, s) }
  }

  /** Collect the slabs into a driver-local serving replica — the int8
    * two-phase kernel in-process (see [[LocalQuantizedMatrixStore]]).
    * Memory cost: the f32 matrix + ~25% codes/scales in the local JVM. */
  def toLocal(): LocalQuantizedMatrixStore =
    new LocalQuantizedMatrixStore(blocks.collect(), dim)

  def unpersist(blocking: Boolean = false): Unit = blocks.unpersist(blocking)

  // test/profiling seam — not part of the serving API
  private[operators] def blocksForProfiling: RDD[QuantizedMatrixStore.QBlock] = blocks
}

/** Driver-local serving replica of a [[QuantizedMatrixStore]] — the
  * int8 two-phase scan with zero task-scheduling overhead, cutting the
  * replica's per-query bytes ~4x vs [[LocalMatrixStore]] (codes scan +
  * oversample*k exact rows instead of the full f32 matrix). The kernel
  * is the distributed one verbatim, so emitted scores are EXACT
  * (bitwise-equal to [[LocalMatrixStore.query]] for every id both
  * return — spec-pinned); candidate nomination keeps the same labeled
  * oversample contract as the distributed tier. */
final class LocalQuantizedMatrixStore private[operators] (
    blocks: Array[QuantizedMatrixStore.QBlock], val dim: Int) {

  def nRows: Long = blocks.iterator.map(_.ids.length.toLong).sum

  /** Two-phase top-k cosine: int8 nomination + exact f32 rerank;
    * (id, score) best-first, exact scores, [[MatrixStore.worstFirst]]
    * order. `allowedIds` gates rows before the codes scan (O4 on the
    * int8 replica — same contract as the distributed tier). */
  def query(queryVec: Array[Float], topK: Int, oversample: Int = 8,
      allowedIds: Option[Set[String]] = None): Array[(String, Double)] = {
    require(oversample >= 1, "oversample must be >= 1")
    val qn: Array[Double] = VectorStore.normalizeLocal(queryVec)
    require(qn.length == dim, s"query dim ${qn.length} != store dim $dim")
    var qmax = 0.0
    qn.foreach(x => if (math.abs(x) > qmax) qmax = math.abs(x))
    val qscale = if (qmax > 0) 127.0 / qmax else 0.0
    val qq: Array[Byte] = qn.map(x => math.round(x * qscale).toByte)
    val d = dim
    val k = topK
    val nCand = math.max(k * oversample, k)
    val allowed = allowedIds.orNull
    val worstFirst = MatrixStore.worstFirst
    val partials = new Array[Array[(Double, String)]](blocks.length)
    java.util.stream.IntStream.range(0, blocks.length).parallel().forEach { bi =>
      val b = blocks(bi)
      val exactHeap = scala.collection.mutable.PriorityQueue.empty[(Double, String)](worstFirst)
      val codes = b.codes
      val n = b.ids.length
      val candHeap = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
        Ordering.by[(Double, Int), Double](_._1).reverse) // min-heap on approx score
      var r = 0
      while (r < n) {
        if (allowed == null || allowed.contains(b.ids(r))) {
          val off = r * d
          var acc = 0
          var i = 0
          while (i < d) { acc += codes(off + i) * qq(i); i += 1 }
          val approx = acc * b.invScale(r)
          if (candHeap.size < nCand) candHeap.enqueue((approx, r))
          else if (approx > candHeap.head._1) { candHeap.dequeue(); candHeap.enqueue((approx, r)) }
        }
        r += 1
      }
      val m = b.matrix
      candHeap.foreach { case (_, row) =>
        val off = row * d
        var s = 0.0
        var i = 0
        while (i < d) { s += m(off + i).toDouble * qn(i); i += 1 }
        val e = (s, b.ids(row))
        if (exactHeap.size < k) exactHeap.enqueue(e)
        else if (worstFirst.compare(e, exactHeap.head) < 0) { exactHeap.dequeue(); exactHeap.enqueue(e) }
      }
      partials(bi) = exactHeap.toArray
    }
    partials.iterator.flatMap(_.iterator).toArray
      .sorted(worstFirst).take(k).map { case (s, id) => (id, s) }
  }
}

object QuantizedMatrixStore {
  /** One partition's slab: ids, int8 codes (row-major), per-row inverse
    * scales (1 / (rowScale * queryScale) is applied as
    * invScale = 1/rowScale; the query's own scale divides out in
    * RANKING, so it is folded into neither), and the exact f32 matrix
    * for the rerank phase. */
  final case class QBlock(ids: Array[String], codes: Array[Byte],
      invScale: Array[Double], matrix: Array[Float])

  /** Build from a store in one pass (same seam as
    * [[MatrixStore.fromStore]]); codes use the [[Quantize]] scheme:
    * per-row scale 127/max|x|, away-from-zero rounding. */
  def fromStore(st: VectorStore): QuantizedMatrixStore = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dim = st.embeddingDim
    val spark = st.df.sparkSession
    import spark.implicits._
    val blocks = st.df
      .select(col(VectorStore.IdCol).cast(StringType),
        col(VectorStore.VectorCol).cast(ArrayType(FloatType)))
      .as[(String, Array[Float])]
      .rdd
      .mapPartitions { it =>
        val ids = scala.collection.mutable.ArrayBuffer.empty[String]
        val scales = scala.collection.mutable.ArrayBuffer.empty[Double]
        var codes = new Array[Byte](0)
        var matrix = new Array[Float](0)
        var used = 0
        it.foreach { case (id, v) =>
          require(v.length == dim, s"vector dim ${v.length} != $dim for id $id")
          if (used + dim > matrix.length) {
            val grownM = new Array[Float](math.max(matrix.length * 2, (used + dim) * 2))
            System.arraycopy(matrix, 0, grownM, 0, used)
            matrix = grownM
            val grownC = new Array[Byte](grownM.length)
            System.arraycopy(codes, 0, grownC, 0, used)
            codes = grownC
          }
          var mx = 0.0
          v.foreach(x => if (math.abs(x) > mx) mx = math.abs(x))
          val scale = if (mx > 0) 127.0 / mx else 0.0
          var i = 0
          while (i < dim) {
            matrix(used + i) = v(i)
            codes(used + i) = math.round(v(i).toDouble * scale).toByte
            i += 1
          }
          scales += (if (scale > 0) 1.0 / scale else 0.0)
          used += dim
          ids += id
        }
        if (ids.isEmpty) Iterator.empty
        else Iterator.single(QBlock(ids.toArray,
          java.util.Arrays.copyOf(codes, used), scales.toArray,
          java.util.Arrays.copyOf(matrix, used)))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    blocks.count()
    new QuantizedMatrixStore(blocks, dim)
  }
}
