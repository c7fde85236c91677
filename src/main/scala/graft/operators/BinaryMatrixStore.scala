package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.storage.StorageLevel

/** Binary-coarse / f32-exact two-phase scan cache — the 32x compression
  * rung below the int8 tier ([[QuantizedMatrixStore]]): each partition
  * pins the [[graft.functions.SignPack]] sign-bit signatures (dim/8
  * bytes per row) NEXT TO the exact f32 slab. A query first scans the
  * signatures with an XOR+POPCNT Hamming kernel — 16 word ops per
  * 1024-dim row vs 1024 multiply-adds — to nominate `oversample * k`
  * local candidates (smallest Hamming = largest estimated cosine on
  * normalized vectors), then computes the EXACT double-accumulated f32
  * score for those candidates only. Emitted scores are bitwise-identical
  * to [[MatrixStore.query]]'s for every returned row; what is
  * approximate is candidate NOMINATION, same labeled contract as the
  * int8 tier (recall asserted in specs), never a silent replacement of
  * the exact scan.
  *
  * Why this tier exists at corpus scale: per-query coarse bytes are
  * dim/8 per row — 12.8 MB for 100k x 1024 vs 100 MB int8 codes or
  * 400 MB f32 — so the nomination scan runs at cache speed and the
  * whole-corpus coarse pass stays memory-bandwidth-feasible at 100x the
  * rows. Sign bits lose magnitude entirely, so the honest operating
  * point needs a larger oversample than int8 (default 16 vs 8);
  * the recall/latency pairs are committed in BENCH_LOCAL.
  *
  * The reference scans raw f32 only (/root/reference/src/lib.rs:321-344);
  * this is north-star scope.
  */
final class BinaryMatrixStore private (
    private val blocks: RDD[BinaryMatrixStore.BBlock],
    val dim: Int) extends Serializable {

  /** Two-phase top-k cosine: Hamming nomination + exact f32 rerank.
    * Returned (id, score) pairs carry EXACT scores in the exact order
    * ([[MatrixStore.worstFirst]] semantics). `allowedIds` is the O4
    * metadata predicate lowered to the id level, gating rows before the
    * signature scan — nomination happens among allowed rows only, so
    * the filter never costs recall. */
  def query(queryVec: Array[Float], topK: Int, oversample: Int = 16,
      allowedIds: Option[Set[String]] = None): Array[(String, Double)] = {
    require(oversample >= 1, "oversample must be >= 1")
    val qn: Array[Double] = VectorStore.normalizeLocal(queryVec)
    require(qn.length == dim, s"query dim ${qn.length} != store dim $dim")
    val qsig = BinaryMatrixStore.packLocal(qn)
    val d = dim
    val w = qsig.length
    val k = topK
    val nCand = math.max(k * oversample, k)
    val worstFirst = MatrixStore.worstFirst
    val qB = blocks.sparkContext.broadcast((qsig, qn))
    val allowedB = allowedIds.map(blocks.sparkContext.broadcast(_))
    val partials = blocks.mapPartitions { it =>
      val (qs, qd) = qB.value
      val allowed = allowedB.map(_.value).orNull
      val exactHeap = scala.collection.mutable.PriorityQueue.empty[(Double, String)](worstFirst)
      it.foreach { b =>
        BinaryMatrixStore.scanBlock(b, qs, qd, d, w, nCand, k, allowed, exactHeap, worstFirst)
      }
      Iterator.single(exactHeap.toArray)
    }.collect()
    partials.iterator.flatten.toArray.sorted(worstFirst).take(k)
      .map { case (s, id) => (id, s) }
  }

  /** Collect the slabs into a driver-local serving replica — the binary
    * two-phase kernel in-process ([[LocalBinaryMatrixStore]]). */
  def toLocal(): LocalBinaryMatrixStore =
    new LocalBinaryMatrixStore(blocks.collect(), dim)

  def unpersist(blocking: Boolean = false): Unit = blocks.unpersist(blocking)
}

/** Driver-local serving replica of a [[BinaryMatrixStore]] — the binary
  * two-phase scan with zero task-scheduling overhead: per-query coarse
  * bytes drop 32x vs [[LocalMatrixStore]] (signature scan + oversample*k
  * exact rows instead of the full f32 matrix). Kernel identical to the
  * distributed tier, so emitted scores are EXACT (bitwise-equal to
  * [[LocalMatrixStore.query]] for every id both return — spec-pinned).
  *
  * Carries the same in-process mutate surface as the graph tiers
  * ([[HnswMaintainable]]) so the streaming ingestion/tombstone twins
  * drive it unchanged: [[add]] upserts shadow the slab copy and live in
  * an overlay that is always EXACT-scored (never costs recall);
  * [[markDeleted]] tombstones hide rows immediately. The overlay is
  * serving churn between refreshes — rebuild from the store on the
  * maintenance cadence, same posture as the tombstoned graphs. The
  * trait's `ef` knob maps to the nomination oversample (both are "how
  * wide the approximate stage searches"); single-writer contract. */
final class LocalBinaryMatrixStore private[operators] (
    blocks: Array[BinaryMatrixStore.BBlock], val dim: Int) {

  // upsert overlay (id -> normalized f32 vector, the same representation
  // a refresh from the store would pin — scores must stay bitwise-equal
  // to the slab kernel's) + tombstones hiding slab copies;
  // insertion-ordered for deterministic scans
  private val extra = scala.collection.mutable.LinkedHashMap.empty[String, Array[Float]]
  private val tombstoned = scala.collection.mutable.HashSet.empty[String]

  def nRows: Long = {
    val slabLive = blocks.iterator.map { b =>
      b.ids.count(id => !tombstoned.contains(id) && !extra.contains(id)).toLong
    }.sum
    slabLive + extra.size
  }

  def nTombstones: Long = tombstoned.size.toLong

  /** Upsert (id, vector) rows into the serving overlay: the slab copy
    * (if any) is shadowed, the new vector answers from now on. The
    * vector normalizes with EXACTLY the ingest kernel's arithmetic
    * (double accumulate, per-element divide, cast to float —
    * [[graft.functions.VectorNormalize]]), so re-adding a stored row
    * reproduces its slab floats bit for bit. */
  def add(batch: Seq[(String, Array[Float])]): Unit = batch.foreach { case (id, v) =>
    require(v.length == dim, s"vector dim ${v.length} != store dim $dim")
    var ss = 0.0
    var i = 0
    while (i < dim) { ss += v(i).toDouble * v(i).toDouble; i += 1 }
    require(ss > 1e-12, "Cannot normalize a zero-magnitude vector")
    val norm = math.sqrt(ss)
    val f = new Array[Float](dim)
    i = 0
    while (i < dim) { f(i) = (v(i).toDouble / norm).toFloat; i += 1 }
    extra(id) = f
    tombstoned -= id
  }

  /** Tombstone ids: slab copies and overlay rows stop being returned
    * immediately. */
  def markDeleted(dropIds: Seq[String]): Unit = dropIds.foreach { id =>
    extra -= id
    tombstoned += id
  }

  /** [[HnswMaintainable]] adapter: lets the streaming ingestion and
    * tombstone twins (`upsertStreamWithHnsw` / `tombstoneStreamHnsw`)
    * drive this replica exactly like the graph tiers. Delegates to THIS
    * instance (shared mutation state); the trait's `ef` knob maps to
    * the nomination oversample — both are "how wide the approximate
    * stage searches". An adapter rather than a direct mixin because the
    * trait's defaulted `query(ef)` would ambiguously overload the
    * tier's defaulted `query(oversample)`. */
  def maintainable: HnswMaintainable = new HnswMaintainable {
    def nRows: Long = LocalBinaryMatrixStore.this.nRows
    def add(batch: Seq[(String, Array[Float])]): Unit =
      LocalBinaryMatrixStore.this.add(batch)
    def markDeleted(dropIds: Seq[String]): Unit =
      LocalBinaryMatrixStore.this.markDeleted(dropIds)
    def query(queryVec: Array[Float], topK: Int, ef: Int,
        betterThan: Option[Double],
        allowedIds: Option[Set[String]]): Array[(String, Double)] = {
      val res = LocalBinaryMatrixStore.this.query(queryVec, topK,
        oversample = math.max(1, ef), allowedIds = allowedIds)
      betterThan match {
        case Some(thr) => res.filter(_._2 >= thr)
        case None => res
      }
    }
  }

  /** Two-phase top-k cosine: Hamming nomination + exact f32 rerank;
    * (id, score) best-first, exact scores, [[MatrixStore.worstFirst]]
    * order. `allowedIds` gates rows before the signature scan. */
  def query(queryVec: Array[Float], topK: Int, oversample: Int = 16,
      allowedIds: Option[Set[String]] = None): Array[(String, Double)] = {
    require(oversample >= 1, "oversample must be >= 1")
    val qn: Array[Double] = VectorStore.normalizeLocal(queryVec)
    require(qn.length == dim, s"query dim ${qn.length} != store dim $dim")
    val qsig = BinaryMatrixStore.packLocal(qn)
    val d = dim
    val w = qsig.length
    val k = topK
    val nCand = math.max(k * oversample, k)
    val allowed = allowedIds.orNull
    val hidden: Set[String] =
      if (tombstoned.isEmpty && extra.isEmpty) null
      else (tombstoned ++ extra.keys).toSet
    val worstFirst = MatrixStore.worstFirst
    val partials = new Array[Array[(Double, String)]](blocks.length)
    java.util.stream.IntStream.range(0, blocks.length).parallel().forEach { bi =>
      val exactHeap = scala.collection.mutable.PriorityQueue.empty[(Double, String)](worstFirst)
      BinaryMatrixStore.scanBlock(blocks(bi), qsig, qn, d, w, nCand, k, allowed,
        exactHeap, worstFirst, banned = hidden)
      partials(bi) = exactHeap.toArray
    }
    // overlay rows: always exact-scored (a handful between refreshes —
    // including them unconditionally can only help recall)
    val extraHits = extra.iterator.collect {
      case (id, v) if allowed == null || allowed.contains(id) =>
        var s = 0.0
        var i = 0
        while (i < d) { s += v(i).toDouble * qn(i); i += 1 }
        (s, id)
    }.toArray
    (partials.iterator.flatMap(_.iterator) ++ extraHits.iterator).toArray
      .sorted(worstFirst).take(k).map { case (s, id) => (id, s) }
  }
}

object BinaryMatrixStore {
  /** One partition's slab: ids, sign-bit signatures (row-major,
    * ceil(dim/64) words per row), and the exact f32 matrix for the
    * rerank phase. */
  final case class BBlock(ids: Array[String], sigs: Array[Long], matrix: Array[Float])

  private[operators] def packLocal(v: Array[Double]): Array[Long] = {
    val out = new Array[Long]((v.length + 63) >> 6)
    var i = 0
    while (i < v.length) {
      if (v(i) >= 0.0) out(i >> 6) |= (1L << (i & 63))
      i += 1
    }
    out
  }

  /** Shared two-phase kernel over one slab: Hamming nomination into a
    * worst-at-head candidate heap, exact f32 rerank of survivors into
    * `exactHeap`. Identical between the distributed and local tiers by
    * construction (this IS the shared code). */
  private[operators] def scanBlock(b: BBlock, qsig: Array[Long], qd: Array[Double],
      d: Int, w: Int, nCand: Int, k: Int, allowed: Set[String],
      exactHeap: scala.collection.mutable.PriorityQueue[(Double, String)],
      worstFirst: Ordering[(Double, String)],
      banned: Set[String] = null): Unit = {
    val sigs = b.sigs
    val n = b.ids.length
    // phase 1: XOR+POPCNT Hamming scan, keep the nCand smallest
    // (max-Hamming at heap head gets replaced)
    val candHeap = scala.collection.mutable.PriorityQueue.empty[(Int, Int)](
      Ordering.by[(Int, Int), Int](_._1))
    var r = 0
    while (r < n) {
      if ((allowed == null || allowed.contains(b.ids(r))) &&
          (banned == null || !banned.contains(b.ids(r)))) {
        val off = r * w
        var h = 0
        var i = 0
        while (i < w) { h += java.lang.Long.bitCount(sigs(off + i) ^ qsig(i)); i += 1 }
        if (candHeap.size < nCand) candHeap.enqueue((h, r))
        else if (h < candHeap.head._1) { candHeap.dequeue(); candHeap.enqueue((h, r)) }
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

  /** Build from a store in one pass (same seam as
    * [[MatrixStore.fromStore]]); signatures use the [[graft.functions.SignPack]]
    * scheme: bit set iff element >= 0, on the already-normalized stored
    * vector. */
  def fromStore(st: VectorStore): BinaryMatrixStore = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dim = st.embeddingDim
    val w = (dim + 63) >> 6
    val spark = st.df.sparkSession
    import spark.implicits._
    val blocks = st.df
      .select(col(VectorStore.IdCol).cast(StringType),
        col(VectorStore.VectorCol).cast(ArrayType(FloatType)))
      .as[(String, Array[Float])]
      .rdd
      .mapPartitions { it =>
        val ids = scala.collection.mutable.ArrayBuffer.empty[String]
        var sigs = new Array[Long](0)
        var matrix = new Array[Float](0)
        var used = 0 // in float elements; sig offset = (used/dim)*w
        it.foreach { case (id, v) =>
          require(v.length == dim, s"vector dim ${v.length} != $dim for id $id")
          if (used + dim > matrix.length) {
            val grownM = new Array[Float](math.max(matrix.length * 2, (used + dim) * 2))
            System.arraycopy(matrix, 0, grownM, 0, used)
            matrix = grownM
            val grownS = new Array[Long](grownM.length / dim * w)
            System.arraycopy(sigs, 0, grownS, 0, used / dim * w)
            sigs = grownS
          }
          val sOff = used / dim * w
          var i = 0
          while (i < dim) {
            matrix(used + i) = v(i)
            if (v(i) >= 0.0f) sigs(sOff + (i >> 6)) |= (1L << (i & 63))
            i += 1
          }
          used += dim
          ids += id
        }
        if (ids.isEmpty) Iterator.empty
        else Iterator.single(BBlock(ids.toArray,
          java.util.Arrays.copyOf(sigs, used / dim * w),
          java.util.Arrays.copyOf(matrix, used)))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    blocks.count()
    new BinaryMatrixStore(blocks, dim)
  }
}
