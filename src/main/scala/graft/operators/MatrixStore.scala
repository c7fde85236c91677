package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.storage.StorageLevel

/** Flattened-matrix scan cache for latency-critical exact top-k.
  *
  * The reference's core layout is a dense row-major `f32` matrix scanned
  * contiguously (/root/reference/src/lib.rs:44-45,208-242;
  * docs/src/design_choices.md:5-12). The DataFrame path
  * ([[VectorStore.query]]) reproduces its *plan* — but each row passes
  * through columnar-cache decode and ArrayData accessors, a per-element
  * overhead the reference does not pay. This cache is that matrix design
  * generalized to partitions: each partition pins one primitive
  * `float[]` block plus its id array, a query is one `mapPartitions`
  * running the tight dot-product loop with a bounded per-partition heap,
  * and the driver merges P partial heaps of size k — the reference's
  * Rayon fold/reduce (lib.rs:218-242) with executors for threads. This
  * is the one deliberate use of the RDD layer in the library (genuine
  * per-partition imperative kernel; everything else is DataFrames).
  *
  * Scores are bitwise-identical to [[VectorStore.query]] on the same
  * store: the same left-to-right double accumulation over the same
  * normalized float vectors, the same inclusive threshold, NaN
  * exclusion, and (score DESC, id ASC) tie order.
  */
final class MatrixStore private (
    private val blocks: RDD[MatrixStore.Block],
    val dim: Int) extends Serializable {

  /** Exact top-k cosine query; returns (id, score) best-first. */
  def query(queryVec: Array[Float], topK: Int,
      betterThan: Option[Double] = None): Array[(String, Double)] =
    queryBatch(Seq("q" -> queryVec), topK, betterThan)("q")

  /** Batch exact top-k: every query scores against each matrix row in
    * ONE pass over the cache (rows outer, queries inner — the row's
    * elements stay hot in cache across queries). Per-(partition, query)
    * bounded heaps, merged per query on the driver; kernel semantics
    * identical to [[query]], so `queryBatch(qs)(qid)` ==
    * `query(qs(qid))` element for element. */
  def queryBatch(queries: Seq[(String, Array[Float])], topK: Int,
      betterThan: Option[Double] = None): Map[String, Array[(String, Double)]] = {
    if (queries.isEmpty) return Map.empty
    val qn: Array[Array[Double]] = queries.map(q => VectorStore.normalizeLocal(q._2)).toArray
    qn.foreach(q => require(q.length == dim, s"query dim ${q.length} != store dim $dim"))
    val thr = betterThan.getOrElse(Double.MinValue)
    val d = dim
    val k = topK
    val nq = qn.length
    val qB = blocks.sparkContext.broadcast(qn)
    val worstFirst = MatrixStore.worstFirst
    val partials = blocks.mapPartitions { it =>
      val qs = qB.value
      val heaps = Array.fill(nq)(
        scala.collection.mutable.PriorityQueue.empty[(Double, String)](worstFirst))
      it.foreach { b =>
        val m = b.matrix
        val n = b.ids.length
        var r = 0
        while (r < n) {
          val off = r * d
          var qi = 0
          while (qi < nq) {
            val qv = qs(qi)
            var s = 0.0
            var i = 0
            while (i < d) { s += m(off + i).toDouble * qv(i); i += 1 }
            if (s >= thr) {
              val heap = heaps(qi)
              val e = (s, b.ids(r))
              if (heap.size < k) heap.enqueue(e)
              else if (worstFirst.compare(e, heap.head) < 0) { heap.dequeue(); heap.enqueue(e) }
            }
            qi += 1
          }
          r += 1
        }
      }
      Iterator.single(heaps.map(_.toArray))
    }.collect()
    queries.iterator.zipWithIndex.map { case ((qid, _), qi) =>
      qid -> partials.iterator.flatMap(_(qi)).toArray.sorted(worstFirst).take(k)
        .map { case (s, id) => (id, s) }
    }.toMap
  }

  /** Release the pinned blocks. `blocking = true` waits for the executors
    * to actually free the memory — required between timed rebuilds, where
    * an async release would let the old ~N×dim×4-byte slab race the new
    * build for cache space. */
  def unpersist(blocking: Boolean = false): Unit = blocks.unpersist(blocking)
}

object MatrixStore {
  /** Worst-first heap ordering: the head is the element to evict —
    * lowest score, ties resolved worst = larger id — so the kept set is
    * exactly ORDER BY score DESC, id ASC LIMIT k. */
  private[operators] val worstFirst: Ordering[(Double, String)] =
    new Ordering[(Double, String)] {
      def compare(a: (Double, String), b: (Double, String)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else a._2.compareTo(b._2)
      }
    }

  /** One partition's slab: ids + row-major normalized float matrix. */
  final case class Block(ids: Array[String], matrix: Array[Float])

  /** Build (and pin in executor memory) the matrix cache from a store.
    * One pass; vectors are cast to float — the reference's element type
    * (lib.rs:24) — regardless of the store's oracle-path element type. */
  def fromStore(st: VectorStore): MatrixStore = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val dim = st.embeddingDim
    val spark = st.df.sparkSession
    import spark.implicits._
    val blocks = st.df
      .select(col(VectorStore.IdCol).cast(StringType),
        col(VectorStore.VectorCol).cast(ArrayType(FloatType, containsNull = false)))
      .as[(String, Array[Float])]
      .rdd
      .mapPartitions { it =>
        val ids = scala.collection.mutable.ArrayBuffer.empty[String]
        var matrix = new Array[Float](0)
        var used = 0
        it.foreach { case (id, v) =>
          require(v.length == dim, s"vector dim ${v.length} != $dim for id $id")
          if (used + dim > matrix.length) {
            val grown = new Array[Float](math.max(matrix.length * 2, (used + dim) * 2))
            System.arraycopy(matrix, 0, grown, 0, used)
            matrix = grown
          }
          System.arraycopy(v, 0, matrix, used, dim)
          used += dim
          ids += id
        }
        if (ids.isEmpty) Iterator.empty
        else Iterator.single(Block(ids.toArray, java.util.Arrays.copyOf(matrix, used)))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    blocks.count() // materialize now: queries measure scan, not build
    new MatrixStore(blocks, dim)
  }
}
