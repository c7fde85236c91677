package graft.operators

/** Sharded HNSW serving replica: the corpus id-hash-partitioned into
  * independent [[HnswReplica]] graphs, queried in PARALLEL and merged.
  *
  * Why shard an in-process index at all: HNSW recall on high-dimensional
  * weakly-structured data degrades sharply with graph size (distance
  * concentration — measured on the 1024-dim uniform microbench:
  * recall@10 at ef=64 is ~0.96 for a 12.5k graph but ~0.67 for a 100k
  * graph at the same m/efConstruction), while every EXACT tier in this
  * library is partition-parallel. Sharding converts graph size into
  * parallelism: each shard searches its own small graph — so per-shard
  * recall is the small-graph recall — and the union of per-shard top-k
  * supersets the global top-k candidates, so UNION recall matches the
  * small-graph recall while wall latency is one small-graph search
  * (shards run on the common pool). This is also the shape a
  * distributed serving fleet has (each replica owns a shard, queries
  * fan out, merge top-k), collapsed into one process.
  *
  * Routing is by id hash (not round-robin), so [[add]] upserts and
  * [[markDeleted]] land on the shard that owns the id — the same
  * pure-key routing discipline as every bucketed tier. Scores obey the
  * same fidelity contract as [[HnswReplica]]: each shard re-scores its
  * survivors with the exact double kernel, and the merge uses the exact
  * tiers' (score DESC, id ASC) order — approximation affects only which
  * ids the beams surface.
  */
final class HnswShards private (
    private val shards: Array[HnswReplica], val dim: Int)
  extends HnswMaintainable {

  def nShards: Int = shards.length
  def nRows: Long = shards.iterator.map(_.nRows).sum
  def nTombstones: Long = shards.iterator.map(_.nTombstones).sum

  // per-shard dirty-since-last-save flags (single-writer contract, like
  // the underlying graphs) + the path the flags are relative to
  private val dirty = Array.fill(shards.length)(true)
  private var savedTo: String = null

  private def shardOf(id: String): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(id, 0x48534852),
      shards.length)

  /** Approximate top-k cosine: every shard runs its own beam (same `ef`
    * each — `ef` is a per-shard knob) concurrently on the common pool;
    * exact-scored per-shard results merge under the exact order. The
    * O4/threshold gates push into each shard's search. */
  def query(queryVec: Array[Float], topK: Int, ef: Int = 64,
      betterThan: Option[Double] = None,
      allowedIds: Option[Set[String]] = None): Array[(String, Double)] = {
    val per = new Array[Array[(String, Double)]](shards.length)
    java.util.stream.IntStream.range(0, shards.length).parallel().forEach { si =>
      per(si) = shards(si).query(queryVec, topK, ef, betterThan, allowedIds)
    }
    per.iterator.flatten.map { case (id, s) => (s, id) }.toArray
      .sorted(MatrixStore.worstFirst).take(topK).map { case (s, id) => (id, s) }
  }

  /** Route each row to its id-hash shard and insert; shards ingest their
    * sub-batches in parallel (each shard is single-writer, and distinct
    * shards share no state). Upsert/tombstone semantics per shard are
    * [[HnswReplica.add]]'s. */
  def add(batch: Seq[(String, Array[Float])]): Unit = {
    val routed = batch.groupBy { case (id, _) => shardOf(id) }
    java.util.stream.IntStream.range(0, shards.length).parallel().forEach { si =>
      routed.get(si).foreach { rows => shards(si).add(rows); dirty(si) = true }
    }
  }

  def markDeleted(dropIds: Seq[String]): Unit =
    dropIds.groupBy(shardOf).foreach { case (si, ids) =>
      shards(si).markDeleted(ids)
      dirty(si) = true
    }

  /** Tombstone GC: rebuild every shard whose tombstone fraction exceeds
    * `maxTombFrac` from its LIVE rows only (same m/efConstruction/seed,
    * so levels re-derive deterministically for the surviving rows).
    * Tombstones are correct to serve through — the graph routes via
    * them — but they cost memory and beam steps forever; production
    * HNSW practice is exactly this rebuild-on-a-maintenance-cadence.
    * Per-shard cost ∝ shard size (small by construction), and only
    * offending shards rebuild — the sharded twin of `ivfMaintain`.
    * Returns the rebuilt shard indices. NOT safe concurrent with
    * queries (swap or quiesce, same single-writer contract as add). */
  def maintain(maxTombFrac: Double = 0.2): Seq[Int] = {
    require(maxTombFrac > 0 && maxTombFrac < 1, "maxTombFrac must be in (0,1)")
    val hit = shards.indices.filter { si =>
      val total = shards(si).nRows + shards(si).nTombstones
      total > 0 && shards(si).nTombstones.toDouble / total > maxTombFrac
    }
    hit.foreach { si =>
      val (m, efc, seed) = shards(si).buildParams
      val (liveIds, liveVec) = shards(si).liveRows
      shards(si) = HnswReplica.build(liveIds, liveVec, dim, m, efc, seed)
      dirty(si) = true
    }
    hit
  }

  /** Re-shard to a new shard count: every shard's LIVE rows re-route
    * under the new modulus and per-shard graphs rebuild (same
    * m/efConstruction, per-shard seeds re-derived), returning a NEW
    * instance — the old one stays valid for serving until the caller
    * swaps the handle (same atomic-swap discipline as
    * [[LocalMatrixStore.refresh]]). This is the size-drift maintenance
    * [[maintain]] can't do: tombstone GC keeps per-shard graphs clean,
    * but after heavy growth/shrink the per-shard row count leaves the
    * recall-calibrated knee ([[HnswShards.defaultShards]]) — growth
    * degrades recall (bigger graphs), shrink wastes fan-out. Cost is a
    * full rebuild ∝ corpus, so callers gate it on [[needsReshard]];
    * tombstones do not survive (the new graphs hold live rows only). */
  def reshard(newShards: Int): HnswShards = {
    require(newShards >= 1, "newShards must be >= 1")
    val (m, efc, seed0) = shards(0).buildParams
    val perShard = shards.map(_.liveRows)
    val total = perShard.iterator.map(_._1.length).sum
    val allIds = new Array[String](total)
    val flat = new Array[Float](total * dim)
    var off = 0
    perShard.foreach { case (ids, vecs) =>
      System.arraycopy(ids, 0, allIds, off, ids.length)
      System.arraycopy(vecs, 0, flat, off * dim, vecs.length)
      off += ids.length
    }
    HnswShards.build(allIds, flat, dim, newShards, m, efc, seed0)
  }

  /** Recommended shard count after drift, or None while the current
    * count is within `slack` of [[HnswShards.defaultShards]]'s sizing
    * for the live row count — the gate for [[reshard]], checkable every
    * maintenance cadence for the cost of two longs. */
  def needsReshard(slack: Double = 2.0): Option[Int] = {
    require(slack > 1.0, "slack must be > 1")
    val live = nRows
    val ideal = HnswShards.defaultShards(live)
    val perShard = live.toDouble / nShards
    val idealPer = live.toDouble / ideal
    if (ideal != nShards && (perShard > idealPer * slack || perShard < idealPer / slack))
      Some(ideal)
    else None
  }

  /** Persist every shard under `path/shard=<i>/` plus a sidecar pinning
    * the shard count and dim — same cold-start story as
    * [[HnswReplica.save]], sharded. A FULL save; see [[saveDelta]] for
    * the incremental twin. Shard directories beyond the current count
    * (left over when a [[reshard]] shrank the layout saved here before)
    * are removed, so the directory always equals the sidecar. */
  def save(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    shards.zipWithIndex.foreach { case (h, si) =>
      h.save(spark, s"$path/shard=$si")
    }
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.listStatus(root).foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("shard=") && nm.drop(6).toIntOption.exists(_ >= shards.length))
        fs.delete(st.getPath, true)
    }
    VectorStore.writeSidecar(spark, s"$path/_hnsw_shards.json",
      s"""{"dim": $dim, "n_shards": ${shards.length}}""")
    java.util.Arrays.fill(dirty, false)
    savedTo = path
  }

  /** Incremental persistence: rewrite ONLY the shards touched (add /
    * markDeleted / maintain) since the last save to the SAME path —
    * cost ∝ churn, not corpus, which is what a streaming-maintained
    * serving artifact needs on its checkpoint cadence. Falls back to a
    * full [[save]] when this instance has never saved to `path` (the
    * dirty flags are only meaningful relative to a known on-disk
    * state). Returns the shard indices rewritten. */
  def saveDelta(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Int] = {
    if (savedTo != path) { save(spark, path); return shards.indices }
    val touched = shards.indices.filter(dirty(_))
    touched.foreach { si =>
      shards(si).save(spark, s"$path/shard=$si")
      dirty(si) = false
    }
    touched
  }
}

/** Atomic serving handle with the reshard gate ON the ingest cadence:
  * queries always read the CURRENT sharded graph; [[add]] inserts into
  * it and then checks [[HnswShards.needsReshard]] — when size drift
  * leaves the recall-calibrated knee, the rebuild runs on the ingest
  * thread and the finished instance swaps in atomically, so query
  * threads never see a half-built layout and never block on the
  * rebuild (the same swap discipline as `LocalMatrixStore.refresh`).
  * Implements [[HnswMaintainable]], so the existing streaming twins
  * (`StreamingOps.upsertStreamWithHnsw` / `tombstoneStreamHnsw`) drive
  * the full grow-past-the-knee → reshard → keep-serving loop with no
  * extra plumbing.
  *
  * Concurrency contract: MUTATIONS SERIALIZE ON THE HANDLE (`add` and
  * `markDeleted` synchronize), because the upsert and tombstone twins
  * are separate streaming queries = separate threads — an
  * unsynchronized delete could land on a superseded instance after a
  * reshard swap and be lost, and concurrent add/markDeleted would
  * violate the underlying graphs' single-writer regime. The lock also
  * means a tombstone batch waits out an in-flight reshard — bounded by
  * one rebuild. Reads stay lock-free on the atomic reference.
  * `resharded` counts swaps for observability. */
final class HnswShardsServing(initial: HnswShards, slack: Double = 2.0)
  extends HnswMaintainable {
  require(slack > 1.0, "slack must be > 1")
  private val ref = new java.util.concurrent.atomic.AtomicReference(initial)
  private val swaps = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The instance currently serving (for save/maintain/inspection). */
  def current: HnswShards = ref.get()
  def resharded: Int = swaps.get()
  def nShards: Int = ref.get().nShards
  def nRows: Long = ref.get().nRows

  def add(batch: Seq[(String, Array[Float])]): Unit = synchronized {
    val h = ref.get()
    h.add(batch)
    h.needsReshard(slack).foreach { n =>
      ref.set(h.reshard(n))
      swaps.incrementAndGet()
    }
  }

  def markDeleted(dropIds: Seq[String]): Unit = synchronized {
    ref.get().markDeleted(dropIds)
  }

  def query(queryVec: Array[Float], topK: Int, ef: Int = 64,
      betterThan: Option[Double] = None,
      allowedIds: Option[Set[String]] = None): Array[(String, Double)] =
    ref.get().query(queryVec, topK, ef, betterThan, allowedIds)
}

object HnswShards {

  /** Default shard sizing: ~6.25k rows per shard (the measured knee on
    * the 1024-dim uniform microbench: 16x6.25k shards reach recall@10 =
    * 0.965 at ef=256 in 10.8 ms where one 100k graph manages 0.835 at
    * ef=1024 in 49 ms) capped at 32 shards (the pool width). */
  def defaultShards(n: Long): Int =
    math.max(1, math.min(32, math.ceil(n / 6250.0).toInt))

  /** Partition `(ids, rowMajor)` by id hash and build per-shard graphs
    * concurrently. Vectors must already be L2-normalized (same contract
    * as [[HnswReplica.build]]). */
  private[operators] def build(allIds: Array[String], rowMajor: Array[Float],
      dim: Int, nShards: Int, m: Int, efConstruction: Int,
      seed: Long): HnswShards = {
    require(nShards >= 1, "nShards must be >= 1")
    def route(id: String): Int =
      math.floorMod(scala.util.hashing.MurmurHash3.stringHash(id, 0x48534852), nShards)
    val n = allIds.length
    val counts = new Array[Int](nShards)
    val routeOf = new Array[Int](n)
    var i = 0
    while (i < n) {
      val s = route(allIds(i)); routeOf(i) = s; counts(s) += 1; i += 1
    }
    val sIds = Array.tabulate(nShards)(s => new Array[String](counts(s)))
    val sVecs = Array.tabulate(nShards)(s => new Array[Float](counts(s) * dim))
    val fill = new Array[Int](nShards)
    i = 0
    while (i < n) {
      val s = routeOf(i); val p = fill(s)
      sIds(s)(p) = allIds(i)
      System.arraycopy(rowMajor, i * dim, sVecs(s), p * dim, dim)
      fill(s) = p + 1
      i += 1
    }
    val shards = new Array[HnswReplica](nShards)
    java.util.stream.IntStream.range(0, nShards).parallel().forEach { s =>
      shards(s) = HnswReplica.build(sIds(s), sVecs(s), dim, m, efConstruction,
        seed + s)
    }
    new HnswShards(shards, dim)
  }

  /** Reload a [[HnswShards.save]]d replica. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): HnswShards = {
    val pth = new org.apache.hadoop.fs.Path(s"$path/_hnsw_shards.json")
    val fs = pth.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(pth)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
    val dim = node.get("dim").asInt()
    val k = node.get("n_shards").asInt()
    val shards = Array.tabulate(k)(si => HnswReplica.load(spark, s"$path/shard=$si"))
    val h = new HnswShards(shards, dim)
    // a loaded replica is in sync with its source path: deltas from
    // here on can checkpoint back to it incrementally
    java.util.Arrays.fill(h.dirty, false)
    h.savedTo = path
    h
  }
}
