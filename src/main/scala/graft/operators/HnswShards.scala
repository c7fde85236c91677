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
    val (allIds, flat, m, efc, seed0) = snapshotLive()
    HnswShards.build(allIds, flat, dim, newShards, m, efc, seed0)
  }

  /** Flatten the LIVE rows plus build params into plain arrays — the
    * cheap (memcpy ∝ corpus, zero graph work) first half of [[reshard]],
    * exposed so [[HnswShardsServing]] can take the snapshot
    * synchronously under its mutation lock and run the expensive graph
    * build from it on a background thread. */
  private[operators] def snapshotLive(): (Array[String], Array[Float], Int, Int, Long) = {
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
    (allIds, flat, m, efc, seed0)
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
  * leaves the recall-calibrated knee, a BACKGROUND rebuild starts and
  * the finished instance swaps in atomically, so query threads never
  * see a half-built layout and never block on the rebuild (the same
  * swap discipline as `LocalMatrixStore.refresh`). Implements
  * [[HnswMaintainable]], so the existing streaming twins
  * (`StreamingOps.upsertStreamWithHnsw` / `tombstoneStreamHnsw`) drive
  * the full grow-past-the-knee → reshard → keep-serving loop with no
  * extra plumbing.
  *
  * Reshard protocol (the rebuild must NOT run on the ingest thread —
  * at scale it is a full-corpus graph build, and stalling every
  * upsert/tombstone batch for its duration would back the streams up
  * by exactly the thing the gate is supposed to amortize):
  *  1. the triggering `add` snapshots the live rows under the mutation
  *     lock (memcpy ∝ corpus — the cheap half) and starts a daemon
  *     rebuild thread over the snapshot;
  *  2. mutations that arrive during the rebuild apply to the CURRENT
  *     instance as usual (serving stays fresh) and are journaled in
  *     arrival order;
  *  3. the rebuild thread, under the same lock, REPLAYS the journal
  *     into the fresh instance and swaps it in — the pause ingest can
  *     observe is ∝ mutations-during-rebuild, never ∝ corpus.
  * Snapshot + ordered replay reproduces the exact mutation history, so
  * no add or tombstone is lost across the swap; at most one rebuild is
  * in flight (the gate is skipped while one runs). A failed rebuild
  * (e.g. OOM) surfaces on [[lastReshardError]] and serving continues
  * on the current instance.
  *
  * Concurrency contract: MUTATIONS SERIALIZE ON THE HANDLE (`add` and
  * `markDeleted` synchronize), because the upsert and tombstone twins
  * are separate streaming queries = separate threads — an
  * unsynchronized delete could land on a superseded instance after a
  * reshard swap and be lost, and concurrent add/markDeleted would
  * violate the underlying graphs' single-writer regime. Reads stay
  * lock-free on the atomic reference. `resharded` counts swaps for
  * observability; [[awaitReshard]] is the barrier for callers that
  * need the swap to have landed (checkpoint/save cadences, specs).
  *
  * `preSwapHook` runs on the rebuild thread after the graph build and
  * before the journal replay + swap — a deterministic seam for
  * concurrency specs (hold the swap open, mutate, release); the
  * default is a no-op. */
final class HnswShardsServing(initial: HnswShards, slack: Double = 2.0,
    preSwapHook: () => Unit = () => ())
  extends HnswMaintainable {
  require(slack > 1.0, "slack must be > 1")
  private val ref = new java.util.concurrent.atomic.AtomicReference(initial)
  private val swaps = new java.util.concurrent.atomic.AtomicInteger(0)
  // reshard-in-flight state, all guarded by `this`
  private var journal: scala.collection.mutable.ArrayBuffer[
    Either[Seq[(String, Array[Float])], Seq[String]]] = null
  private var rebuild: Thread = null
  @volatile private var rebuildError: Throwable = null

  /** The instance currently serving (for save/maintain/inspection). */
  def current: HnswShards = ref.get()
  def resharded: Int = swaps.get()
  def nShards: Int = ref.get().nShards
  def nRows: Long = ref.get().nRows
  def reshardInFlight: Boolean = synchronized { rebuild != null }
  def lastReshardError: Option[Throwable] = Option(rebuildError)

  def add(batch: Seq[(String, Array[Float])]): Unit = synchronized {
    val h = ref.get()
    h.add(batch)
    if (rebuild != null) journal += Left(batch)
    else h.needsReshard(slack).foreach(startReshard(h, _))
  }

  def markDeleted(dropIds: Seq[String]): Unit = synchronized {
    ref.get().markDeleted(dropIds)
    if (rebuild != null) journal += Right(dropIds)
  }

  def query(queryVec: Array[Float], topK: Int, ef: Int = 64,
      betterThan: Option[Double] = None,
      allowedIds: Option[Set[String]] = None): Array[(String, Double)] =
    ref.get().query(queryVec, topK, ef, betterThan, allowedIds)

  /** Checkpoint the serving tier: barrier on any in-flight reshard
    * ([[awaitReshard]]) so the persisted artifact reflects a completed
    * swap, then delegate to the current instance's incremental
    * [[HnswShards.saveDelta]] (only shards touched since the last save
    * to `path` rewrite; a just-swapped instance has never saved, so its
    * first checkpoint is a full save). Same single-writer contract as
    * every save here: the caller keeps mutations off the handle while
    * the checkpoint writes. */
  def saveDelta(spark: org.apache.spark.sql.SparkSession, path: String): Seq[Int] = {
    awaitReshard()
    current.saveDelta(spark, path)
  }

  /** Block until no rebuild is in flight (including the journal replay
    * and swap). Call before [[HnswShards.save]]/[[HnswShards.saveDelta]]
    * on [[current]] when the persisted artifact must reflect a
    * completed reshard. */
  def awaitReshard(timeoutMillis: Long = 300000L): Unit = {
    val t = synchronized(rebuild)
    if (t != null) {
      t.join(timeoutMillis)
      require(!t.isAlive, s"reshard did not finish within ${timeoutMillis}ms")
    }
  }

  // caller holds the lock (only reached from add)
  private def startReshard(h: HnswShards, n: Int): Unit = {
    val (ids, flat, m, efc, seed) = h.snapshotLive()
    journal = scala.collection.mutable.ArrayBuffer.empty
    rebuildError = null
    val t = new Thread(() => {
      try {
        val fresh = HnswShards.build(ids, flat, h.dim, n, m, efc, seed)
        preSwapHook()
        finishReshard(fresh)
      } catch {
        case e: Throwable =>
          rebuildError = e
          HnswShardsServing.this.synchronized { journal = null; rebuild = null }
      }
    }, "hnsw-reshard")
    t.setDaemon(true)
    rebuild = t
    t.start()
  }

  // runs on the rebuild thread; the lock makes the replay+swap atomic
  // w.r.t. concurrent mutations (they either precede the replay in the
  // journal or land on the fresh instance after the swap)
  private def finishReshard(fresh: HnswShards): Unit = synchronized {
    journal.foreach {
      case Left(batch) => fresh.add(batch)
      case Right(ids)  => fresh.markDeleted(ids)
    }
    ref.set(fresh)
    swaps.incrementAndGet()
    journal = null
    rebuild = null
  }
}

object HnswShards {

  /** Default shard sizing: ~3.1k rows per shard, capped at 32 shards
    * (the pool width). Round-10 re-measurement on the 1024-dim uniform
    * microbench moved the knee down from 6.25k: at 100k rows, 32x3.1k
    * shards reach recall@10 = 1.000 at ef=256 in ~6 ms AND build 1.4x
    * faster than 16x6.25k (40 s vs 54 s at equal m/efC — a 3.1k shard
    * sits under [[HnswReplica]]'s serial-build threshold, so each
    * shard builds contention-free on its own pool thread instead of
    * nested-parallel with CAS retries, and the per-shard graph is
    * DETERMINISTIC in (data, params, seed)). One 100k graph manages
    * 0.835 at ef=1024 in 49 ms on the same data. */
  def defaultShards(n: Long): Int =
    math.max(1, math.min(32, math.ceil(n / 3125.0).toInt))

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
