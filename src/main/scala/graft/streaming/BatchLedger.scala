package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Applied-batch ledger for append-mode `foreachBatch` sinks — the
  * standard exactly-once discipline Structured Streaming leaves to the
  * sink. The engine checkpoint commits a batch only AFTER `foreachBatch`
  * returns, so a crash re-delivers the last batch on restart; a sink
  * that raw-appends (the persisted IVF / BQ / IVF×BQ layouts — unlike
  * the id-keyed store upsert or the content-anti-joined dedup append,
  * which are naturally idempotent) would land the same rows twice:
  * duplicate ids in probe results, double-counted lists for the skew
  * gate.
  *
  * Protocol, per batch, against a ledger directory inside the layout
  * (`<layout>/_ledger`, a sibling of the data roots so no parquet
  * reader ever lists it):
  *
  *  1. The `_lineage` stamp is checked (written on first use): a ledger
  *     serves ONE checkpoint lineage, and a MISMATCHED stream fails
  *     fast instead of silently treating its early batch ids as
  *     already applied (which would drop data with no error).
  *  2. `batch-N.applied` exists → the batch fully landed in a previous
  *     delivery; skip — `prepare` is never even evaluated.
  *  3. `batch-N.inprogress` exists → a previous delivery crashed
  *     mid-append. ROLL BACK from the marker alone: it records, for
  *     each partition directory that delivery was about to touch, the
  *     directory's pre-append file listing (or that it did not exist).
  *     Files now present but absent from the snapshot were added by
  *     the partial append and are deleted; a directory the append
  *     CREATED is removed outright, so no empty husk drifts the
  *     listing that compaction and the skew gate scan. Appends only
  *     ever add files, so the diff restores the exact pre-batch state.
  *  4. `prepare` runs: it stages the batch (e.g. assigns rows to
  *     clusters) and returns the partition directories the append will
  *     touch plus the append action itself.
  *  5. ONLY those directories are listed into `batch-N.inprogress`
  *     (JSON body, dot-staged + atomic rename) — the snapshot cost is
  *     ∝ the batch's touched dirs, NEVER ∝ the corpus. A mature layout
  *     with thousands of partition directories pays listing RPCs for
  *     just the handful this batch lands in.
  *  6. The append runs.
  *  7. Rename `batch-N.inprogress` → `batch-N.applied` (atomic).
  *
  * A crash at ANY point either left no marker (nothing appended —
  * replay just re-runs), an in-progress marker (replay rolls back and
  * re-runs; re-staging is deterministic, so the replayed batch touches
  * the same directories), or an applied marker (replay skips). Net
  * effect: each batch's rows land exactly once no matter how many
  * times the engine re-delivers it.
  *
  * Costs and contracts:
  *  - Per batch: one listing per TOUCHED partition directory (bounded
  *    by the batch's cluster/bucket fan-out and, per dir, by the
  *    compaction cadence) — no full-layout walk anywhere on the data
  *    path; marker files are a few KB of JSON.
  *  - Applied markers are retained (one tiny file per batch) and
  *    pruned beyond [[retainApplied]] behind the newest — the engine
  *    only ever re-delivers the LAST un-committed batch, so the
  *    retention is orders of magnitude beyond what replay needs.
  *  - One ledger serves ONE logical stream (one checkpoint lineage):
  *    batch ids restart at 0 under a fresh checkpoint, so re-pointing
  *    a NEW checkpoint at an existing layout requires clearing
  *    `_ledger` first. The `_lineage` stamp ENFORCES this — a
  *    mismatched stream throws on its first batch rather than
  *    silently skipping. This matches the layouts' documented
  *    single-writer contract — concurrent writers were already out of
  *    scope.
  */
private[graft] object BatchLedger {
  private val retainApplied = 1000

  /** Run an append-only write exactly once for `batchId`, per the
    * protocol above. `lineage` names the checkpoint lineage that owns
    * this ledger (the stream's checkpoint location); `prepare` stages
    * the batch and returns the partition directories the append will
    * create files under, plus the append action. Returns true if the
    * append ran, false if the batch was already applied and skipped
    * (in which case `prepare` was not evaluated). */
  def runIdempotent(spark: SparkSession, ledgerDir: String, batchId: Long,
      lineage: String)(prepare: => (Seq[String], () => Unit)): Boolean = {
    val ledger = new Path(ledgerDir)
    val fs = ledger.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(ledger)
    checkLineage(fs, ledger, ledgerDir, lineage)
    val applied = new Path(ledger, f"batch-$batchId%020d.applied")
    val inprog = new Path(ledger, f"batch-$batchId%020d.inprogress")
    if (fs.exists(applied)) return false
    if (fs.exists(inprog)) rollback(fs, inprog)
    val (touchedDirs, apply) = prepare
    val mapper = new ObjectMapper()
    val snap = mapper.createArrayNode()
    snapshotDirs(fs, touchedDirs).foreach { case (d, existing) =>
      val node = snap.addObject()
      node.put("path", d)
      node.put("existed", existing.isDefined)
      val files = node.putArray("files")
      existing.foreach(_.foreach(files.add))
    }
    writeAtomic(fs, ledger, inprog, mapper.writeValueAsString(snap),
      f".batch-$batchId%020d.tmp")
    apply()
    require(fs.rename(inprog, applied), s"finalize rename of $applied failed")
    prune(fs, ledger, batchId)
    true
  }

  /** First use stamps the lineage; later uses verify it. The stamp is
    * the fail-fast form of the one-ledger-per-checkpoint contract: a
    * fresh checkpoint re-pointed at a used layout restarts batch ids
    * at 0, and without the stamp its early batches would silently
    * match historical applied markers and be dropped. */
  private def checkLineage(fs: FileSystem, ledger: Path, ledgerDir: String,
      lineage: String): Unit = {
    val stamp = new Path(ledger, "_lineage")
    if (!fs.exists(stamp)) {
      writeAtomic(fs, ledger, stamp, lineage, "._lineage.tmp")
    } else {
      val recorded = readFully(fs, stamp)
      if (recorded != lineage) throw new IllegalStateException(
        s"ledger $ledgerDir belongs to checkpoint lineage '$recorded' but " +
          s"this stream runs under '$lineage'. Batch ids restart at 0 per " +
          "checkpoint, so reusing the ledger would silently skip this " +
          "stream's early batches. To re-point a new stream at this " +
          "layout, delete the _ledger directory first.")
    }
  }

  private def writeAtomic(fs: FileSystem, ledger: Path, dest: Path,
      body: String, tmpName: String): Unit = {
    val tmp = new Path(ledger, tmpName)
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(UTF_8)) finally out.close()
    require(fs.rename(tmp, dest), s"staging rename of $dest failed")
  }

  private def readFully(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
      new String(buf.toByteArray, UTF_8)
    } finally in.close()
  }

  /** Pre-append snapshot of the touched dirs — Some(sorted files) for
    * an existing dir, None for one the append will create. Listings run
    * on a bounded thread pool: metadata RPCs are latency-bound, and a
    * wide batch (touched dirs → nLists) pays max-latency instead of
    * sum-of-latencies. Results keep the caller's dir order. */
  private def snapshotDirs(fs: FileSystem,
      dirs: Seq[String]): Seq[(String, Option[Seq[String]])] = {
    if (dirs.isEmpty) return Seq.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, dirs.size))
    try {
      import scala.jdk.CollectionConverters._
      val tasks: Seq[java.util.concurrent.Callable[(String, Option[Seq[String]])]] =
        dirs.map { d =>
          () => {
            val p = new Path(d)
            d -> (if (fs.exists(p)) Some(listAll(fs, p).toSeq.sorted) else None)
          }
        }
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
    } finally pool.shutdown()
  }

  /** Recursive file listing of one touched partition directory. Paths
    * are stored exactly as the filesystem reports them, so the
    * rollback diff is exact. Walks with `listStatus` (one call per
    * DIRECTORY returning all children) rather than `listFiles(_, true)`,
    * whose LocatedFileStatus iterator computes block locations PER FILE
    * — measured at ~1 ms/file on the local fs, which turned the
    * pre-append snapshot of a wide layout (707 touched dirs × a few
    * files each) into seconds of pure listing; the per-dir form is one
    * metadata call per directory on every filesystem. */
  private def listAll(fs: FileSystem, dir: Path): Set[String] = {
    val b = Set.newBuilder[String]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      if (st.isDirectory) walk(st.getPath) else b += st.getPath.toString
    }
    walk(dir)
    b.result()
  }

  /** Undo a partial append recorded by an in-progress marker: a
    * directory the append created is removed whole; in a pre-existing
    * directory, every file the snapshot does not contain is deleted.
    * Then the marker drops so the caller re-applies from the restored
    * state. */
  private def rollback(fs: FileSystem, marker: Path): Unit = {
    val snap = new ObjectMapper().readTree(readFully(fs, marker))
    snap.forEach { node =>
      val dir = new Path(node.get("path").asText())
      if (!node.get("existed").asBoolean()) {
        fs.delete(dir, true)
      } else if (fs.exists(dir)) {
        val known = Set.newBuilder[String]
        node.get("files").forEach(f => known += f.asText())
        listAll(fs, dir).diff(known.result())
          .foreach(p => fs.delete(new Path(p), false))
      }
    }
    fs.delete(marker, false)
  }

  /** Drop applied markers more than [[retainApplied]] behind the batch
    * that just landed — bounded ledger growth with a replay-safety
    * margin far beyond the engine's single-batch re-delivery. */
  private def prune(fs: FileSystem, ledger: Path, batchId: Long): Unit = {
    val floor = batchId - retainApplied
    if (floor <= 0) return
    fs.listStatus(ledger).foreach { st =>
      val nm = st.getPath.getName
      if (nm.startsWith("batch-") && nm.endsWith(".applied")) {
        val id = nm.stripPrefix("batch-").stripSuffix(".applied").toLong
        if (id < floor) fs.delete(st.getPath, false)
      }
    }
  }
}
