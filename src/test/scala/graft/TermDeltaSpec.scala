package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.InvertedIndex

/** The term-stats DELTA protocol: deletes append negative df rows so
  * every dictionary-shaped op (suggest / fuzzy / did-you-mean / MLT's
  * df probe) stays on the vocab-sized fast path — LIVE-exact — under
  * retained tombstone debt, instead of degrading to postings counts
  * until a full compact. */
class TermDeltaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"tsd$tag").toString

  private def dict(p: String): Seq[(String, Long)] =
    InvertedIndex.termDictionary(spark, p)
      .orderBy(col("term"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  private def fs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The toy fixtures here use nBuckets = 8, so any real document's
    * term footprint is ~all buckets and the default sync gate (0.25)
    * would defer every landing — raise it to exercise the synchronous
    * path these tests pin; the deferral behavior has its own test. */
  private def withSyncFrac[A](frac: Double)(body: => A): A = {
    val key = "spark.graft.inv.tsDeltaSyncMaxFrac"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, frac.toString)
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** An index over `docs`, a debt of the first `nDel` ids tombstoned
    * (NOT compacted), and a reference index built fresh over the
    * survivors. */
  private def debtFixture(nDel: Int): (String, String) = {
    val p = tmp("debt")
    InvertedIndex.build(docs, "doc_id", "text", p, nBuckets = 8, nDocBuckets = 4)
    InvertedIndex.delete(spark, p, (0 until nDel).map(_.toString))
    val ref = tmp("ref")
    InvertedIndex.build(docs.filter(col("doc_id") >= nDel), "doc_id", "text",
      ref, nBuckets = 8, nDocBuckets = 4)
    (p, ref)
  }

  test("termDictionary under tombstone debt equals a fresh index over the survivors") {
    withSyncFrac(1.0) {
    val (p, ref) = debtFixture(25)
    assert(InvertedIndex.tombstoneCount(spark, p) == 25L, "debt must be retained")
    assert(dict(p) == dict(ref))
    }
  }

  test("dictionary ops under debt serve df from termstats, never a postings count") {
    withSyncFrac(1.0) {
    val (p, _) = debtFixture(10)
    val q = InvertedIndex.suggestTerms(spark, p, "s", k = 5)
    val scans = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.exists(_.contains("termstats")),
      s"df must come from the vocab-sized layout:\n${scans.mkString("\n")}")
    assert(!scans.exists(_.contains("postings")),
      s"a live tombstone debt must NOT force a postings count:\n${scans.mkString("\n")}")
    // and the numbers those termstats rows produce are live-exact
    val ref = tmp("sref")
    InvertedIndex.build(docs.filter(col("doc_id") >= 10), "doc_id", "text",
      ref, nBuckets = 8, nDocBuckets = 4)
    assert(q.collect().toSeq.map(r => (r.getString(0), r.getLong(1))) ==
      InvertedIndex.suggestTerms(spark, ref, "s", k = 5)
        .collect().toSeq.map(r => (r.getString(0), r.getLong(1))))
    }
  }

  test("fuzzy expansion and did-you-mean stay exact under debt") {
    withSyncFrac(1.0) {
    val (p, ref) = debtFixture(30)
    def fuzzy(path: String) = InvertedIndex.bm25FuzzyTopK(spark, path,
      Seq("sow"), k = 10, maxEdits = 1)
      .orderBy(col("bm25").desc, col("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(fuzzy(p) == fuzzy(ref))
    def dym(path: String) = InvertedIndex.didYouMean(spark, path, "spork")
      .collect().map(_.getString(0)).toSeq
    assert(dym(p) == dym(ref))
    }
  }

  test("a crash between tombstone append and delta landing replays from the tombstones") {
    withSyncFrac(1.0) {
    val (p, ref) = debtFixture(20)
    // simulate the crash state: the tombstones of the delete exist but
    // its delta generation never landed — strip the marker AND the
    // landed delta files, leaving exactly what a crash right after the
    // stats write leaves behind
    val f = fs(p)
    val markers = new org.apache.hadoop.fs.Path(s"$p/termstats/_deltas")
    assert(f.exists(markers), "a clean delete must have committed its marker")
    f.delete(markers, true)
    val tsRoot = new org.apache.hadoop.fs.Path(s"$p/termstats")
    f.listStatus(tsRoot).filter(_.isDirectory).foreach { d =>
      f.listStatus(d.getPath).map(_.getPath)
        .filter(_.getName.startsWith("tsdelta-sv"))
        .foreach(f.delete(_, false))
    }
    // the next dictionary read reconciles the pending generation itself
    assert(dict(p) == dict(ref))
    assert(f.exists(markers), "the replay must re-commit the generation marker")
    }
  }

  test("a half-committed delta attempt (files, no marker) sweeps and relands exactly") {
    withSyncFrac(1.0) {
    val (p, ref) = debtFixture(20)
    // strip ONLY the marker: the landed tsdelta files now look like a
    // partially-committed attempt; replay must not double-subtract
    fs(p).delete(new org.apache.hadoop.fs.Path(s"$p/termstats/_deltas"), true)
    assert(dict(p) == dict(ref))
    }
  }

  test("delete then append stays exact on the fast path; full compact folds the deltas") {
    withSyncFrac(1.0) {
    val p = tmp("cyc")
    InvertedIndex.build(docs.filter(col("doc_id") < 40), "doc_id", "text", p,
      nBuckets = 8, nDocBuckets = 4)
    InvertedIndex.delete(spark, p, (0 until 15).map(_.toString))
    InvertedIndex.append(spark, p,
      docs.filter(col("doc_id") >= 40 && col("doc_id") < 60), "doc_id", "text")
    val ref = tmp("cycref")
    InvertedIndex.build(
      docs.filter(col("doc_id") >= 15 && col("doc_id") < 60), "doc_id", "text",
      ref, nBuckets = 8, nDocBuckets = 4)
    assert(dict(p) == dict(ref), "debt + append must stay live-exact")
    InvertedIndex.compact(spark, p)
    assert(InvertedIndex.tombstoneCount(spark, p) == 0L)
    assert(dict(p) == dict(ref), "the post-compact recompute must fold the deltas")
    assert(!fs(p).exists(new org.apache.hadoop.fs.Path(s"$p/termstats/_deltas")),
      "a full compact retires the generation markers with the tombstones")
    }
  }

  test("partial compact keeps skipped buckets' deltas and the fast path exact") {
    withSyncFrac(1.0) {
    val p = tmp("part")
    InvertedIndex.build(docs, "doc_id", "text", p, nBuckets = 8, nDocBuckets = 4)
    InvertedIndex.delete(spark, p, (0 until 12).map(_.toString))
    // a high per-bucket fraction gate rewrites few (likely zero)
    // buckets — debt is deliberately retained
    InvertedIndex.compact(spark, p, minTombFrac = 0.9)
    val ref = tmp("partref")
    InvertedIndex.build(docs.filter(col("doc_id") >= 12), "doc_id", "text",
      ref, nBuckets = 8, nDocBuckets = 4)
    assert(dict(p) == dict(ref),
      "retained debt after a partial compact must stay live-exact " +
        "(skipped buckets keep base+delta, rewritten ones recompute live)")
    }
  }

  test("a fully-tombstoned term disappears from termDfs, like the live count") {
    withSyncFrac(1.0) {
    val spark2 = spark
    import spark2.implicits._
    val p = tmp("dead")
    val rows = Seq(("a", "unicorntoken shared"), ("b", "shared other"),
      ("c", "shared third")).toDF("doc_id", "text")
    InvertedIndex.build(rows, "doc_id", "text", p, nBuckets = 4, nDocBuckets = 2)
    InvertedIndex.delete(spark, p, Seq("a"))
    val got = InvertedIndex.termDfs(spark, p,
      Seq("unicorntoken", "shared").toDF("t"), "t")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("shared" -> 2L),
      s"dead term must be ABSENT (not df=0) and survivors exact, got $got")
    }
  }
  test("a corpus-spread delete DEFERS its deltas: exact fallback now, fast path after compact") {
    // default sync gate (0.25): on an 8-bucket index a real document's
    // terms touch every bucket, so this generation's footprint exceeds
    // the gate and the landing defers — the dictionary must fall back
    // to exact postings counts, never serve a stale fast path
    val (p, ref) = debtFixture(25)
    assert(!fs(p).exists(
      new org.apache.hadoop.fs.Path(s"$p/termstats/_deltas/sv-2")),
      "a spread generation must not land synchronously under the default gate")
    val q = InvertedIndex.suggestTerms(spark, p, "s", k = 5)
    val scans = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.exists(_.contains("postings")),
      s"a deferring generation must force the exact fallback:\n${scans.mkString("\n")}")
    assert(dict(p) == dict(ref), "the fallback is exact")
    // a compact whose rewrite covers the generation retires it — the
    // fast path returns with no landing ever having run
    InvertedIndex.compact(spark, p)
    val q2 = InvertedIndex.suggestTerms(spark, p, "s", k = 5)
    val scans2 = q2.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(!scans2.exists(_.contains("postings")),
      s"post-compact the dictionary must be back on termstats:\n${scans2.mkString("\n")}")
    assert(dict(p) == dict(ref))
  }

  test("landPendingTermDeltas lands a deferred spread generation; fast path returns exact") {
    // default sync gate: the 25-id spread delete defers its landing
    val (p, ref) = debtFixture(25)
    val f = fs(p)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$p/termstats/_deltas/sv-2")),
      "fixture must actually be deferring")
    // the explicit maintenance entry pays the landing bill on demand
    assert(InvertedIndex.landPendingTermDeltas(spark, p),
      "gate-lifted landing must leave no pending generation")
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$p/termstats/_deltas/sv-2")),
      "the generation must be marker-committed")
    // fast path restored: dictionary serves from termstats, and exactly
    val q = InvertedIndex.suggestTerms(spark, p, "s", k = 5)
    val scans = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.exists(_.contains("termstats")) &&
      !scans.exists(_.contains("postings")),
      s"explicit landing must restore the vocab-sized fast path:\n${scans.mkString("\n")}")
    assert(dict(p) == dict(ref))
    // idempotent: a second call no-ops and stays exact
    assert(InvertedIndex.landPendingTermDeltas(spark, p))
    assert(dict(p) == dict(ref))
  }

  test("compact's trailing fold sweeps unmarked residue of a deferring generation") {
    // the double-subtract hazard: a crashed landing leaves UNMARKED
    // tsdelta files for a generation the compact-entry reconcile DEFERS
    // (spread footprint) — the trailing per-bucket fold must not bake
    // those partial negatives into base rows, or the later successful
    // landing re-subtracts them in full
    val (p, ref) = debtFixture(25)
    val f = fs(p)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$p/termstats/_deltas/sv-2")),
      "fixture must be deferring (unmarked generation)")
    // plant residue exactly as a half-committed landing names it
    val someTerm = dict(ref).head._1
    val spark2 = spark
    import spark2.implicits._
    val stage = tmp("residue")
    Seq((someTerm, -1L)).toDF("term", "df")
      .coalesce(1).write.mode("overwrite").parquet(s"$stage/x")
    val part = f.listStatus(new org.apache.hadoop.fs.Path(s"$stage/x"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val bucketDir = f.listStatus(new org.apache.hadoop.fs.Path(s"$p/termstats"))
      .filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("bucket=")).head
    assert(f.rename(part,
      new org.apache.hadoop.fs.Path(bucketDir, "tsdelta-sv2-0.parquet")))
    // a partial compact retains the debt but runs the trailing fold
    InvertedIndex.compact(spark, p, minTombFrac = 0.9)
    // now land the generation for real: if the fold had baked the
    // planted residue, this subtraction would land twice
    InvertedIndex.landPendingTermDeltas(spark, p)
    assert(dict(p) == dict(ref),
      "unmarked residue must be swept, never folded into base rows")
  }

  test("delta watermark: consecutive trickle deletes keep cover current, fast path exact") {
    withSyncFrac(1.0) {
    val p = tmp("wm")
    InvertedIndex.build(docs.filter(col("doc_id") < 40), "doc_id", "text", p,
      nBuckets = 8, nDocBuckets = 4)
    InvertedIndex.delete(spark, p, Seq("0", "1", "2"))
    InvertedIndex.delete(spark, p, Seq("3", "4"))
    val f = fs(p)
    val markers = f.listStatus(
      new org.apache.hadoop.fs.Path(s"$p/termstats/_deltas"))
      .map(_.getPath.getName).toSeq
    // both generations landed, no intent outstanding, cover at the
    // CURRENT stats version (v1 build + two deletes = v3)
    assert(markers.count(_.startsWith("sv-")) == 2, markers.toString)
    assert(!markers.exists(_.startsWith("intent-")), markers.toString)
    assert(markers.contains("cover-v3"), markers.toString)
    val q = InvertedIndex.suggestTerms(spark, p, "s", k = 5)
    val scans = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.exists(_.contains("termstats")) &&
      !scans.exists(_.contains("postings")))
    val ref = tmp("wmref")
    InvertedIndex.build(docs.filter(col("doc_id") >= 5 && col("doc_id") < 40),
      "doc_id", "text", ref, nBuckets = 8, nDocBuckets = 4)
    assert(dict(p) == dict(ref))
    }
  }

  test("delta watermark: a crashed delete's unmarked generation is never trusted") {
    withSyncFrac(1.0) {
    val p = tmp("crash")
    InvertedIndex.build(docs.filter(col("doc_id") < 40), "doc_id", "text", p,
      nBuckets = 8, nDocBuckets = 4)
    InvertedIndex.delete(spark, p, Seq("0", "1")) // cover now current (v2)
    val f = fs(p)
    // simulate a SECOND delete crashing between its tombstone append
    // and its stats/marker writes: rows with sv = v+1 appear while the
    // stats version and the marker dir still describe the old world —
    // except for the intent marker the delete wrote FIRST
    val v = f.listStatus(new org.apache.hadoop.fs.Path(s"$p/_stats"))
      .map(_.getPath.getName).filter(_.startsWith("v"))
      .map(_.stripPrefix("v").stripSuffix(".json").toLong).max
    val rows = spark.read.parquet(s"$p/docstats")
      .filter(col("id").isin("2", "3"))
      .select(col("id"), col("tbuckets"), col("dl"), lit(v + 1).as("sv"))
    rows.coalesce(1).write.mode("append").parquet(s"$p/tombstones")
    f.create(new org.apache.hadoop.fs.Path(
      s"$p/termstats/_deltas/intent-sv-${v + 1}"), true).close()
    // the next dictionary read must REFUSE the listing-only trust
    // (cover matches the stats version, but the intent is outstanding),
    // take the full reconcile, land the orphan generation, and be exact
    val ref = tmp("crashref")
    InvertedIndex.build(docs.filter(col("doc_id") >= 4 && col("doc_id") < 40),
      "doc_id", "text", ref, nBuckets = 8, nDocBuckets = 4)
    assert(dict(p) == dict(ref),
      "an unmarked crashed generation must be landed, never trusted away")
    }
  }

  private def snapDirs(p: String): Seq[String] = {
    val d = new org.apache.hadoop.fs.Path(s"$p/termstats/_dictsnap")
    val f = fs(p)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).map(_.getPath.getName).filterNot(_.startsWith(".")).toSeq.sorted
  }

  test("dictionary snapshot: steady-state read is one small scan, trickle delete invalidates") {
    withSyncFrac(1.0) {
    val p = tmp("snap")
    InvertedIndex.build(docs.filter(col("doc_id") < 40), "doc_id", "text", p,
      nBuckets = 8, nDocBuckets = 4)
    // first demand builds the snapshot...
    val d1 = dict(p)
    val s1 = snapDirs(p)
    assert(s1.size == 1, s"one committed snapshot expected, got $s1")
    // ...and the steady-state read serves ONLY it: no bucket-dir walk,
    // no postings — the per-call cost is independent of nBuckets
    val q = InvertedIndex.suggestTerms(spark, p, "s", k = 5)
    val scans = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.nonEmpty && scans.forall(_.contains("_dictsnap")),
      s"steady-state dictionary must scan only the snapshot:\n${scans.mkString("\n")}")
    assert(dict(p) == d1)
    assert(snapDirs(p) == s1, "a snapshot-backed read must not rewrite the snapshot")
    // a trickle delete moves the state key: stale snapshot retired,
    // fresh one exact
    InvertedIndex.delete(spark, p, Seq("0", "1"))
    val ref = tmp("snapref")
    InvertedIndex.build(docs.filter(col("doc_id") >= 2 && col("doc_id") < 40),
      "doc_id", "text", ref, nBuckets = 8, nDocBuckets = 4)
    assert(dict(p) == dict(ref), "post-delete dictionary must be exact")
    val s2 = snapDirs(p)
    assert(s2.size == 1 && s2 != s1,
      s"the delete must retire the stale snapshot and commit a new key: $s1 -> $s2")
    }
  }

  test("dictionary snapshot: a spread (deferring) delete never snapshots the stale state") {
    val (p, ref) = debtFixture(25) // default gate: generation defers
    val before = snapDirs(p)
    assert(dict(p) == dict(ref), "fallback must be exact")
    assert(snapDirs(p) == before,
      "a non-exact dictionary read must not commit a snapshot")
  }

  test("dictionary snapshot: stats rollback (crashed delete) is keyed out, never served stale") {
    withSyncFrac(1.0) {
    val p = tmp("snaproll")
    InvertedIndex.build(docs.filter(col("doc_id") < 40), "doc_id", "text", p,
      nBuckets = 8, nDocBuckets = 4)
    val preDelete = dict(p) // snapshot committed at (v1, no generations)
    InvertedIndex.delete(spark, p, Seq("0", "1"))
    assert(dict(p) != preDelete) // snapshot committed at (v2, {2})
    // roll the stats back one version: the delete's tombstones and its
    // LANDED deltas remain, but the version the key reads is v1 again —
    // the key must differ from BOTH committed snapshots (the landed-
    // generation fold), forcing a rebuild that sees the landed deltas
    val f = fs(p)
    val names = f.listStatus(new org.apache.hadoop.fs.Path(s"$p/_stats"))
      .map(_.getPath).filter(_.getName.startsWith("v"))
      .sortBy(_.getName.stripPrefix("v").stripSuffix(".json").toLong)
    f.delete(names.last, false)
    val ref = tmp("snaprollref")
    InvertedIndex.build(docs.filter(col("doc_id") >= 2 && col("doc_id") < 40),
      "doc_id", "text", ref, nBuckets = 8, nDocBuckets = 4)
    assert(dict(p) == dict(ref),
      "a rolled-back stats version must never resurrect the pre-delete snapshot")
    }
  }
}
