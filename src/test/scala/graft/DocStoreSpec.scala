package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.InvertedIndex

/** The doc-store SPLIT: text + stored columns live in their own
  * `docstore/` root, so a delete's ledger rewrite never carries
  * document bytes — the store's dead rows stay hidden behind the
  * tombstone anti-join and sweep at compact, never resurrecting. */
class DocStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"dstr$tag").toString

  private def fs(p: String) = new org.apache.hadoop.fs.Path(p)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def storeFiles(p: String): Set[String] = {
    val f = fs(p)
    val root = new org.apache.hadoop.fs.Path(s"$p/docstore")
    if (!f.exists(root)) Set.empty
    else f.listStatus(root).filter(_.isDirectory).flatMap(d =>
      f.listStatus(d.getPath).filter(_.isFile)
        .map(s => s"${d.getPath.getName}/${s.getPath.getName}|${s.getLen}")).toSet
  }

  private def fetched(p: String): Seq[(String, Long, String)] =
    InvertedIndex.fetchDocs(spark, p,
        docs.select(col("doc_id")).limit(2000))
      .orderBy(col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq

  test("delete rewrites the thin ledger only: docstore files stay byte-identical") {
    val p = tmp("del")
    InvertedIndex.build(docs, "doc_id", "text", p, nBuckets = 8,
      nDocBuckets = 4, storeText = true, storeCols = Seq("lang"))
    val before = storeFiles(p)
    assert(before.nonEmpty)
    InvertedIndex.delete(spark, p, (0 until 30).map(_.toString))
    assert(storeFiles(p) == before,
      "a delete must not rewrite (or even touch) the doc store — " +
        "that is the point of splitting it from the ledger")
    // ... while the store READS are live-exact (tombstones hide rows)
    val got = fetched(p)
    assert(got.map(_._1).toSet ==
      docs.filter(col("doc_id") >= 30).select(col("doc_id").cast("string"))
        .collect().map(_.getString(0)).toSet)
  }

  test("retired tombstones go store-dead: hidden without a rewrite, swept on demand") {
    val p = tmp("cmp")
    InvertedIndex.build(docs, "doc_id", "text", p, nBuckets = 8,
      nDocBuckets = 4, storeText = true)
    val before = storeFiles(p)
    InvertedIndex.delete(spark, p, (0 until 30).map(_.toString))
    InvertedIndex.compact(spark, p)
    assert(InvertedIndex.tombstoneCount(spark, p) == 0L,
      "full compact must clear the debt")
    // with the tombstone anti-join gone, the DEAD LIST keeps the rows
    // hidden — and because 30 dead / ~500 live is under the 0.1 sweep
    // gate, the store dirs themselves are byte-untouched (a small
    // cohort's compact must never rewrite a corpus of text)
    val f = fs(p)
    val deadDir = new org.apache.hadoop.fs.Path(s"$p/docstore/_dead")
    assert(f.exists(deadDir), "retired ids must be listed store-dead")
    assert(storeFiles(p).filterNot(_.contains("_dead")) == before,
      "below the sweep gate, compact must not rewrite any store dir")
    val got = fetched(p)
    assert(!got.exists(_._1.toLong < 30),
      "a dead doc must not resurrect from the store once tombstones clear")
    assert(got.size == docs.count().toInt - 30)
    val want = docs.filter(col("doc_id") >= 30)
      .select(col("doc_id").cast("string"), col("text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.forall { case (id, _, text) => want(id) == text })
    // the physical sweep is the deferred bill: dirs rewrite, list clears
    InvertedIndex.sweepDocStore(spark, p)
    assert(!f.exists(deadDir), "sweep must clear the dead list")
    assert(fetched(p) == got, "sweep must not change what readers see")
  }

  test("re-appending a store-dead id auto-sweeps its old row: served exactly once") {
    val p = tmp("rap")
    InvertedIndex.build(docs, "doc_id", "text", p, nBuckets = 8,
      nDocBuckets = 4, storeText = true)
    InvertedIndex.delete(spark, p, Seq("5", "6"))
    InvertedIndex.compact(spark, p) // retires the tombstones -> store-dead
    val f = fs(p)
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$p/docstore/_dead")))
    // delete, compact, re-append is ONE step: the clash auto-sweeps
    val spark2 = spark
    import spark2.implicits._
    val batch = Seq(("5", "replacement text five")).toDF("doc_id", "text")
    InvertedIndex.append(spark, p, batch, "doc_id", "text")
    val got = InvertedIndex.fetchDocs(spark, p,
      batch.select(col("doc_id"))).collect()
    assert(got.length == 1 && got(0).getString(2) == "replacement text five",
      "the re-appended doc serves its NEW text exactly once")
    // the non-clashing dead id stays listed (and hidden)
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$p/docstore/_dead")),
      "pruning the clash must not clear the other dead ids")
    assert(InvertedIndex.fetchDocs(spark, p, Seq("6").toDF("id")).isEmpty)
    // sweepDocStore clears the remainder
    InvertedIndex.sweepDocStore(spark, p)
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$p/docstore/_dead")))
    assert(InvertedIndex.fetchDocs(spark, p, Seq("6").toDF("id")).isEmpty)
  }

  test("append lands full rows in the store; fetch serves old and new") {
    val p = tmp("app")
    InvertedIndex.build(docs.filter(col("doc_id") < 40), "doc_id", "text", p,
      nBuckets = 8, nDocBuckets = 4, storeText = true, storeCols = Seq("source"))
    InvertedIndex.append(spark, p,
      docs.filter(col("doc_id") >= 40 && col("doc_id") < 80), "doc_id", "text")
    val got = InvertedIndex.fetchDocs(spark, p,
        docs.filter(col("doc_id") < 80).select(col("doc_id")),
        withCols = Seq("source"))
      .collect().map(r => (r.getString(0), r.getString(2), r.getString(3))).toSeq
    val want = docs.filter(col("doc_id") < 80)
      .select(col("doc_id").cast("string"), col("text"), col("source"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got.sortBy(_._1) == want.sortBy(_._1))
  }

  test("addDocStore backfills a fresh store root atomically; ledger untouched") {
    val p = tmp("bf")
    InvertedIndex.build(docs, "doc_id", "text", p, nBuckets = 8, nDocBuckets = 4)
    val f = fs(p)
    def ledgerFiles: Set[String] = {
      val root = new org.apache.hadoop.fs.Path(s"$p/docstats")
      f.listStatus(root).filter(_.isDirectory).flatMap(d =>
        f.listStatus(d.getPath).filter(_.isFile)
          .map(s => s"${d.getPath.getName}/${s.getPath.getName}|${s.getLen}")).toSet
    }
    val ledgerBefore = ledgerFiles
    InvertedIndex.addDocStore(spark, p, docs, "doc_id", "text")
    assert(ledgerFiles == ledgerBefore,
      "backfilling text must not rewrite the thin ledger")
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$p/docstore")))
    val got = fetched(p)
    assert(got.size == docs.count().toInt)
  }

  test("addDocStore onto a storeCols index adds text in place, keeps the columns") {
    val p = tmp("bf2")
    InvertedIndex.build(docs, "doc_id", "text", p, nBuckets = 8,
      nDocBuckets = 4, storeCols = Seq("lang"))
    InvertedIndex.addDocStore(spark, p, docs, "doc_id", "text")
    val got = InvertedIndex.fetchDocs(spark, p,
        docs.select(col("doc_id")).limit(5), withCols = Seq("lang"))
      .collect()
    assert(got.nonEmpty && got.forall(r =>
      r.getString(2).nonEmpty && r.getString(3).nonEmpty))
  }

  test("a stored-field sidecar without a docstore root fails fast, never serves empty") {
    val p = tmp("presplit")
    InvertedIndex.build(docs.filter(col("doc_id") < 40), "doc_id", "text", p,
      nBuckets = 8, nDocBuckets = 4, storeText = true, storeCols = Seq("lang"))
    // simulate the PRE-SPLIT on-disk shape: stores_text=true in the
    // sidecar but no docstore/ layout
    fs(p).delete(new org.apache.hadoop.fs.Path(s"$p/docstore"), true)
    val e1 = intercept[IllegalArgumentException] {
      InvertedIndex.fetchDocs(spark, p, docs.select(col("doc_id")).limit(5)).collect()
    }
    assert(e1.getMessage.contains("docstore") &&
      e1.getMessage.contains("addDocStore"),
      s"must direct to rebuild/migrate, got: ${e1.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      InvertedIndex.facetCountsStored(spark, p, Seq("lang"),
        terms = Seq("the"), matchAll = false).collect()
    }
    assert(e2.getMessage.contains("docstore"))
  }

  test("BM25F two-field group: delete -> compact -> re-append -> sweep stays coherent") {
    val spark2 = spark
    import spark2.implicits._
    val base = docs.filter(col("doc_id") < 60)
      .select(col("doc_id"), substring_index(col("text"), " ", 4).as("title"),
        col("text").as("body"))
    val p1 = tmp("f1"); val p2 = tmp("f2")
    InvertedIndex.build(base, "doc_id", "title", p1, nBuckets = 8,
      nDocBuckets = 4, storeText = true)
    InvertedIndex.build(base, "doc_id", "body", p2, nBuckets = 8,
      nDocBuckets = 4, storeText = true)
    val fields = Seq((p1, 2.0, 0.5), (p2, 1.0, 0.75))
    val qterms = base.select(col("body")).as[String].head().split(" ").take(2).toSeq
    def top(fs2: Seq[(String, Double, Double)]): Seq[(String, Double)] =
      InvertedIndex.bm25fTopK(spark, fs2, qterms, k = 10)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    def storeFp(): Seq[(String, Long, String)] =
      InvertedIndex.fetchDocs(spark, p1, base.select(col("doc_id")))
        .orderBy(col("id"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(top(fields).nonEmpty, "fixture query must hit")
    val n0 = storeFp().size

    // 1. DELETE across the group: coherence holds (same n_docs, same
    //    corpus fingerprint), deleted ids vanish from scoring AND store
    val delIds = (0 until 10).map(_.toString)
    InvertedIndex.deleteFields(spark, Seq(p1, p2), delIds)
    val afterDel = top(fields)
    assert(afterDel.forall { case (id, _) => !delIds.contains(id) })
    assert(storeFp().size == n0 - 10)

    // 2. COMPACT each field: tombstones retire, retired ids go
    //    store-dead (hidden, not resurrected), group still coherent
    InvertedIndex.compact(spark, p1)
    InvertedIndex.compact(spark, p2)
    assert(InvertedIndex.tombstoneCount(spark, p1) == 0L)
    assert(top(fields) == afterDel, "compact must not change scores")
    assert(storeFp().size == n0 - 10, "store-dead ids must stay hidden")

    // 3. RE-APPEND the same ids with NEW text through the ledgered
    //    group append: the store-dead clash auto-sweeps, each id served
    //    exactly once with the new payload
    val renew = base.filter(col("doc_id") < 10)
      .select(col("doc_id"),
        concat(lit("renewed "), col("title")).as("title"),
        concat(lit("renewed "), col("body")).as("body"))
    InvertedIndex.appendFields(spark, Seq((p1, "title"), (p2, "body")),
      renew, "doc_id", batchId = 7L)
    val served = storeFp()
    assert(served.size == n0, "re-appended ids are back")
    assert(served.map(_._1).distinct.size == n0, "each id served exactly ONCE")
    assert(served.filter(_._1 == "3").forall(_._3.startsWith("renewed ")),
      "the re-appended payload must be the NEW text")
    assert(top(fields).nonEmpty)

    // 4. another delete + compact + EXPLICIT sweep: physical store
    //    rewrite drops the dead rows and clears the dead list
    InvertedIndex.deleteFields(spark, Seq(p1, p2), Seq("20", "21"))
    InvertedIndex.compact(spark, p1)
    InvertedIndex.compact(spark, p2)
    InvertedIndex.sweepDocStore(spark, p1)
    InvertedIndex.sweepDocStore(spark, p2)
    assert(!fs(p1).exists(new org.apache.hadoop.fs.Path(s"$p1/docstore/_dead")),
      "explicit sweep must clear the dead list")
    assert(storeFp().size == n0 - 2)

    // 5. the walked group equals a FRESH build over the equivalent
    //    final corpus — the end-to-end coherence pin
    val finalCorpus = base.filter(col("doc_id") >= 10 &&
        col("doc_id") =!= 20 && col("doc_id") =!= 21)
      .unionByName(renew)
    val r1 = tmp("r1"); val r2 = tmp("r2")
    InvertedIndex.build(finalCorpus, "doc_id", "title", r1, nBuckets = 8,
      nDocBuckets = 4, storeText = true)
    InvertedIndex.build(finalCorpus, "doc_id", "body", r2, nBuckets = 8,
      nDocBuckets = 4, storeText = true)
    assert(top(fields) == top(Seq((r1, 2.0, 0.5), (r2, 1.0, 0.75))),
      "the lifecycle-walked group must score like a fresh build")
  }
}
