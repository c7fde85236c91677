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
}
