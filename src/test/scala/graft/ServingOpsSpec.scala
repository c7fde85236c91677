package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, InvertedIndex, VectorStore}

/** The round-15 serving surface: search-after pagination, term
  * dictionary queries (prefix suggest, fuzzy expansion), facet counts,
  * multi-field highlighting, MMR diversity re-ranking. */
class ServingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
  private def emb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"srv$tag").toString

  private lazy val idxPath: String = {
    val p = tmp("idx")
    InvertedIndex.build(docs, "doc_id", "text", p, nBuckets = 8,
      nDocBuckets = 4, storeText = true)
    p
  }

  private val terms = Seq("spark", "vector", "join")

  private def key(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
    df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

  // --------------------------------------------------------- pagination

  test("bm25 search-after: pages concatenate to the full ranking, no gaps or overlaps") {
    val full = key(InvertedIndex.bm25TopK(spark, idxPath, terms, k = 10))
    assume(full.size == 10, "fixture must have >= 10 scoring docs")
    val p1 = key(InvertedIndex.bm25TopK(spark, idxPath, terms, k = 5))
    val cursor = p1.last
    val p2 = key(InvertedIndex.bm25TopK(spark, idxPath, terms, k = 5,
      after = Some((cursor._2, cursor._1))))
    assert(p1 ++ p2 == full, s"pages must tile the ranking: $p1 ++ $p2 vs $full")
    // a cursor mid-page never re-serves its own row
    assert(!p2.exists(_._1 == cursor._1))
  }

  test("vector search-after: page 2 equals ranks 6-10 of the full ranking") {
    val st = VectorStore.fromDataFrame(emb, "vec_id", "embedding", 64,
      elemType = DoubleType)
    val q = emb.filter(col("vec_id") === 1)
      .select("embedding").head().getSeq[Float](0).toArray
    // cursor carries the RAW score exactly as query() returned it —
    // one (raw score DESC, id ASC) total order on both pages
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
      df.select(col(VectorStore.IdCol), col(VectorStore.MetricsCol))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val full = rows(st.query(q, 10))
    val p1 = rows(st.query(q, 5))
    val cur = p1.last
    val p2 = rows(st.queryAfter(q, 5, (cur._2, cur._1)))
    assert(p1 ++ p2 == full, s"$p1 ++ $p2 vs $full")
  }

  test("search-after boundary ties: 1-ulp cursor drift flips raw paging; id cursor is immune") {
    // adversarial near-tie fixture: two IDENTICAL vectors (t1 < t2) at
    // the page boundary — raw-equal scores whose tie only the id breaks
    val dim = 8
    def vec(seed: Int): Seq[Float] =
      (0 until dim).map(i => ((seed * 31 + i * 7) % 100 + 1) / 100f)
    val twin = vec(999)
    val data = ((0 until 6).map(i => (s"f$i", vec(i))) ++
      Seq(("t1", twin), ("t2", twin))).toDF("id", "v")
    val st = VectorStore.fromDataFrame(data, "id", "v", dim)
    val q = twin.toArray // query = the twin direction: t1/t2 rank 1-2
    def page(df: org.apache.spark.sql.DataFrame): Seq[(String, Double)] =
      df.select(col(VectorStore.IdCol), col(VectorStore.MetricsCol))
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val full = page(st.query(q, 8))
    assert(full.take(2).map(_._1) == Seq("t1", "t2"), s"twins must lead: $full")
    assert(full(0)._2 == full(1)._2, "twins must score raw-equal")
    val s0 = full(0)._2
    val p1 = page(st.query(q, 1)) // page boundary lands ON the tie
    assert(p1.map(_._1) == Seq("t1"))
    // in-engine guarantee: the exact raw cursor tiles the ranking
    val exact = page(st.queryAfter(q, 7, (s0, "t1")))
    assert(p1 ++ exact == full, "exact raw cursor pages must tile")
    // a 1-ulp-LOW cursor score — what an engine with a different
    // summation order can hand back for the same row — fails both
    // cursor clauses for the raw-equal twin: t2 slips between pages.
    // This pins the documented CROSS-ENGINE CAVEAT as real, not
    // theoretical.
    val drift = page(st.queryAfter(q, 7, (Math.nextDown(s0), "t1")))
    assert(!drift.exists(_._1 == "t2"),
      "ulp-drifted raw cursor must drop the boundary twin (the caveat)")
    // the ID-ONLY cursor re-derives the score in-engine: no raw double
    // crosses a boundary, so page membership is divergence-proof
    val byId = page(st.queryAfterId(q, 7, "t1"))
    assert(byId == exact, "id cursor must reproduce the exact-cursor page")
    assert(p1 ++ byId == full)
    intercept[IllegalArgumentException](st.queryAfterId(q, 3, "no-such-id"))
  }

  test("VectorDot folds dimensions 0..d-1 left-to-right — the raw-cursor summation contract") {
    // magnitude mix where fold ORDER changes the double result: the
    // engine's score must equal the left-to-right fold bit-for-bit
    // (and provably differ from the reversed fold, so the pin is
    // load-bearing — cf. the queryAfter cross-engine caveat)
    // ltr: 1 + 1e20 absorbs the 1 (ulp >> 1), then -1e20 cancels -> 0;
    // rtl: -1e20 + 1e20 cancels first, the 1s survive -> 2
    val a = Array(1f, 1e20f, 1f, -1e20f)
    val b = Array.fill(4)(1f)
    val ltr = a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    val rtl = a.indices.reverse.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
    assert(ltr != rtl, "fixture must be summation-order-sensitive")
    val got = Seq((a.toSeq, b.toSeq)).toDF("x", "y")
      .select(graft.functions.VectorFunctions.dotD(col("x"), col("y")).as("d"))
      .head().getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(got) ==
      java.lang.Double.doubleToRawLongBits(ltr),
      s"engine dot must be the left-to-right fold: $got vs $ltr")
  }

  // ------------------------------------------------- dictionary queries

  test("suggestTerms ranks prefix terms by exact df; exact under tombstone debt") {
    val expected = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .distinct()
      .filter(col("term").startsWith("s"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = InvertedIndex.suggestTerms(spark, idxPath, "s", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)

    // with retained tombstone debt the dictionary stays LIVE-exact via
    // the delta rows — equal to a fresh index over the survivors
    val p = tmp("sugdel")
    InvertedIndex.build(docs, "doc_id", "text", p, nBuckets = 8, nDocBuckets = 4)
    InvertedIndex.delete(spark, p, (0L until 20L).map(_.toString))
    val fresh = tmp("sugref")
    InvertedIndex.build(docs.filter(col("doc_id") >= 20), "doc_id", "text",
      fresh, nBuckets = 8, nDocBuckets = 4)
    val live = InvertedIndex.suggestTerms(spark, p, "s", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = InvertedIndex.suggestTerms(spark, fresh, "s", k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(live == want, "tombstoned docs must not count toward suggestion df")
  }

  test("fuzzy BM25 equals the explicit disjunction of the edit-distance expansion") {
    // vocab terms within 1 edit of 'sow': row (s->r), slow (+l)
    val viaFuzzy = key(InvertedIndex.bm25FuzzyTopK(spark, idxPath,
      Seq("sow"), k = 10, maxEdits = 1))
    val viaExplicit = key(InvertedIndex.bm25TopK(spark, idxPath,
      Seq("row", "slow"), k = 10))
    assert(viaFuzzy == viaExplicit)
    // maxEdits = 0 degenerates to the exact-term probe
    assert(key(InvertedIndex.bm25FuzzyTopK(spark, idxPath, Seq("spark"),
        k = 10, maxEdits = 0)) ==
      key(InvertedIndex.bm25TopK(spark, idxPath, Seq("spark"), k = 10)))
    // the expansion bound fails fast instead of silently truncating
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.bm25FuzzyTopK(spark, idxPath, Seq("sow"), k = 10,
        maxEdits = 2, maxExpansions = 1)
    }
    assert(e.getMessage.contains("maxExpansions"))
  }

  test("didYouMean ranks corrections by (distance, df desc, term); exact hit first") {
    val got = InvertedIndex.didYouMean(spark, idxPath, "sprak", k = 5,
        maxEdits = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    // replay against the corpus dictionary
    val dict = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = dict.map { case (t, df) => (t, df, lev(t, "sprak")) }
      .filter(_._3 <= 2)
      .sortBy { case (t, df, dist) => (dist, -df, t) }.take(5)
    assert(got == want)
    // an exact vocabulary hit always ranks first
    val exact = InvertedIndex.didYouMean(spark, idxPath, "spark", k = 3)
      .collect()
    assert(exact(0).getString(0) == "spark" && exact(0).getInt(2) == 0)
  }

  test("linearFuse: per-list min-max normalization, weights, constant-list guard") {
    val a = Seq(("d1", 10.0), ("d2", 5.0), ("d3", 0.0)).toDF("id", "s")
    val b = Seq(("d2", 0.5), ("d4", 0.5)).toDF("id", "s") // constant list
    val got = Ann.linearFuse(Seq((a, 0.4), (b, 0.6)), "id", "s", k = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    // a normalizes to d1=1, d2=0.5, d3=0; b is constant → both present = 1
    val want = Seq(("d2", 0.4 * 0.5 + 0.6, 2L), ("d4", 0.6, 1L),
      ("d1", 0.4, 1L), ("d3", 0.0, 1L))
      .map { case (i, f, n) =>
        (i, BigDecimal(f).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, n) }
      .sortBy { case (i, f, _) => (-f, i) }
    assert(got == want)
  }

  // -------------------------------------------------------------- facets

  test("facetCounts equals the corpus-side aggregation; any vs all match modes") {
    def expected(matchAll: Boolean): Set[(String, String, Long)] = {
      val toks = split(col("text"), " ")
      val hit =
        if (matchAll) array_contains(toks, "spark") && array_contains(toks, "join")
        else array_contains(toks, "spark") || array_contains(toks, "join")
      val m = docs.filter(hit)
      Seq("lang", "source").map { f =>
        m.groupBy(col(f).cast(StringType).as("value"))
          .agg(count(lit(1)).as("n_docs"))
          .select(lit(f).as("facet"), col("value"), col("n_docs"))
      }.reduce(_ unionAll _)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    }
    def got(matchAll: Boolean): Set[(String, String, Long)] =
      InvertedIndex.facetCounts(spark, idxPath, docs, "doc_id",
          Seq("lang", "source"), Seq("spark", "join"), matchAll = matchAll)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got(matchAll = true) == expected(true))
    assert(got(matchAll = false) == expected(false))
  }

  test("stored facet columns: index-local facets equal corpus facets; mutations carry them") {
    val p = tmp("fstore")
    InvertedIndex.build(docs.filter(col("doc_id") < 40), "doc_id", "text", p,
      nBuckets = 8, nDocBuckets = 4, storeCols = Seq("lang", "source"))
    // probes score byte-identically to an index without stored columns
    // (the columns are parquet-pruned out of every scoring read)
    val plain = tmp("fplain")
    InvertedIndex.build(docs.filter(col("doc_id") < 40), "doc_id", "text",
      plain, nBuckets = 8, nDocBuckets = 4)
    assert(key(InvertedIndex.bm25TopK(spark, p, terms, k = 10)) ==
      key(InvertedIndex.bm25TopK(spark, plain, terms, k = 10)))

    def stored(path: String): Set[(String, String, Long)] =
      InvertedIndex.facetCountsStored(spark, path, Seq("lang", "source"),
          Seq("spark"), matchAll = true)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    def viaCorpus(sub: org.apache.spark.sql.DataFrame): Set[(String, String, Long)] =
      InvertedIndex.facetCounts(spark, p, sub, "doc_id", Seq("lang", "source"),
          Seq("spark"), matchAll = true)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(stored(p) == viaCorpus(docs.filter(col("doc_id") < 40)))

    // append carries the stored columns; delete drops their rows
    InvertedIndex.append(spark, p,
      docs.filter(col("doc_id") >= 40 && col("doc_id") < 80), "doc_id", "text")
    InvertedIndex.delete(spark, p, (0L until 5L).map(_.toString))
    val survivors = docs.filter(col("doc_id") >= 5 && col("doc_id") < 80)
    val fresh = tmp("ffresh")
    InvertedIndex.build(survivors, "doc_id", "text", fresh,
      nBuckets = 8, nDocBuckets = 4, storeCols = Seq("lang", "source"))
    assert(stored(p) == stored(fresh),
      "mutated index must facet like a fresh build over the survivors")

    // sort-by-stored-field equals the corpus-side ordering
    val wantSort = survivors
      .filter(array_contains(split(col("text"), " "), "spark"))
      .select(col("doc_id").cast(StringType).as("id"), col("source"))
      .orderBy(col("source"), col("id")).limit(7)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val gotSort = InvertedIndex.sortByStored(spark, p, Seq("spark"),
        "source", k = 7, asc = true)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(gotSort == wantSort)

    // fetchDocs returns requested stored columns alongside the text
    val pt = tmp("ftext")
    InvertedIndex.build(docs.filter(col("doc_id") < 40), "doc_id", "text", pt,
      nBuckets = 8, nDocBuckets = 4, storeText = true,
      storeCols = Seq("lang", "source"))
    val fd = InvertedIndex.fetchDocs(spark, pt, Seq("3").toDF("id"),
      withCols = Seq("lang")).collect()
    assert(fd.length == 1 && fd(0).schema.fieldNames.toSeq ==
      Seq("id", "dl", "text", "lang"))
    assert(fd(0).getString(3) ==
      docs.filter(col("doc_id") === 3).head().getAs[String]("lang"))

    // fail fast: unstored facet column, reserved storeCols name,
    // unstored sort column
    val e1 = intercept[IllegalArgumentException] {
      InvertedIndex.facetCountsStored(spark, plain, Seq("lang"), Seq("spark"))
    }
    assert(e1.getMessage.contains("not stored"))
    val e2 = intercept[IllegalArgumentException] {
      InvertedIndex.build(docs, "doc_id", "text", tmp("fbad"),
        storeCols = Seq("dl"))
    }
    assert(e2.getMessage.contains("collide"))
    val e3 = intercept[IllegalArgumentException] {
      InvertedIndex.sortByStored(spark, plain, Seq("spark"), "lang", k = 5)
    }
    assert(e3.getMessage.contains("not stored"))
  }

  test("rangeFacetStored: equal-width histogram over a numeric stored column") {
    val spark2 = spark
    import spark2.implicits._
    val p = tmp("rng")
    val rows = Seq(
      ("a", "hit term", "-5"), ("b", "hit term", "0"), ("c", "hit term", "99.9"),
      ("d", "hit term", "100"), ("e", "hit term", "250"), ("f", "hit term", "499.99"),
      ("g", "hit term", "500"), ("h", "hit term", "oops"), // non-numeric drops
      ("i", "miss only", "50") // not in the match set
    ).toDF("doc_id", "text", "price")
    InvertedIndex.build(rows, "doc_id", "text", p, nBuckets = 4,
      nDocBuckets = 2, storeCols = Seq("price"))
    val got = InvertedIndex.rangeFacetStored(spark, p, "price", Seq("hit"),
        lo = 0.0, hi = 500.0, nBins = 5)
      .orderBy(col("bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // -5 underflows (-1); 0, 99.9 in bin 0; 100 in bin 1; 250 in bin 2;
    // 499.99 in bin 4; 500 overflows (5); 'oops' drops; 'i' no match
    assert(got == Seq((-1L, 1L), (0L, 2L), (1L, 1L), (2L, 1L), (4L, 1L), (5L, 1L)))
    // deletes respect liveness
    InvertedIndex.delete(spark, p, Seq("e"))
    val after = InvertedIndex.rangeFacetStored(spark, p, "price", Seq("hit"),
        lo = 0.0, hi = 500.0, nBins = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(!after.contains(2L))
  }

  test("matchCount equals the corpus-side count in both match modes") {
    val toks = split(col("text"), " ")
    val wantAll = docs.filter(
      array_contains(toks, "spark") && array_contains(toks, "join")).count()
    val wantAny = docs.filter(
      array_contains(toks, "spark") || array_contains(toks, "join")).count()
    assert(InvertedIndex.matchCount(spark, idxPath, Seq("spark", "join"),
      matchAll = true).head().getLong(0) == wantAll)
    assert(InvertedIndex.matchCount(spark, idxPath, Seq("spark", "join"),
      matchAll = false).head().getLong(0) == wantAny)
    // a term hashing to a bucket that never existed counts zero
    assert(InvertedIndex.matchCount(spark, idxPath,
      Seq("zzz_not_a_term")).head().getLong(0) == 0L)
  }

  // ------------------------------------------------ multi-field highlight

  test("highlightFields renders each field from its own postings and doc store") {
    val titleIdx = tmp("hlt")
    val titled = docs.withColumn("title",
      array_join(slice(split(col("text"), " "), 1, 8), " "))
    InvertedIndex.build(titled, "doc_id", "title", titleIdx, nBuckets = 8,
      nDocBuckets = 4, storeText = true)
    val ids = Seq("0", "1", "2", "3", "4").toDF("id")
    val out = InvertedIndex.highlightFields(spark,
      Seq(("title", titleIdx), ("body", idxPath)), ids, terms,
      window = 2, maxPerDoc = 2).collect()
    val byField = out.groupBy(_.getString(0))
    // title offsets live inside the 8-token field; body offsets may not
    byField.getOrElse("title", Array.empty).foreach { r =>
      assert(r.getLong(5) <= 9, s"title window must stay field-local: $r")
    }
    // each field equals its own single-field highlight
    Seq("title" -> titleIdx, "body" -> idxPath).foreach { case (f, p) =>
      val single = InvertedIndex.highlightTerms(spark, p, ids, terms,
          window = 2, maxPerDoc = 2)
        .collect().map(_.toSeq).toSet
      val stacked = byField.getOrElse(f, Array.empty)
        .map(_.toSeq.drop(1)).toSet
      assert(stacked == single, s"field $f must match its single-field form")
    }
  }

  // ----------------------------------------------------------------- MMR

  test("mmrRerank: greedy argmax of the quantized objective, ties by id") {
    val st = VectorStore.fromDataFrame(emb, "vec_id", "embedding", 64,
      elemType = DoubleType)
    val q = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray
    val top = st.query(q, 15)
      .select(col(VectorStore.IdCol).as("id"),
        col(VectorStore.MetricsCol).as("rel"))
    val cand = top.join(
      emb.select(col("vec_id").cast(StringType).as("id"), col("embedding")),
      Seq("id"))
    val lambda = 0.7
    val out = Ann.mmrRerank(cand, "id", "embedding", "rel", k = 8,
        lambda = lambda)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out.map(_._1) == (1 to 8), "ranks must be 1..k in pick order")
    assert(out.map(_._2).distinct.size == 8, "picks must be distinct")

    // replay the greedy selection from the raw candidate rows
    val rows = cand.select(col("id"),
        col("embedding").cast("array<double>"), col("rel").cast(DoubleType))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    def norm(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val nv = rows.map { case (id, v, _) => id -> norm(v) }.toMap
    val rel = rows.map { case (id, _, r) => id -> r }.toMap
    var picked = Vector.empty[String]
    (1 to 8).foreach { step =>
      val best = rows.map(_._1).filterNot(picked.contains).map { id =>
        val pen =
          if (step == 1) 0.0
          else (1 - lambda) * picked.map(p =>
            nv(id).zip(nv(p)).map { case (a, b) => a * b }.sum).max
        (id, math.round((lambda * rel(id) - pen) * 1e6))
      }.minBy { case (id, sq) => (-sq, id) }
      assert(out(step - 1)._2 == best._1,
        s"step $step: engine picked ${out(step - 1)._2}, replay says ${best._1}")
      assert(out(step - 1)._3 == best._2 / 1e6)
      picked :+= best._1
    }

    // k > n just returns everything, still in pick order
    assert(Ann.mmrRerank(cand, "id", "embedding", "rel", k = 100)
      .count() == cand.count())
    // the candidate bound fails fast instead of collecting unbounded
    val e = intercept[IllegalArgumentException] {
      Ann.mmrRerank(cand, "id", "embedding", "rel", k = 5, maxCandidates = 3)
    }
    assert(e.getMessage.contains("maxCandidates"))
  }

  // ----------------------------------------------------------- plan shape

  test("suggestTerms fast path reads the term-stats dictionary, never the postings") {
    val df = InvertedIndex.suggestTerms(spark, idxPath, "s", k = 5)
    val scans = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
      .linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.exists(_.contains("termstats")),
      s"suggest must read the dictionary:\n${scans.mkString("\n")}")
    assert(!scans.exists(_.contains("postings")),
      s"tombstone-free suggest must never open postings:\n${scans.mkString("\n")}")
  }
}
