package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ann, Dedup}

class DedupAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Manually-driven ScalaCheck samples (fixed seeds; the
    * scalatest-scalacheck bridge is not available offline). */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),          // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog"),          // near dup of 1
    (4L, "spark catalyst optimizer rewrites logical plans"),
    (5L, "completely different content about query engines here"))
    .toDF("doc_id", "text")

  test("exact dedup groups and survivor selection") {
    val groups = Dedup.exactGroups(docs, "doc_id", Seq("text")).collect()
    assert(groups.length == 4)
    val dupGroup = groups.find(_.getAs[Long]("group_size") == 2).get
    assert(dupGroup.getAs[Long]("keep_id") == 1L)
    val kept = Dedup.dropExactDups(docs, "doc_id", Seq("text"))
    assert(kept.count() == 4)
    assert(!kept.select("doc_id").as[Long].collect().contains(2L))
  }

  test("multi-column content hash: no cross-boundary or NULL-position collisions") {
    val df = Seq(
      (1L, Some("ab"), Some("c")),
      (2L, Some("a"), Some("bc")),   // same concat, different rows
      (3L, Some("a"), None),
      (4L, Option.empty[String], Some("a")))
      .toDF("id", "c1", "c2")
    val groups = Dedup.exactGroups(df, "id", Seq("c1", "c2")).collect()
    assert(groups.length == 4) // all rows distinct
    // and a genuine multi-column dup still groups
    val df2 = df.union(Seq((5L, Some("ab"), Some("c"))).toDF("id", "c1", "c2"))
    val g2 = Dedup.exactGroups(df2, "id", Seq("c1", "c2"))
      .filter(col("group_size") === 2).collect()
    assert(g2.length == 1 && g2.head.getAs[Long]("keep_id") == 1L)
  }

  test("knn graph append: incremental maintenance equals the full rebuild verbatim") {
    val e = Tables.embeddings(spark, TestSpark.sf).select(col("vec_id"), col("embedding"))
    val oldData = e.filter(col("vec_id") < 400)
    val b1 = e.filter(col("vec_id") >= 400 && col("vec_id") < 450)
    val b2 = e.filter(col("vec_id") >= 450)
    val g0 = Ann.knnGraph(oldData, "vec_id", "embedding", oldData, 3, roundScores = false)
    // one append == full rebuild over the union, bit for bit
    val a1 = Ann.knnGraphAppend(g0, oldData, "vec_id", "embedding", b1, 3)
    val union1 = oldData.unionByName(b1)
    val r1 = Ann.knnGraph(union1, "vec_id", "embedding", union1, 3)
    assert(a1.exceptAll(r1).isEmpty && r1.exceptAll(a1).isEmpty)
    // chained: RAW edges feed the next append; two appends == one rebuild
    val a1raw = Ann.knnGraphAppend(g0, oldData, "vec_id", "embedding", b1, 3,
      roundScores = false)
    val a2 = Ann.knnGraphAppend(a1raw, union1, "vec_id", "embedding", b2, 3)
    val r2 = Ann.knnGraph(e, "vec_id", "embedding", e, 3)
    assert(a2.exceptAll(r2).isEmpty && r2.exceptAll(a2).isEmpty)
  }

  test("blocked pairs reject non-numeric ids with a clear error") {
    val df = Seq(("doc-1", Seq(1.0f, 0.0f)), ("doc-2", Seq(1.0f, 0.0f))).toDF("sid", "vec")
    val ex = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDups(df, "sid", "vec", threshold = 0.5).collect()
    }
    assert(ex.getMessage.contains("numeric id"))
  }

  test("simhash band join: full recall at any id distance, equals brute force") {
    // exact dup pair 1_000_000 ids apart — id-distance blocking would
    // miss it; the fingerprint band join must not
    val far = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (1000001L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark catalyst optimizer rewrites logical plans"),
      (3L, "completely different content about query engines here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(far, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Int]("hamming")).toMap
    assert(pairs.contains((1L, 1000001L)) && pairs((1L, 1000001L)) == 0)
    // band join == brute-force all-pairs hamming<=3 (pigeonhole completeness)
    val fp = far.select(col("doc_id").as("id"),
      Dedup.simhash64(Dedup.tokens(col("text"))).as("fp"))
    val brute = fp.select(col("id").as("id_a"), col("fp").as("fp_a"))
      .crossJoin(fp.select(col("id").as("id_b"), col("fp").as("fp_b")))
      .filter(col("id_a") < col("id_b") &&
        Dedup.simhashHamming(col("fp_a"), col("fp_b")) <= 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.keySet == brute)
    // string ids work too (no numeric-id requirement in the band join)
    val sids = Seq(("a", "x y z w"), ("b", "x y z w")).toDF("sid", "text")
    val sp = Dedup.simhashPairs(sids, "sid", "text").collect()
    assert(sp.length == 1 && sp.head.getAs[Int]("hamming") == 0)
  }

  test("embedding LSH near-dups: co-bucketed identical vectors found, threshold enforced") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    // plant an exact copy of vec 0 at a far id: same vector => same
    // bucket in every band => always a candidate, cos == 1
    val clone = e.filter(col("vec_id") === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val pairs = Dedup.embeddingNearDupsLsh(
        e.select("vec_id", "embedding").union(clone), "vec_id", "embedding",
        threshold = 0.99, dim = 64, nPlanes = 4, bands = 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Double]("cos")))
    assert(pairs.exists { case (a, b, c) => a == 0L && b == 1000000L && c >= 0.999999 })
    pairs.foreach { case (_, _, c) => assert(c >= 0.99) }
  }

  test("knnGraphBlocked: equals unblocked knnGraph, broadcasts stay block-sized") {
    val e = Tables.embeddings(spark, TestSpark.sf).select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 60)
    val full = Ann.knnGraph(e, "vec_id", "embedding", e, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val blocked = Ann.knnGraphBlocked(e, "vec_id", "embedding", k = 3, maxBroadcastRows = 16L)
    assert(blocked.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet == full)
    // 60 rows / 16 per block = 4 blocks => 4 bounded broadcasts, never one
    // big one (AQE's toString repeats the plan under "== Initial Plan ==" —
    // count the final plan only)
    val plan = blocked.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val nBroadcasts = "BroadcastExchange".r.findAllIn(plan).size
    assert(nBroadcasts == 4, s"expected 4 block-sized broadcasts, got $nBroadcasts\n$plan")
  }

  test("jaccard of shingle sets: identical=1, near-dup high, disjoint=0") {
    val d = docs.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("sh"))
    val pairs = d.as("a").crossJoin(d.as("b"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        Dedup.jaccard(col("a.sh"), col("b.sh")).as("j"))
      .collect().map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib")) -> r.getAs[Double]("j")).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) >= 0.4 && pairs((1L, 3L)) < 1.0)
    assert(pairs((1L, 5L)) == 0.0)
  }

  test("minhash-LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", shingleN = 2,
        numHashes = 32, bands = 16)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.contains((4L, 5L)))
  }

  test("simhash: identical texts have hamming 0, near-dups small, different large") {
    val fp = docs.select(col("doc_id"),
      Dedup.simhash64(Dedup.tokens(col("text"))).as("fp"))
    val h = fp.as("a").crossJoin(fp.as("b"))
      .select(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        Dedup.simhashHamming(col("a.fp"), col("b.fp")).as("h"))
      .collect().map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib")) -> r.getAs[Int]("h")).toMap
    assert(h((1L, 2L)) == 0)
    assert(h((1L, 3L)) < h((1L, 4L)))
  }

  test("lsh topk: recall vs brute force on real embeddings") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val qs = e.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(e, "vec_id", "embedding", qs, "vec_id", "embedding", 5)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val approx = Ann.lshTopK(e, "vec_id", "embedding", qs, "vec_id", "embedding", 5,
        dim = 64, nPlanes = 4)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // every query must at least find itself (same bucket trivially)
    (0L until 10L).foreach(q => assert(approx.contains((q, q.toString))))
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.2, s"recall $recall") // 4 planes ~ 16 buckets over 500 vecs
    // multi-probe (Hamming<=1 buckets) can only widen the candidate set
    val multi = Ann.lshTopK(e, "vec_id", "embedding", qs, "vec_id", "embedding", 5,
        dim = 64, nPlanes = 4, probeHamming = 1)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val recallM = multi.intersect(exact).size.toDouble / exact.size
    assert(recallM >= recall, s"multi-probe recall $recallM < single-probe $recall")
  }

  test("connectedComponents merges transitive pairs into min-id clusters") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 7L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // 1-2-3-7 is one chain even though 1 and 7 never matched directly
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("star components: log-round convergence on a chain min-label cannot finish") {
    // 121-node chain (diameter 120): one-hop min-label needs ~120 rounds
    // and must fail loudly at its 10-round cap...
    val chain = (1L until 121L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Dedup.connectedComponentsMinLabel(chain, maxIter = 10).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // ...while large-star/small-star contracts it in O(log d) rounds
    val (labels, rounds) = graft.operators.Dedup
      .connectedComponentsStarWithRounds(chain, maxIter = 10)
    assert(rounds <= 10, s"star alternation took $rounds rounds on a 120-chain")
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 121 && got.forall(_._2 == 1L))
  }

  test("property: star components equal min-label on generated graphs of varied shape") {
    val edgeGen = for {
      n <- Gen.chooseNum(2, 60)
      m <- Gen.chooseNum(1, 80)
      edges <- Gen.listOfN(m,
        Gen.zip(Gen.chooseNum(0L, n.toLong), Gen.chooseNum(0L, n.toLong)))
    } yield edges.filter { case (a, b) => a != b }
    val cases = samples(edgeGen, 6).filter(_.nonEmpty)
    assert(cases.size >= 4)
    cases.foreach { es =>
      val pairs = es.toDF("id_a", "id_b")
      val star = graft.operators.Dedup.connectedComponents(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val ml = graft.operators.Dedup.connectedComponentsMinLabel(pairs, maxIter = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(star == ml, s"divergence on edges $es")
    }
  }

  test("property: simhash band join equals brute force on generated corpora") {
    // tiny vocabulary forces heavy token overlap => fingerprints cluster
    // and the hamming filter actually selects
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val corpusGen = for {
      n <- Gen.chooseNum(3, 12)
      docs <- Gen.listOfN(n, Gen.chooseNum(3, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(vocab))))
    } yield docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
    samples(corpusGen, 6).filter(_.size >= 2).foreach { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      val band = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val fp = docs.select(col("doc_id").as("id"),
        Dedup.simhash64(Dedup.tokens(col("text"))).as("fp"))
      val brute = fp.select(col("id").as("id_a"), col("fp").as("fp_a"))
        .crossJoin(fp.select(col("id").as("id_b"), col("fp").as("fp_b")))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          Dedup.simhashHamming(col("fp_a"), col("fp_b")).cast("int").as("h"))
        .filter(col("h") <= 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(band == brute, s"corpus $corpus")
    }
  }

  test("star components agree with min-label on random pair graphs") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(300)((rnd.nextLong(200).abs, rnd.nextLong(200).abs))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    val star = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val minLabel = graft.operators.Dedup.connectedComponentsMinLabel(pairs, maxIter = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(star == minLabel)
  }

  test("connectedComponents: local union-find arm equals the distributed star loop") {
    val rnd = new scala.util.Random(19)
    val pairs = Seq.fill(400)((rnd.nextLong(300).abs, rnd.nextLong(300).abs))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b")
    // public entry at the default threshold -> local union-find arm
    val local = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the distributed star loop, bypassing the gate
    val star = graft.operators.Dedup.connectedComponentsStarWithRounds(pairs)._1
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(local == star)
    // forcing the gate to 0 routes the public entry through the star arm
    spark.conf.set("spark.graft.cc.localEdgeThreshold", "0")
    try {
      val gated = graft.operators.Dedup.connectedComponents(pairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(gated == star)
    } finally spark.conf.unset("spark.graft.cc.localEdgeThreshold")
  }

  test("connectedComponents local arm: string ids follow UTF-8 byte order") {
    // U+1F600 encodes as F0 9F 98 80 (UTF-8) but as a D83D surrogate in
    // UTF-16: Spark's least()/min() order the UTF-8 bytes (emoji LAST),
    // String.compareTo would order the surrogate FIRST — the local arm
    // must follow Spark. Root of the merged component must be "�".
    val pairs = Seq(("😀", "�"), ("a", "b"))
      .toDF("id_a", "id_b")
    val local = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    val star = graft.operators.Dedup.connectedComponentsStarWithRounds(pairs)._1
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(local == star)
    assert(local("😀") == "�" && local("b") == "a")
  }

  test("survivorMap: every dropped doc is attributed to its cluster's survivor") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 7L), (10L, 11L)).toDF("id_a", "id_b")
    val m = graft.operators.Dedup.survivorMap(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == Set((1L, 2L), (1L, 3L), (1L, 7L), (10L, 11L)))
    // survivors + dropped partition the paired universe
    val docs = Seq(1L, 2L, 3L, 7L, 10L, 11L, 99L).toDF("doc_id")
    val kept = graft.operators.Dedup.dropNearDups(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 99L))
    assert(kept ++ m.map(_._2) == Set(1L, 2L, 3L, 7L, 10L, 11L, 99L))
  }

  test("dropNearDupsBy keeps the best-scoring component member; ties break on id") {
    // component {1,2,3,7}: scores 5,9,9,1 -> survivor 2 (max score 9, min id
    // among the tied); component {10,11}: scores 0,4 -> survivor 11
    // (a HIGHER id than dropNearDups' min-id pick — the policy is visible)
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 7L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (7L, 1L), (10L, 0L), (11L, 4L),
        (99L, 0L)).toDF("doc_id", "q")
    val kept = graft.operators.Dedup.dropNearDupsBy(docs, "doc_id", "q", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 11L, 99L))
    // stable under repartitioning (deterministic ordering)
    val kept2 = graft.operators.Dedup
      .dropNearDupsBy(docs.repartition(5), "doc_id", "q", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == kept)
    // empty pair list: clean corpus passes through untouched
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.operators.Dedup.dropNearDupsBy(docs, "doc_id", "q", noPairs)
      .count() == 7L)
    // provenance twin: every dropped id attributes to ITS policy winner,
    // and survivors ∪ dropped == the paired universe
    val m = graft.operators.Dedup.survivorMapBy(docs, "doc_id", "q", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == Set((2L, 1L), (2L, 3L), (2L, 7L), (11L, 10L)))
    assert(kept ++ m.map(_._2) == Set(1L, 2L, 3L, 7L, 10L, 11L, 99L))
  }

  test("connectedComponents and dropNearDups handle an empty pair list") {
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(graft.operators.Dedup.connectedComponents(noPairs).isEmpty)
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val kept = graft.operators.Dedup.dropNearDups(docs, "doc_id", noPairs)
    assert(kept.count() == 2L, "a clean corpus must pass through untouched")
  }

  test("winnowPairs surfaces exact duplicates with full overlap") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"), // dup of 1
      (3L, "completely different content with nothing shared at all whatsoever here"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.winnowPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(pairs.exists { case (a, b, ov) => a == 1L && b == 2L && ov == 1.0 })
    assert(!pairs.exists { case (a, b, _) => b == 3L || a == 3L })
  }

  test("winnow hot-fingerprint cap drops boilerplate pairs, keeps real dups") {
    val boiler = "this standard license header appears identically on every single document in the corpus"
    val docs = ((1L to 30L).map(i =>
        (i, s"$boiler unique payload number $i with extra words ${"x" * i.toInt} trailing")) :+
      (100L, "zebra quilt vortex jumble knight plasma wizard gecko fondue nimbus") :+
      (101L, "zebra quilt vortex jumble knight plasma wizard gecko fondue nimbus"))
      .toDF("doc_id", "text")
    // uncapped: the shared header links every header-bearing pair
    val uncapped = graft.operators.Dedup.winnowPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 101L)))
    assert(uncapped.exists { case (a, b) => a <= 30L && b <= 30L },
      "fixture must produce boilerplate-only pairs for the cap to prune")
    // capped at df<=10: header fingerprints (df=30) drop like stopwords;
    // the true duplicate pair (df=2 fingerprints) survives at overlap 1.0
    val capped = graft.operators.Dedup.winnowPairs(docs, "doc_id", "text", maxDf = Some(10))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(capped.contains((100L, 101L)) && capped((100L, 101L)) == 1.0)
    assert(!capped.keySet.exists { case (a, b) => a <= 30L && b <= 30L },
      s"boilerplate-only pairs must be pruned, got ${capped.keySet}")
  }

  test("incremental dedup: batch deduped against base; cross pairs only") {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark catalyst optimizer rewrites logical plans")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (11L, "the quick brown fox jumps over the lazy cat"), // near dup of 1
      (12L, "completely different content about query engines"),
      (13L, "completely different content about query engines")) // batch-internal dup
      .toDF("doc_id", "text")
    // exact: only the base-duplicated row drops (batch-internal dups are
    // minhashLshPairs/dropExactDups territory, deliberately untouched)
    val kept = Dedup.dropExactDupsAgainst(base, batch, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 12L, 13L))
    // near-dup: pairs are strictly (base, batch) — no batch-internal
    // (12,13) pair, no base-internal pair
    val pairs = Dedup.minhashLshPairsAgainst(base, batch, "doc_id", "text",
        shingleN = 2, numHashes = 32, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 10L)) && pairs.contains((1L, 11L)))
    assert(pairs.forall { case (b, q) => b <= 2L && q >= 10L })
    // exact-dup pair carries jaccard 1.0
    val j = Dedup.minhashLshPairsAgainst(base, batch, "doc_id", "text",
        shingleN = 2, numHashes = 32, bands = 16)
      .filter(col("id_batch") === 10L).select("jaccard").head().getDouble(0)
    assert(j == 1.0)
  }

  test("incremental simhash: cross pairs only, equals self-join restricted to the split") {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark catalyst optimizer rewrites logical plans")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 1 (hamming 0)
      (11L, "the quick brown fox jumps over the lazy cat"),  // near dup of 1
      (12L, "completely different content about query engines"),
      (13L, "completely different content about query engines")) // batch-internal dup
      .toDF("doc_id", "text")
    val cross = Dedup.simhashPairsAgainst(base, batch, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(cross.exists { case (b, q, h) => b == 1L && q == 10L && h == 0 })
    assert(cross.forall { case (b, q, _) => b <= 2L && q >= 10L },
      s"only (base, batch) pairs allowed, got $cross")
    // equals the self-join variant restricted to cross pairs
    val self = Dedup.simhashPairs(base.unionByName(batch), "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter { case (a, b, _) => a <= 2L && b >= 10L }.toSet
    assert(cross == self)
  }

  test("persisted dedup index: probe equals in-memory operators; append extends it") {
    import graft.operators.DedupIndex
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark catalyst optimizer rewrites logical plans")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "the quick brown fox jumps over the lazy cat"),
      (12L, "completely different content about query engines")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("dedupidx").toString
    DedupIndex.create(base, "doc_id", "text", path, shingleN = 2, numHashes = 32, bands = 16)
    // exact filter through the index == the in-memory anti-join
    val keptIdx = DedupIndex.filterExact(spark, path, batch, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keptMem = Dedup.dropExactDupsAgainst(base, batch, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIdx == keptMem && keptIdx == Set(11L, 12L))
    // candidates through the index == the in-memory band join's pairs
    val candIdx = DedupIndex.candidates(spark, path, batch, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candMem = Dedup.minhashLshPairsAgainst(base, batch, "doc_id", "text",
        shingleN = 2, numHashes = 32, bands = 16, exactVerify = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(candIdx == candMem && candIdx.contains((1L, 10L)))
    // append the accepted batch; a re-probe of the same content now hits it
    DedupIndex.append(batch.filter(col("doc_id") === 12L), "doc_id", "text", path)
    val reprobe = Seq((20L, "completely different content about query engines"))
      .toDF("doc_id", "text")
    assert(DedupIndex.filterExact(spark, path, reprobe, "text").isEmpty)
    assert(DedupIndex.candidates(spark, path, reprobe, "doc_id", "text")
      .collect().exists(r => r.getLong(0) == 12L && r.getLong(1) == 20L))
    // stored params drive the probe (sidecar round trip)
    val p = DedupIndex.readParams(spark, path)
    assert(p.shingleN == 2 && p.numHashes == 32 && p.bands == 16 && !p.portableHash)
    assert(p.simMaxHamming == 3)
  }

  test("dedup index delete: forgotten doc re-ingestable unless a survivor shares its content") {
    import graft.operators.DedupIndex
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact twin of 1
      (3L, "spark catalyst optimizer rewrites logical plans"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("dedupidxdel").toString
    DedupIndex.create(base, "doc_id", "text", path, shingleN = 2, numHashes = 32, bands = 16)
    // forget doc 1 (twin 2 survives) and doc 3 (unique content)
    DedupIndex.delete(spark, path, Seq("1", "3"))
    val probe = Seq(
      (20L, "the quick brown fox jumps over the lazy dog"),
      (30L, "spark catalyst optimizer rewrites logical plans"))
      .toDF("doc_id", "text")
    val kept = DedupIndex.filterExact(spark, path, probe, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 20 still blocked (survivor 2 carries the hash); 30 ingestable again
    assert(kept == Set(30L), s"got $kept")
    // no candidate pair may reference a forgotten id, in either family
    val cand = DedupIndex.candidates(spark, path, probe, "doc_id", "text")
      .select("id_base").collect().map(_.getLong(0)).toSet
    assert(cand == Set(2L), s"got $cand")
    val sim = DedupIndex.simhashCandidates(spark, path, probe, "doc_id", "text")
      .select("id_base").collect().map(_.getLong(0)).toSet
    assert(sim == Set(2L), s"got $sim")
    // append after delete keeps working (the layouts stayed readable)
    DedupIndex.append(probe.filter(col("doc_id") === 30L), "doc_id", "text", path)
    assert(DedupIndex.filterExact(spark, path,
      probe.filter(col("doc_id") === 30L), "text").isEmpty)
  }

  test("ivf recenter: centroids land on exact list means; distortion never increases; persisted twin matches") {
    import graft.operators.Ann
    // two well-separated clusters, then a drifted batch pulls one mean
    val base = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)),
      (2L, Seq(0.0, 1.0)), (3L, Seq(0.1, 0.9))).toDF("vec_id", "embedding")
    val idx = Ann.ivfBuild(base, "vec_id", "embedding", nLists = 2, seed = 3L)
    val drift = Seq((10L, Seq(0.7, 0.3)), (11L, Seq(0.6, 0.4))).toDF("vec_id", "embedding")
    val appended = Ann.ivfAppend(idx, drift, "vec_id", "embedding")
    def distortion(ix: Ann.IvfIndex): Double = {
      val cmap = ix.centroids.toMap
      ix.assigned.select(col("cluster").cast("int"), col("v").cast("array<double>"))
        .collect().map { r =>
          val c = cmap(r.getInt(0)); val v = r.getSeq[Double](1)
          v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
        }.sum
    }
    val before = distortion(appended)
    val rec = Ann.ivfRecenter(appended)
    val after = distortion(rec)
    assert(after <= before + 1e-12, s"distortion rose: $before -> $after")
    // each recentered centroid is the EXACT mean of its assigned rows
    val byCluster = appended.assigned
      .select(col("cluster").cast("int"), col("v").cast("array<double>"))
      .collect().groupBy(_.getInt(0))
      .view.mapValues(_.map(_.getSeq[Double](1))).toMap
    rec.centroids.foreach { case (c, cv) =>
      val rows = byCluster(c).toSeq
      val mean = rows.transpose.map(xs => xs.sum / rows.length)
      cv.zip(mean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    }
    // persisted twin: only the sidecar changes; reload matches in-memory
    val path = java.nio.file.Files.createTempDirectory("ivfrecenter").toString
    Ann.ivfSave(appended, path)
    Ann.ivfRecenterSave(spark, path)
    val back = Ann.ivfLoad(spark, path)
    val recMap = rec.centroids.toMap
    back.centroids.foreach { case (c, cv) =>
      cv.zip(recMap(c)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    }
    assert(back.assigned.count() == appended.assigned.count())
  }

  test("dedup index compact: probes identical, files bounded, key-sorted, layout maintainable") {
    import graft.operators.DedupIndex
    val docs = (0L until 30L).map(i =>
      (i, s"document number $i about shared topic ${i % 5} with common words"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("dedupidxcmp").toString
    DedupIndex.create(docs.filter(col("doc_id") < 10), "doc_id", "text", path,
      shingleN = 2, numHashes = 32, bands = 16)
    // four appends -> five file sets per projection
    (10L until 30L by 5L).foreach { lo =>
      DedupIndex.append(docs.filter(col("doc_id") >= lo && col("doc_id") < lo + 5),
        "doc_id", "text", path)
    }
    val probe = Seq(
      (100L, "document number 3 about shared topic 3 with common words"), // exact dup of 3
      (101L, "entirely novel content that matches nothing stored here"))
      .toDF("doc_id", "text")
    def snap() = (
      DedupIndex.filterExact(spark, path, probe, "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet,
      DedupIndex.candidates(spark, path, probe, "doc_id", "text")
        .select("id_base", "id_batch").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      DedupIndex.simhashCandidates(spark, path, probe, "doc_id", "text")
        .select("id_base", "id_batch").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet)
    val before = snap()
    assert(before._1 == Set(101L)) // non-vacuous: the exact dup is caught
    DedupIndex.compact(spark, path, filesPerProjection = 2)
    // compaction is logically a no-op on every probe family
    assert(snap() == before)
    // file count bounded per projection
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("hashes", "bands", "sigs", "simchunks").foreach { proj =>
      val n = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/$proj"))
        .count(_.getPath.getName.endsWith(".parquet"))
      assert(n <= 2, s"$proj has $n files after compact")
    }
    // rows are sorted by the probe key within each rewritten file
    // (range partitioning + sortWithinPartitions survive the write)
    val sigFiles = spark.read.parquet(s"$path/sigs")
      .select(input_file_name().as("f"), col("id").cast("long").as("id"))
      .collect().groupBy(_.getString(0)).values
    assert(sigFiles.forall { rows =>
      val ids = rows.map(_.getLong(1)).toSeq; ids == ids.sorted })
    // the compacted layout stays maintainable: delete + append still work
    DedupIndex.delete(spark, path, Seq("3"))
    assert(DedupIndex.filterExact(spark, path, probe, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(100L, 101L))
    DedupIndex.append(probe, "doc_id", "text", path)
    assert(DedupIndex.filterExact(spark, path, probe, "text").isEmpty)
  }

  test("dedup index simhash probe equals simhashPairsAgainst; append extends it") {
    import graft.operators.DedupIndex
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark catalyst optimizer rewrites logical plans")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "the quick brown fox jumps over the lazy cat"),
      (12L, "completely different content about query engines")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("dedupsimidx").toString
    DedupIndex.create(base, "doc_id", "text", path, simMaxHamming = 3)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // probe through the stored chunk projection == the in-memory
    // cross-corpus band join, pair for pair and hamming for hamming
    val viaIdx = key(DedupIndex.simhashCandidates(spark, path, batch, "doc_id", "text"))
    val viaMem = key(Dedup.simhashPairsAgainst(base, batch, "doc_id", "text", maxHamming = 3))
    assert(viaIdx == viaMem)
    assert(viaIdx.exists { case (b, t, h) => b == 1L && t == 10L && h == 0 })
    // append extends the simhash projection too
    DedupIndex.append(batch.filter(col("doc_id") === 12L), "doc_id", "text", path)
    val reprobe = Seq((20L, "completely different content about query engines"))
      .toDF("doc_id", "text")
    assert(key(DedupIndex.simhashCandidates(spark, path, reprobe, "doc_id", "text"))
      .contains((12L, 20L, 0)))
  }

  test("minhash signatures-only mode finds the same candidate pairs") {
    val withV = Dedup.minhashLshPairs(docs, "doc_id", "text", shingleN = 2,
      numHashes = 32, bands = 16).select("id_a", "id_b").collect().toSet
    val sigOnly = Dedup.minhashLshPairs(docs, "doc_id", "text", shingleN = 2,
      numHashes = 32, bands = 16, exactVerify = false)
    assert(!sigOnly.columns.contains("jaccard"))
    assert(sigOnly.select("id_a", "id_b").collect().toSet == withV)
  }

  test("ivf index save/load round trip; probe prunes to selected clusters") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val idx = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString
    Ann.ivfSave(idx, dir)
    val back = Ann.ivfLoad(spark, dir)
    assert(back.centroids.size == 8)
    assert(back.assigned.count() == e.count())
    val hits = Ann.ivfTopK(back, e.filter(col("vec_id") === 3), "vec_id", "embedding",
      k = 3, nProbe = 2).collect()
    assert(hits.head.getAs[String]("id") == "3") // self-hit via loaded index
  }

  test("ivf batch probe: no driver collect, same hits as collect path, DPP prunes saved layout") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val idx = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivfb").toString
    Ann.ivfSave(idx, dir)
    val back = Ann.ivfLoad(spark, dir)
    val qs = e.filter(col("vec_id") < 10)
    val viaCollect = Ann.ivfTopK(back, qs, "vec_id", "embedding", k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val batch = Ann.ivfTopKBatch(back, qs, "vec_id", "embedding", k = 3, nProbe = 2)
    val viaJoin = batch
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(viaJoin == viaCollect, "batch probe must rank identically to the collect probe")
    // the saved layout's partition column is pruned at runtime via DPP
    // (the probe side broadcasts; the scan's partition filter is fed from
    // that broadcast), so unprobed lists are never read
    val formatted = batch.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the cluster-partitioned scan:\n$formatted")
    // O4 gate on the batch twin: only allowed ids are ever emitted, and
    // the allowed queries still self-hit
    val allow = e.filter(col("vec_id") % 2 === 0).select(col("vec_id"))
    val gated = Ann.ivfTopKBatch(back, qs.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", k = 3, nProbe = 8, allowed = Some(allow))
    val rows = gated.collect()
    assert(rows.nonEmpty && rows.forall(_.getString(2).toLong % 2 == 0))
    assert(rows.filter(r => r.getInt(1) == 1).forall(r => r.get(0).toString == r.getString(2)))
  }

  test("ivf topk: self-hit always found; recall beats plain LSH setup") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val qs = e.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(e, "vec_id", "embedding", qs, "vec_id", "embedding", 5)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val idx = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 16)
    assert(idx.centroids.size == 16)
    assert(idx.assigned.count() == e.count())
    val approx = Ann.ivfTopK(idx, qs, "vec_id", "embedding", k = 5, nProbe = 4)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    (0L until 10L).foreach(q => assert(approx.contains((q, q.toString))))
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.4, s"ivf recall $recall")
  }

  test("int8 quantization: codes in range, reconstruction error small, ANN order preserved") {
    import graft.operators.Quantize
    val e = Tables.embeddings(spark, TestSpark.sf)
    val v = col("embedding").cast(org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val rows = e.withColumn("scale", Quantize.int8Scale(v))
      .select(col("vec_id"),
        Quantize.quantizeInt8(v, col("scale")).as("qv"),
        Quantize.relError(v, col("scale")).as("err"))
      .collect()
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.forall(c => c >= -127 && c <= 127), s"code out of range for ${r.get(0)}")
      assert(codes.exists(_.abs == 127), "scale must saturate the largest element")
      assert(r.getDouble(2) < 0.02, s"rel err ${r.getDouble(2)} too large")
    }
    // quantized cosine preserves the exact top-1 neighbor for most queries
    val dq = e.withColumn("scale", Quantize.int8Scale(v))
      .select(col("vec_id"),
        Quantize.dequantize(Quantize.quantizeInt8(v, col("scale")), col("scale"))
          .cast(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)).as("embedding"))
    val qs = e.filter(col("vec_id") < 10)
    def top1(data: org.apache.spark.sql.DataFrame) =
      Ann.bruteForceTopK(data, "vec_id", "embedding", qs, "vec_id", "embedding", k = 1)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val exact = top1(e.select(col("vec_id"), col("embedding")))
    val approx = top1(dq)
    val agree = exact.keys.count(k => exact(k) == approx(k))
    assert(agree >= 9, s"quantized top-1 agreed on only $agree/10 queries")
  }

  test("ivf rebalance: splits oversized lists, preserves rows, keeps self-hit") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val idx = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 4, seed = 1)
    val maxBefore = idx.assigned.groupBy(col("cluster")).count()
      .agg(max("count")).head().getLong(0)
    val bal = Ann.ivfRebalance(idx, maxFactor = 1.1)
    // something was actually split at this tight factor
    assert(bal.centroids.size > idx.centroids.size,
      s"expected a split at maxFactor=1.1 (sizes were skewed around ${e.count() / 4})")
    // dense centroid ids, every assigned cluster has one
    assert(bal.centroids.map(_._1) == bal.centroids.indices.toSeq)
    val cids = bal.centroids.map(_._1).toSet
    assert(bal.assigned.select("cluster").distinct().collect()
      .map(_.getInt(0)).forall(cids))
    // invariants: row count preserved, max list size never grows
    assert(bal.assigned.count() == e.count())
    val maxAfter = bal.assigned.groupBy(col("cluster")).count()
      .agg(max("count")).head().getLong(0)
    assert(maxAfter <= maxBefore, s"max list grew: $maxBefore -> $maxAfter")
    // probes on the rebalanced index still self-hit at rank 1
    val hits = Ann.ivfTopK(bal, e.filter(col("vec_id") < 5), "vec_id", "embedding",
      k = 3, nProbe = 3)
    hits.filter(col("rank") === 1).collect()
      .foreach(r => assert(r.getAs[String]("id") == r.getAs[Long]("qid").toString))
    // a balanced index is returned untouched (no-op fast path)
    val noop = Ann.ivfRebalance(bal, maxFactor = 1000.0)
    assert(noop eq bal)
  }

  test("scale smoke: 1000 identical 128-dim vectors, top-5 all ~1.0 (integration_tests.rs:15-38)") {
    val rows = (0 until 1000).map(i => (s"vec_$i", Seq.fill(128)(0.1f)))
    val df = rows.toDF("id", "vec")
    val st = graft.operators.VectorStore.fromDataFrame(df, "id", "vec", 128)
    val hits = st.query(Array.fill(128)(0.1f), 5).collect()
    assert(hits.length == 5)
    hits.foreach(h => assert(h.getAs[Double]("__metrics__") > 0.99))
    assert(st.len() == 1000)
  }

  test("salted aggregation equals plain groupBy on a skewed fixture") {
    // 10k rows, 95% on one hot key
    val rows = (0 until 10000).map(i =>
      (if (i % 20 == 0) s"key_${i % 7}" else "hot", (i % 997) / 10.0))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = graft.operators.Relational.saltedCentsSum(df, Seq("k"), "v", "s", salts = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = df.groupBy(col("k"))
      .agg((sum(round(col("v") * 100).cast("long")).cast("double") / 100.0).as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == plain)
  }

  test("brute-force batch topk agrees with single-query store path") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val st = graft.operators.VectorStore.fromDataFrame(
      e, "vec_id", "embedding", 64, elemType = org.apache.spark.sql.types.DoubleType)
    val q = e.filter(col("vec_id") === 3).select("embedding").head().getSeq[Float](0).toArray
    val single = st.query(q, 5).select("__id__").as[String].collect().toSeq
    val batch = Ann.bruteForceTopK(e, "vec_id", "embedding",
        e.filter(col("vec_id") === 3), "vec_id", "embedding", 5)
      .orderBy("rank").select("id").as[String].collect().toSeq
    assert(batch == single)
  }

  test("centroid outlier gate flags vectors pointing away from their label mean") {
    val df = Seq(
      (1L, 0, Seq(1.0f, 0.0f)),
      (2L, 0, Seq(0.9f, 0.1f)),
      (3L, 0, Seq(-1.0f, 0.0f)),   // anti-aligned with label 0's centroid
      (4L, 1, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = Ann.labelCentroidOutliers(df, "vec_id", "embedding", "label", minCos = 0.0)
      .orderBy(col("vec_id")).collect()
    assert(!out(0).getAs[Boolean]("outlier"))
    assert(!out(1).getAs[Boolean]("outlier"))
    assert(out(2).getAs[Boolean]("outlier"))
    assert(out(2).getAs[Double]("centroid_cos") < 0)
    assert(!out(3).getAs[Boolean]("outlier")) // sole member of its label
  }

  test("ivfpq: probed-list ADC candidates keep self-hit; recall within parents' band") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val ivf = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 16)
    val pq = Ann.pqBuild(e, "vec_id", "embedding", m = 8, nCodes = 16)
    val q = e.filter(col("vec_id") < 10)
    val approx = Ann.ivfPqTopK(ivf, pq, q, "vec_id", "embedding", k = 5, nProbe = 6)
    val self = approx.filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(self.length == 10 && self.forall(identity))
    val exact = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 5)
      .withColumn("qid", col("qid").cast("string"))
    val hits = approx.join(exact, Seq("qid", "id"), "left_semi").count()
    assert(hits >= 25, s"ivfpq recall too low: $hits/50")
  }

  test("ivfpq residual: recall >= non-residual at equal code budget; self-hit holds") {
    // clustered fixture: residual encoding wins exactly when the coarse
    // quantizer soaks up the cluster structure and the ranking signal
    // lives in the residual, so build 8 clusters with noise wide enough
    // that neighbors are residual-determined (sigma 0.5 vs unit centers)
    // and give PQ a deliberately starved budget (m=4, 4 codes)
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = (0 until 8).map(_ => Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until 320).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.indices.map(d => (c(d) + 0.5 * rnd.nextGaussian()).toFloat))
    }
    val e = rows.toDF("vec_id", "embedding")
    val ivf = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 8)
    val plainPq = Ann.pqBuild(e, "vec_id", "embedding", m = 4, nCodes = 4)
    val resIdx = Ann.ivfPqBuildResidual(ivf, m = 4, nCodes = 4)
    assert(resIdx.codes.count() == 320)
    val q = e.filter(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 5)
      .withColumn("qid", col("qid").cast("string"))
    // rerankFactor=1 so the ADC ordering alone decides recall
    val plain = Ann.ivfPqTopK(ivf, plainPq, q, "vec_id", "embedding",
      k = 5, nProbe = 3, rerankFactor = 1)
    val resid = Ann.ivfPqResidualTopK(resIdx, q, "vec_id", "embedding",
      k = 5, nProbe = 3, rerankFactor = 1)
    val hitsPlain = plain.join(exact, Seq("qid", "id"), "left_semi").count()
    val hitsRes = resid.join(exact, Seq("qid", "id"), "left_semi").count()
    info(s"recall@5 x 20 queries: residual $hitsRes/100 vs plain $hitsPlain/100")
    assert(hitsRes >= hitsPlain,
      s"residual recall regressed: $hitsRes < $hitsPlain (of 100)")
    // seeded fixture measures residual 22 vs plain 12 — the floor guards
    // against a silent collapse, not a band (raw ADC@k*1 on a 4x4-code
    // budget is deliberately starved; the default rerank restores quality)
    assert(hitsRes >= 15, s"residual recall too low: $hitsRes/100")
    // with the default rerank budget the exact re-rank restores self@1
    val selfs = Ann.ivfPqResidualTopK(resIdx, q, "vec_id", "embedding", k = 5, nProbe = 3)
      .filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(selfs.length == 20 && selfs.forall(identity))
  }

  test("ivfpq residual batch probe ranks identically to the collect path") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val ivf = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 8)
    val idx = Ann.ivfPqBuildResidual(ivf, m = 8, nCodes = 16)
    val q = e.filter(col("vec_id") < 10)
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq.sorted
    val viaCollect = Ann.ivfPqResidualTopK(idx, q, "vec_id", "embedding",
      k = 5, nProbe = 3)
    val viaJoin = Ann.ivfPqResidualTopKBatch(idx, q, "vec_id", "embedding",
      k = 5, nProbe = 3)
    assert(key(viaJoin) == key(viaCollect))
    // structural: no LocalTableScan carries QUERY-derived rows (probes /
    // ADC tables are plan expressions); the nLists-row centroid table is
    // the one legitimate local relation, same as ivfTopKBatch
    val localScans = viaJoin.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("LocalTableScan")).toSeq
    assert(localScans.forall(l => !l.contains("qid") && !l.contains("table")),
      s"batch probe must not materialize driver-side query tables:\n${localScans.mkString("\n")}")
  }

  test("pq and residual ivfpq indexes save/load: identical query results") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
      .toSeq.sorted
    // PQ round trip
    val pq = Ann.pqBuild(e, "vec_id", "embedding", m = 8, nCodes = 16)
    val pqDir = java.nio.file.Files.createTempDirectory("pqsave").toString
    Ann.pqSave(pq, pqDir)
    val pqBack = Ann.pqLoad(spark, pqDir)
    assert(pqBack.m == pq.m && pqBack.subDim == pq.subDim && pqBack.codebooks == pq.codebooks)
    assert(key(Ann.pqTopK(pqBack, q, "vec_id", "embedding", k = 3)) ==
      key(Ann.pqTopK(pq, q, "vec_id", "embedding", k = 3)))
    // residual IVF×PQ round trip
    val ivf = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 8)
    val res = Ann.ivfPqBuildResidual(ivf, m = 8, nCodes = 16)
    val resDir = java.nio.file.Files.createTempDirectory("ivfpqsave").toString
    Ann.ivfPqSave(res, resDir)
    val resBack = Ann.ivfPqLoad(spark, resDir)
    assert(resBack.centNorm == res.centNorm && resBack.codebooks == res.codebooks)
    assert(key(Ann.ivfPqResidualTopK(resBack, q, "vec_id", "embedding", k = 3, nProbe = 4)) ==
      key(Ann.ivfPqResidualTopK(res, q, "vec_id", "embedding", k = 3, nProbe = 4)))
  }

  test("pq: codes in range, ADC+rerank self-hit and high recall vs brute force") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val idx = Ann.pqBuild(e, "vec_id", "embedding", m = 8, nCodes = 16)
    assert(idx.subDim == 8 && idx.codebooks.size == 8)
    // every code addresses a real centroid of its subspace's book
    val mx = idx.codes
      .select(max(expr("array_max(codes)")), min(expr("array_min(codes)"))).head()
    assert(mx.getInt(1) >= 0 && idx.codebooks.forall(b => b.size <= 16))
    assert(idx.codes.count() == e.count())
    val q = e.filter(col("vec_id") < 10)
    val approx = Ann.pqTopK(idx, q, "vec_id", "embedding", k = 5)
    val exact = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 5)
    // exact re-rank => the self vector (cosine 1.0) ranks first whenever
    // recalled; require it for every query
    val self = approx.filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(self.length == 10 && self.forall(identity))
    // recall@5 >= 60% averaged (PQ with 16 codes/subspace on 64-dim)
    val hits = approx.join(
        exact.withColumn("qid", col("qid").cast("string")),
        Seq("qid", "id"), "left_semi").count()
    assert(hits >= 30, s"recall too low: $hits/50")
  }

  test("streaming ingestion: dedup index accepts only new content; ivf index grows per batch") {
    import graft.operators.DedupIndex
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    // --- dedup index ingest ---
    val base = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val idxPath = Files.createTempDirectory("dedupingest").toString
    DedupIndex.create(base, "doc_id", "text", idxPath)
    val watch = Files.createTempDirectory("dedupingest_watch")
    def stage(name: String, df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
      val staging = Files.createTempDirectory(s"stage_$name")
      df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = watch.resolve(s"$name.parquet")
      Files.copy(part, dst)
      Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    stage("b1", Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // already in index
      (11L, "completely different content about query engines"),
      (12L, "completely different content about query engines")) // in-batch dup
      .toDF("doc_id", "text"), t0)
    stage("b2", Seq(
      (20L, "completely different content about query engines"), // accepted in b1
      (21L, "spark catalyst optimizer rewrites logical plans"))  // new
      .toDF("doc_id", "text"), t0 + 5000)
    val schema = spark.read.parquet(watch.toString).schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(watch.toString)
    val q = graft.streaming.StreamingOps.dedupIngestStream(stream, idxPath, "doc_id", "text")
    try q.processAllAvailable() finally q.stop()
    // exactly one copy of each distinct content made it in: 1 base +
    // 11 (first in-batch survivor) + 21
    val storedIds = spark.read.parquet(s"$idxPath/sigs")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(storedIds == Set(1L, 11L, 21L), s"got $storedIds")
    // a re-probe of any ingested content is now a dup
    val reprobe = Seq((99L, "spark catalyst optimizer rewrites logical plans"))
      .toDF("doc_id", "text")
    assert(DedupIndex.filterExact(spark, idxPath, reprobe, "text").isEmpty)

    // --- checkpointed dedup ingest is FILE-level idempotent ---
    // content-level idempotence (the anti-join) holds without a ledger,
    // but a replayed batch would still rewrite accepted files; with a
    // checkpoint the ledger must keep the exact file set stable
    val idx2 = Files.createTempDirectory("dedupingest2").toString
    DedupIndex.create(base, "doc_id", "text", idx2)
    val cp = Files.createTempDirectory("dedupingest_cp").toString
    def runLedgered(): Unit = {
      val st = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(watch.toString)
      val lq = graft.streaming.StreamingOps.dedupIngestStream(
        st, idx2, "doc_id", "text", checkpointDir = Some(cp))
      try lq.processAllAvailable() finally lq.stop()
    }
    runLedgered()
    def projFiles(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      graft.operators.DedupIndex.projectionRoots
        .flatMap(p => walk(new java.io.File(s"$idx2/$p"))).map(_.getPath).toSet
    }
    val filesOnce = projFiles()
    // crash injection: drop the last engine commit → restart re-delivers
    val commits = new java.io.File(s"$cp/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    val lastName = commits.last.getName
    assert(commits.last.delete())
    new java.io.File(s"$cp/commits/.$lastName.crc").delete()
    runLedgered()
    assert(projFiles() == filesOnce,
      "replayed batch must not rewrite accepted files (no file-count drift)")
    assert(spark.read.parquet(s"$idx2/sigs").select("id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 11L, 21L))

    // --- persisted ivf ingest ---
    val e = Tables.embeddings(spark, TestSpark.sf)
    val baseIvf = Ann.ivfBuild(e.filter(col("vec_id") >= 10), "vec_id", "embedding", nLists = 4)
    val ivfPath = Files.createTempDirectory("ivfingest").toString
    Ann.ivfSave(baseIvf, ivfPath)
    val ivfWatch = Files.createTempDirectory("ivfingest_watch")
    val s1 = Files.createTempDirectory("ivfstage1")
    e.filter(col("vec_id") < 5).select("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s1.toString)
    val p1 = Files.list(s1).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(p1, ivfWatch.resolve("v1.parquet"))
    val s2 = Files.createTempDirectory("ivfstage2")
    e.filter(col("vec_id") >= 5 && col("vec_id") < 10).select("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(s2.toString)
    val p2 = Files.list(s2).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(p2, ivfWatch.resolve("v2.parquet"))
    val vschema = spark.read.parquet(ivfWatch.toString).schema
    val vstream = spark.readStream.schema(vschema).option("maxFilesPerTrigger", "1")
      .parquet(ivfWatch.toString)
    val vq = graft.streaming.StreamingOps.ivfIngestStream(vstream, ivfPath, "vec_id", "embedding")
    try vq.processAllAvailable() finally vq.stop()
    val back = Ann.ivfLoad(spark, ivfPath)
    assert(back.assigned.count() == e.count())
    val hits = Ann.ivfTopK(back, e.filter(col("vec_id") === 3), "vec_id", "embedding",
      k = 3, nProbe = 2).collect()
    assert(hits.head.getAs[String]("id") == "3", "stream-ingested row must self-hit")
  }

  test("semantic dedup: cluster-blocked components, min-id survivors, cross-cluster pairs never compared") {
    // two tight clusters on orthogonal axes + one far singleton; hand
    // clusters stand in for the KMeans assignment (the op is blind to
    // where the blocking came from)
    val rows = Seq(
      (1L, Seq(1.0, 0.0, 0.0), 0),
      (2L, Seq(0.999, 0.01, 0.0), 0),   // near-dup of 1
      (3L, Seq(0.98, 0.05, 0.0), 0),    // near-dup of 1 and 2
      (4L, Seq(0.0, 1.0, 0.0), 1),
      (5L, Seq(0.0, 0.999, 0.01), 1),   // near-dup of 4
      (6L, Seq(0.0, 0.0, 1.0), 1),      // same CLUSTER as 4/5 but not similar
      (7L, Seq(1.0, 0.0, 0.0), 1))      // identical to 1 but OTHER cluster: must survive
      .toDF("id", "v", "cluster")
    val byId = Dedup.semanticDedup(rows, "id", "v", "cluster", tau = 0.95)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    assert(byId.size == 7)
    assert(byId(1L) == ((1L, true)))
    assert(byId(2L) == ((1L, false)))
    assert(byId(3L) == ((1L, false)))   // transitive member joins group 1
    assert(byId(4L) == ((4L, true)))
    assert(byId(5L) == ((4L, false)))
    assert(byId(6L) == ((6L, true)))    // co-clustered but dissimilar: singleton
    assert(byId(7L) == ((7L, true)))    // cross-cluster twin of 1 never compared
  }

  test("semantic dedup skew guard: one hot cluster cannot re-quadratize; exact dups still group") {
    // adversarial corpus: EVERY row lands in one coarse cluster (the
    // blocking the quantizer is supposed to prevent but cannot
    // guarantee under skew). 400 mutually-dissimilar rows + 3 planted
    // exact-dup groups of 2.
    val n = 400
    val dims = 64
    val rnd = new scala.util.Random(7)
    val base = (0 until n).map { i =>
      val v = Array.fill(dims)(rnd.nextGaussian())
      (i.toLong, v.toSeq, 0)
    }
    val dups = (0 until 3).map { j =>
      (1000L + j, base(j)._2, 0) // exact copy of row j, same cluster
    }
    val rows = (base ++ dups).toDF("id", "v", "cluster")
    // unguarded: the self-join on the single cluster is quadratic
    val unguarded = Dedup.semanticPairs(rows, "id", "v", "cluster",
      tau = -1.0, maxBlock = 0).count()
    assert(unguarded == (n + 3).toLong * (n + 2) / 2) // all pairs compared
    // guarded at maxBlock=50: expected pair volume is ~size*maxBlock,
    // an order of magnitude below quadratic (hash split is uniform in
    // expectation — assert a 3x slack bound, not the exact expectation)
    val guarded = Dedup.semanticPairs(rows, "id", "v", "cluster",
      tau = -1.0, maxBlock = 50).count()
    assert(guarded < (n + 3).toLong * 50 * 3 / 2,
      s"skew guard did not bound pair volume: $guarded")
    assert(guarded < unguarded / 3)
    // identical vectors hash to the same sub-block BY CONSTRUCTION, so
    // exact dups always group even under the cap
    val byId = Dedup.semanticDedup(rows, "id", "v", "cluster",
      tau = 0.9999, maxBlock = 50)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    (0 until 3).foreach { j =>
      assert(byId(1000L + j) == ((j.toLong, false)),
        s"exact dup ${1000 + j} must group under its twin $j")
      assert(byId(j.toLong) == ((j.toLong, true)))
    }
  }

  test("shard writer: pure-key routing, reproducible within-shard order, manifest counts") {
    import graft.operators.Relational
    import java.nio.file.Files
    val d = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"), col("text"))
    val out1 = Files.createTempDirectory("shards1").toString
    val out2 = Files.createTempDirectory("shards2").toString
    Relational.writeShards(d, "doc_id", out1, nShards = 4)
    // second run over a DIFFERENT input partitioning must produce
    // row-identical shard contents in the same order
    Relational.writeShards(d.repartition(13), "doc_id", out2, nShards = 4)
    for (s <- 0 until 4) {
      def rows(base: String) = spark.read
        .parquet(s"$base/shard=$s").select(col("doc_id")).collect().map(_.getLong(0)).toSeq
      val (a, b) = (rows(out1), rows(out2))
      assert(a == b, s"shard $s differs between runs")
      assert(a.toSet.forall(id =>
        java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString).substring(0, 12), 16) % 4 == s),
        s"shard $s contains a misrouted id")
    }
    // manifest counts match the written layout
    val manifest = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(Files.readAllBytes(
        java.nio.file.Paths.get(s"$out1/_manifest.json")), "UTF-8"))
    assert(manifest.get("n_shards").asInt() == 4)
    assert(manifest.get("total").asLong() == d.count())
    val it = manifest.get("shards").elements()
    var total = 0L
    val chkByShard = scala.collection.mutable.Map[Int, Long]()
    while (it.hasNext) {
      val n = it.next()
      total += n.get("rows").asLong()
      chkByShard(n.get("shard").asInt()) = n.get("ids_chk").asLong()
    }
    assert(total == d.count())
    // integrity checksum: recomputable from the shard's ids alone
    for (s <- 0 until 4) {
      val ids = spark.read.parquet(s"$out1/shard=$s")
        .select(col("doc_id")).collect().map(_.getLong(0))
      val expect = ids.map(id => java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString).substring(0, 12),
        16) % 2147483648L).sum
      assert(chkByShard(s) == expect, s"shard $s checksum mismatch")
    }
  }

  test("sized shard writers: integer ceiling choice, floor of one, layout honors the choice") {
    import graft.operators.Relational
    import java.nio.file.Files
    // the pure sizing rule: integer ceiling division, floored at 1
    assert(Relational.shardCountFor(0L, 10L) == 1)
    assert(Relational.shardCountFor(10L, 10L) == 1)
    assert(Relational.shardCountFor(11L, 10L) == 2)
    assert(Relational.shardCountFor(1L, Long.MaxValue) == 1)
    val d = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"), col("text"))
    val n = d.count()
    val outR = Files.createTempDirectory("shardsSizedR").toString
    val kR = Relational.writeShardsSized(d, "doc_id", outR, targetRowsPerShard = 100L)
    assert(kR == Relational.shardCountFor(n, 100L))
    val back = spark.read.parquet(outR)
    assert(back.count() == n)
    assert(back.agg(max(col("shard").cast("int"))).head().getInt(0) < kR)
    // bytes variant: shard count recomputable from total payload bytes
    val total = d.agg(sum(octet_length(col("text"))).cast("long")).head().getLong(0)
    val target = math.max(1L, total / 3)
    val outB = Files.createTempDirectory("shardsSizedB").toString
    val kB = Relational.writeShardsSizedBytes(d, "doc_id", "text", outB, target)
    assert(kB == Relational.shardCountFor(total, target))
    assert(kB == 3 || kB == 4, s"target of a third of the corpus should give 3-4 shards, got $kB")
    // the manifest records the sized choice
    val manifest = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(Files.readAllBytes(
        java.nio.file.Paths.get(s"$outB/_manifest.json")), "UTF-8"))
    assert(manifest.get("n_shards").asInt() == kB)
  }

  test("dedup family triangulation: each lens sees its own near-dup class and misses the others'") {
    // 1/2 exact dups; 3 = token REORDER of 1; 4 = one-token substitution
    // of 1; 5 = unrelated. Every family is deterministic, so the found
    // pair sets are pinned exactly.
    val tri = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "kappa iota theta eta zeta epsilon delta gamma beta alpha"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (5L, "totally unrelated content about spark physical plans here"))
      .toDF("doc_id", "text")
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // MinHash (shingle lens): sees the substitution (7/9 shared
    // shingles), is BLIND to the reorder — a reversed sentence shares no
    // 3-shingle with the original
    val mh = pairSet(Dedup.minhashLshPairs(tri, "doc_id", "text",
      shingleN = 3, numHashes = 32, bands = 8))
    assert(mh == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    // SimHash (token-bag lens): reorder is INVISIBLE (hamming 0), the
    // substitution falls outside radius 3
    val sh = pairSet(Dedup.simhashPairs(tri, "doc_id", "text", maxHamming = 3))
    assert(sh == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // semantic (char-distribution lens): sees ALL THREE dup classes —
    // exact at cos 1, reorder at ~0.992, substitution at ~0.963 — and
    // rejects unrelated content outright (cos < 0)
    val embedded = tri.withColumn("c", lit(0))
      .withColumn("emb", Dedup.textEmbedding(col("text"), 16))
    val sem = pairSet(Dedup.semanticPairs(embedded, "doc_id", "emb", "c", tau = 0.9))
    assert(sem == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 4L)))
    val cosOf = Dedup.semanticPairs(embedded, "doc_id", "emb", "c", tau = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cosOf((1L, 2L)) == 1.0)
    assert(cosOf((1L, 3L)) > 0.99 && cosOf((1L, 4L)) > 0.96)
    assert(cosOf((1L, 5L)) < 0.0, "unrelated content must score below zero")
  }

  test("text embedding + semantic text dedup: exact dups collapse, embeddings deterministic") {
    val m = docs.select(col("doc_id"), Dedup.textEmbedding(col("text"), 16).as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(m(1L) == m(2L), "identical texts must embed identically")
    assert(m(1L) != m(4L), "different texts must embed differently")
    assert(m.values.forall(_.exists(_ != 0.0)), "no zero vectors")
    // second evaluation bit-identical (pure function of the text)
    val m2 = docs.select(col("doc_id"), Dedup.textEmbedding(col("text"), 16).as("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(m == m2)
    val r = Dedup.semanticDedupText(docs, "doc_id", "text", tau = 0.99, dim = 16,
        nLists = 2)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getBoolean(2)))).toMap
    assert(r(1L)._2, "survivor of the exact-dup group")
    assert(r(2L) == ((1L, false)), "exact dup must drop into 1's group")
    assert(r(4L)._2 && r(5L)._2, "distinct contents survive")
  }

  test("ivf maintain: persisted layout rebalances only when skewed; probes survive the swap") {
    import java.nio.file.Files
    val e = Tables.embeddings(spark, TestSpark.sf)
    val base = Ann.ivfBuild(e.filter(col("vec_id") >= 10), "vec_id", "embedding", nLists = 8)
    val path = Files.createTempDirectory("ivfmaint").toString
    Ann.ivfSave(base, path)
    val listsBefore = spark.read.parquet(s"$path/lists").count()
    // fresh layout, generous bound: no-op, nothing rewritten
    assert(!Ann.ivfMaintain(spark, path, maxFactor = 100.0))
    // skew it: 300 jittered near-copies of one vector land in one cluster
    // (jitter keeps them distinct so the local re-fit can split them)
    val hot = e.filter(col("vec_id") === 42)
      .select(col("embedding").cast("array<double>").as("v"))
    val batch = spark.range(300).crossJoin(hot)
      .select((col("id") + 1000000L).as("vec_id"),
        transform(col("v"), (x, i) =>
          x + when(i === 0, (col("id").cast("double") + 1.0) * 1e-4).otherwise(lit(0.0)))
          .as("embedding"))
    Ann.ivfAppendSave(spark, path, batch, "vec_id", "embedding")
    val sizesBefore = spark.read.parquet(s"$path/lists")
      .groupBy(col("cluster")).count().collect().map(_.getLong(1))
    def fileMap(): Map[String, Set[(String, Long)]] =
      new java.io.File(s"$path/lists").listFiles().filter(_.isDirectory)
        .filterNot(_.getName.startsWith("."))
        .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length())).toSet).toMap
    val dirsBefore = fileMap()
    assert(Ann.ivfMaintain(spark, path, maxFactor = 2.0), "skewed layout must rebalance")
    val after = spark.read.parquet(s"$path/lists")
    val sizesAfter = after.groupBy(col("cluster")).count().collect().map(_.getLong(1))
    assert(after.count() == listsBefore + 300, "rows must survive the swap")
    assert(sizesAfter.max < sizesBefore.max, "hot list must shrink")
    assert(sizesAfter.length > sizesBefore.length, "split must add lists")
    // INCREMENTAL contract: the hot batch landed in ONE cluster, so
    // exactly that parent dir rewrites — every other pre-existing dir
    // keeps its files byte-identical (the old full-layout swap rewrote
    // everything; cost must be ∝ split lists)
    val dirsAfter = fileMap()
    val changed = dirsBefore.keys.filter(d => dirsAfter.get(d) != dirsBefore.get(d)).toSeq
    assert(changed.size == 1, s"only the split parent may rewrite, got $changed")
    // probes on the swapped layout: the hot vector still self-hits
    val hits = Ann.ivfTopK(Ann.ivfLoad(spark, path),
      e.filter(col("vec_id") === 42), "vec_id", "embedding", k = 3, nProbe = 4).collect()
    assert(hits.head.getAs[String]("id") == "42")
  }

  test("ivfPq maintain: residual re-encode on split; only split dirs rewrite in BOTH roots") {
    import java.nio.file.Files
    val e = Tables.embeddings(spark, TestSpark.sf)
    val base = Ann.ivfPqBuildResidual(
      Ann.ivfBuild(e.filter(col("vec_id") >= 10), "vec_id", "embedding", nLists = 8),
      m = 8, nCodes = 16)
    val path = Files.createTempDirectory("ivfpqmaint").toString
    Ann.ivfPqSave(base, path)
    // balanced layout: no-op
    assert(!Ann.ivfPqMaintain(spark, path, maxFactor = 100.0))
    // skew one list with jittered near-copies (distinct, splittable)
    val hot = e.filter(col("vec_id") === 42)
      .select(col("embedding").cast("array<double>").as("v"))
    val batch = spark.range(300).crossJoin(hot)
      .select((col("id") + 1000000L).as("vec_id"),
        transform(col("v"), (x, i) =>
          x + when(i === 0, (col("id").cast("double") + 1.0) * 1e-4).otherwise(lit(0.0)))
          .as("embedding"))
    Ann.ivfPqAppendSave(spark, path, batch, "vec_id", "embedding")
    def fileMap(root: String): Map[String, Set[(String, Long)]] =
      new java.io.File(root).listFiles().filter(_.isDirectory)
        .filterNot(_.getName.startsWith("."))
        .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length())).toSet).toMap
    val codesBefore = fileMap(s"$path/codes")
    val listsBefore = fileMap(s"$path/ivf/lists")
    assert(Ann.ivfPqMaintain(spark, path, maxFactor = 2.0), "skewed layout must rebalance")
    // exactly the one hot parent rewrote, in EACH root
    Seq((s"$path/codes", codesBefore), (s"$path/ivf/lists", listsBefore)).foreach {
      case (root, before) =>
        val afterM = fileMap(root)
        val changed = before.keys.filter(d => afterM.get(d) != before.get(d)).toSeq
        assert(changed.size == 1, s"only the split parent may rewrite in $root, got $changed")
        assert(afterM.size > before.size, s"split must add tail dirs under $root")
    }
    // reloaded index: row-consistent roots, codes match a fresh re-encode
    val reloaded = Ann.ivfPqLoad(spark, path)
    val lists = spark.read.parquet(s"$path/ivf/lists")
    assert(reloaded.codes.count() == lists.count())
    assert(reloaded.codes.select(col("id").cast("string"), col("cluster"))
      .exceptAll(lists.select(col("id").cast("string"), col("cluster"))).isEmpty)
    // quality holds over base ∪ batch with exact rerank. Queries stay
    // OUTSIDE the 300-near-copy hot pile: a query inside it can lose
    // its rerank slot to copies whose ADC scores sit within the
    // quantization noise of the 1e-4 jitter — approximate nomination,
    // not a defect (the exact rerank contract applies to what's
    // nominated).
    val corpus = e.filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .unionByName(batch)
    val q = e.filter(col("vec_id") === 13 || col("vec_id") === 11)
    val approx = Ann.ivfPqResidualTopK(reloaded, q, "vec_id", "embedding",
      k = 3, nProbe = 6, rerankFactor = 16)
    approx.filter(col("rank") === 1).collect()
      .foreach(r => assert(r.getAs[String]("id") == r.getAs[Any]("qid").toString))
  }

  test("ivf maintain recovery: an interrupted run rolls back (or forward) exactly") {
    import java.nio.file.Files
    val e = Tables.embeddings(spark, TestSpark.sf)
    val base = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 4)
    val path = Files.createTempDirectory("ivfmaintrec").toString
    Ann.ivfSave(base, path)
    val rowsBefore = spark.read.parquet(s"$path/lists")
      .select(col("id").cast("string")).collect().map(_.getString(0)).sorted.toSeq
    // simulate a maintain interrupted AFTER tails + parent thinning but
    // BEFORE the sidecar commit: marker present, sidecar still old
    val fs = new java.io.File(s"$path/lists")
    val parent = fs.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cluster=")).sorted.head
    val c = parent.stripPrefix("cluster=").toInt
    // "tail" dirs the interrupted run created (content arbitrary)
    e.filter(col("vec_id") < 3).select(col("vec_id").cast("string").as("id"),
        col("embedding").cast("array<float>").as("v"))
      .coalesce(1).write.parquet(s"$path/lists/cluster=4")
    // parent renamed away, thinned replacement in place
    assert(new java.io.File(s"$path/lists/$parent")
      .renameTo(new java.io.File(s"$path/lists/.$parent.maintain.old")))
    e.filter(col("vec_id") === 0).select(col("vec_id").cast("string").as("id"),
        col("embedding").cast("array<float>").as("v"))
      .coalesce(1).write.parquet(s"$path/lists/$parent")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$path/_maintain.json"),
      s"""{"new_count": 6, "parents": [$c], "tails": [4, 5]}""".getBytes("UTF-8"))
    // any maintenance entry point heals first: no-op maintain recovers
    assert(!Ann.ivfMaintain(spark, path, maxFactor = 1000.0))
    val rowsAfter = spark.read.parquet(s"$path/lists")
      .select(col("id").cast("string")).collect().map(_.getString(0)).sorted.toSeq
    assert(rowsAfter == rowsBefore, "rollback must restore the exact pre-maintain corpus")
    assert(!new java.io.File(s"$path/lists/cluster=4").exists, "tail dir must drop")
    assert(!new java.io.File(s"$path/lists/.$parent.maintain.old").exists)
    assert(!new java.io.File(s"$path/_maintain.json").exists)
    // committed side: marker matching the CURRENT sidecar count plus a
    // leftover .old → cleanup only, layout untouched
    assert(new java.io.File(s"$path/lists/$parent")
      .renameTo(new java.io.File(s"$path/lists/.$parent.maintain.old")) &&
      new java.io.File(s"$path/lists/.$parent.maintain.old")
        .renameTo(new java.io.File(s"$path/lists/$parent")))
    e.filter(col("vec_id") === 0).select(col("vec_id").cast("string").as("id"),
        col("embedding").cast("array<float>").as("v"))
      .coalesce(1).write.parquet(s"$path/lists/.$parent.maintain.old")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$path/_maintain.json"),
      s"""{"new_count": ${base.centroids.size}, "parents": [$c], "tails": []}""".getBytes("UTF-8"))
    assert(!Ann.ivfMaintain(spark, path, maxFactor = 1000.0))
    assert(!new java.io.File(s"$path/lists/.$parent.maintain.old").exists,
      "committed leftovers must drop")
    assert(!new java.io.File(s"$path/_maintain.json").exists)
    assert(spark.read.parquet(s"$path/lists")
      .select(col("id").cast("string")).collect().map(_.getString(0)).sorted.toSeq
      == rowsBefore)
  }

  test("ivf maintain recovery: ambiguous count nonce resolves to rollback when a parent is mid-swap") {
    // the degenerate-split scenario: a marker whose new_count EQUALS the
    // live sidecar count (every split parent collapsed to one
    // sub-centroid — possible for markers from older versions; current
    // maintains skip that plan outright) crashing inside thinParentDir's
    // two-rename window (dir renamed to .old, replacement not yet in).
    // Count alone says "committed", which would delete the .old copy
    // while the live dir is MISSING — permanent loss of that cluster.
    // The dir-missing-with-.old-present override must force rollback.
    import java.nio.file.Files
    val e = Tables.embeddings(spark, TestSpark.sf)
    val base = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 4)
    val path = Files.createTempDirectory("ivfmaintamb").toString
    Ann.ivfSave(base, path)
    val rowsBefore = spark.read.parquet(s"$path/lists")
      .select(col("id").cast("string")).collect().map(_.getString(0)).sorted.toSeq
    val parent = new java.io.File(s"$path/lists").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cluster=")).sorted.head
    val c = parent.stripPrefix("cluster=").toInt
    // mid-swap: parent renamed away, NO replacement dir yet
    assert(new java.io.File(s"$path/lists/$parent")
      .renameTo(new java.io.File(s"$path/lists/.$parent.maintain.old")))
    Files.write(java.nio.file.Paths.get(s"$path/_maintain.json"),
      s"""{"new_count": ${base.centroids.size}, "parents": [$c], "tails": []}"""
        .getBytes("UTF-8"))
    assert(!Ann.ivfMaintain(spark, path, maxFactor = 1000.0))
    assert(new java.io.File(s"$path/lists/$parent").exists,
      "mid-swap parent must be restored from its .old copy, not deleted")
    assert(!new java.io.File(s"$path/lists/.$parent.maintain.old").exists)
    assert(!new java.io.File(s"$path/_maintain.json").exists)
    assert(spark.read.parquet(s"$path/lists")
      .select(col("id").cast("string")).collect().map(_.getString(0)).sorted.toSeq
      == rowsBefore, "no row may be lost to the ambiguous nonce")
  }

  test("ivf append: no refit, rows land, recall parity with full rebuild") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val base = Ann.ivfBuild(e.filter(col("vec_id") >= 10), "vec_id", "embedding", nLists = 8)
    val batch = e.filter(col("vec_id") < 10)
    val idx = Ann.ivfAppend(base, batch, "vec_id", "embedding")
    // the append path never refits: the centroid seq is the SAME object
    assert(idx.centroids eq base.centroids)
    assert(idx.assigned.count() == e.count())
    // appended rows are probeable: self-hit at rank 1 for every batch row
    val qs = batch
    val viaAppend = Ann.ivfTopK(idx, qs, "vec_id", "embedding", k = 5, nProbe = 4)
    val selfs = viaAppend.filter(col("rank") === 1)
      .select((col("id") === col("qid").cast("string")).as("ok")).as[Boolean].collect()
    assert(selfs.length == 10 && selfs.forall(identity), "appended rows must self-hit")
    // recall(append + probe) >= recall(full rebuild + probe) - eps
    val exact = Ann.bruteForceTopK(e, "vec_id", "embedding", qs, "vec_id", "embedding", k = 5)
    def recall(hits: org.apache.spark.sql.DataFrame): Long =
      hits.join(exact.select(col("qid").cast("long").as("qid"), col("id")),
        Seq("qid", "id"), "left_semi").count()
    val rebuilt = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 8)
    val ra = recall(viaAppend.withColumn("qid", col("qid").cast("long")))
    val rr = recall(Ann.ivfTopK(rebuilt, qs, "vec_id", "embedding", k = 5, nProbe = 4)
      .withColumn("qid", col("qid").cast("long")))
    assert(ra >= rr - 5, s"append recall $ra/50 fell more than eps below rebuild recall $rr/50")
    // optional skew-bounded append: rebalance engages only when asked,
    // and preserves row count
    val bounded = Ann.ivfAppend(base, batch, "vec_id", "embedding",
      rebalanceFactor = Some(1.1))
    assert(bounded.assigned.count() == e.count())
  }

  test("ivf persisted append: only touched cluster dirs gain files; loaded probe sees batch") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val base = Ann.ivfBuild(e.filter(col("vec_id") >= 5), "vec_id", "embedding", nLists = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivfappend").toString
    Ann.ivfSave(base, dir)
    def filesByCluster(): Map[Int, Set[String]] = {
      val lists = new java.io.File(s"$dir/lists")
      lists.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cluster="))
        .map(d => d.getName.stripPrefix("cluster=").toInt ->
          d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
        .toMap
    }
    val before = filesByCluster()
    val touched = Ann.ivfAppendSave(spark, dir, e.filter(col("vec_id") < 5),
      "vec_id", "embedding")
    val after = filesByCluster()
    assert(touched.nonEmpty && touched.toSet.subsetOf(before.keySet ++ after.keySet))
    for ((c, files) <- before if !touched.contains(c))
      assert(after(c) == files, s"untouched cluster dir $c was rewritten")
    for (c <- touched)
      assert(after(c).size > before.getOrElse(c, Set.empty[String]).size,
        s"touched cluster dir $c gained no files")
    val back = Ann.ivfLoad(spark, dir)
    assert(back.assigned.count() == e.count())
    val hits = Ann.ivfTopK(back, e.filter(col("vec_id") === 3), "vec_id", "embedding",
      k = 3, nProbe = 4).collect()
    assert(hits.head.getAs[String]("id") == "3", "appended row must self-hit after reload")
  }

  test("residual ivfpq persisted append: touched dirs only in both layouts; reload probes the batch") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val baseIvf = Ann.ivfBuild(e.filter(col("vec_id") >= 5), "vec_id", "embedding", nLists = 8)
    val base = Ann.ivfPqBuildResidual(baseIvf, m = 8, nCodes = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfpqappend").toString
    Ann.ivfPqSave(base, dir)
    def filesByCluster(sub: String): Map[Int, Set[String]] = {
      val d = new java.io.File(s"$dir/$sub")
      d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cluster="))
        .map(c => c.getName.stripPrefix("cluster=").toInt ->
          c.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
        .toMap
    }
    val beforeCodes = filesByCluster("codes")
    val beforeLists = filesByCluster("ivf/lists")
    val touched = Ann.ivfPqAppendSave(spark, dir, e.filter(col("vec_id") < 5),
      "vec_id", "embedding")
    assert(touched.nonEmpty)
    val afterCodes = filesByCluster("codes")
    val afterLists = filesByCluster("ivf/lists")
    for ((c, files) <- beforeCodes if !touched.contains(c))
      assert(afterCodes(c) == files, s"untouched codes dir $c was rewritten")
    for ((c, files) <- beforeLists if !touched.contains(c))
      assert(afterLists(c) == files, s"untouched lists dir $c was rewritten")
    for (c <- touched) {
      assert(afterCodes(c).size > beforeCodes.getOrElse(c, Set.empty[String]).size,
        s"touched codes dir $c gained no files")
      assert(afterLists(c).size > beforeLists.getOrElse(c, Set.empty[String]).size,
        s"touched lists dir $c gained no files")
    }
    val back = Ann.ivfPqLoad(spark, dir)
    assert(back.codes.count() == e.count())
    assert(back.ivf.assigned.count() == e.count())
    val q = e.filter(col("vec_id") < 5)
    val approx = Ann.ivfPqResidualTopK(back, q, "vec_id", "embedding", k = 3, nProbe = 6)
    val self = approx.filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(self.length == 5 && self.forall(identity),
      "persisted-appended rows must self-hit after reload")
  }

  test("pq append: plan-expression encoding matches KMeans.transform codes; residual append keeps contract") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val full = Ann.pqBuild(e, "vec_id", "embedding", m = 8, nCodes = 16)
    // re-encode the SAME rows through the append path with the SAME
    // books: the argmin expression must reproduce model.transform's
    // assignment (identical first-min tie rule; disagreement possible
    // only on float near-ties, so require >= 99.9% exact agreement)
    val reEnc = Ann.pqAppend(full.copy(codes = full.codes.limit(0)), e, "vec_id", "embedding")
    assert(reEnc.codebooks eq full.codebooks) // no refit
    val joined = full.codes.select(col("id"), col("codes").as("c_build"))
      .join(reEnc.codes.select(col("id"), col("codes").as("c_append")), Seq("id"))
    val n = joined.count()
    val agree = joined.filter(col("c_build") === col("c_append")).count()
    assert(n == e.count(), "append must encode every batch row")
    assert(agree >= n * 999 / 1000,
      s"append encoding diverged from build encoding: $agree/$n agree")
    // residual IVF×PQ append: zero fits, batch probeable under the contract
    val baseIvf = Ann.ivfBuild(e.filter(col("vec_id") >= 10), "vec_id", "embedding", nLists = 8)
    val baseRes = Ann.ivfPqBuildResidual(baseIvf, m = 8, nCodes = 16)
    val grown = Ann.ivfPqAppendResidual(baseRes, e.filter(col("vec_id") < 10),
      "vec_id", "embedding")
    assert(grown.codebooks eq baseRes.codebooks)
    assert(grown.centNorm eq baseRes.centNorm)
    assert(grown.codes.count() == e.count())
    val q = e.filter(col("vec_id") < 10)
    val approx = Ann.ivfPqResidualTopK(grown, q, "vec_id", "embedding", k = 5, nProbe = 4)
    val self = approx.filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(self.length == 10 && self.forall(identity),
      "residual-appended rows must self-hit at rank 1")
  }

  test("opq: rotation orthonormal and cosine-preserving; self-hit and recall vs brute force") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val idx = Ann.opqBuild(e, "vec_id", "embedding", m = 8, nCodes = 16)
    // R R^T = I to FP tolerance — the rotation is exactly orthonormal in
    // math (rows are eigenvectors of a symmetric matrix), so any drift
    // here is a bookkeeping bug, not round-off
    val R = idx.rotation.map(_.toArray).toArray
    val dim = R.length
    assert(dim == 64 && R.forall(_.length == dim))
    for (i <- 0 until dim; j <- i until dim) {
      var s = 0.0; var c = 0
      while (c < dim) { s += R(i)(c) * R(j)(c); c += 1 }
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(s - want) < 1e-8, s"RR^T[$i][$j] = $s")
    }
    val q = e.filter(col("vec_id") < 10)
    val approx = Ann.opqTopK(idx, q, "vec_id", "embedding", k = 5)
    // exact re-rank in the rotated space => recalled self still ranks 1
    val self = approx.filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(self.length == 10 && self.forall(identity))
    val exact = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 5)
      .withColumn("qid", col("qid").cast("string"))
    val hits = approx.join(exact, Seq("qid", "id"), "left_semi").count()
    assert(hits >= 30, s"opq recall too low: $hits/50")
    // orthogonality preserves dot products: rotated-space re-rank scores
    // equal original-space cosines on the shared hits (both sides round
    // their output to 6 decimals, so allow one ulp of that rounding)
    val maxDrift = approx.select(col("qid"), col("id"), col("score").as("s_rot"))
      .join(exact.select(col("qid"), col("id"), col("score").as("s_orig")), Seq("qid", "id"))
      .select(abs(col("s_rot") - col("s_orig")).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(maxDrift <= 2e-6, s"rotated-space cosine drifted: $maxDrift")
  }

  test("opq: beats plain pq on an anisotropic corpus at equal code budget") {
    // corpus with all its variance in the first 4 raw axes (a 4-D latent)
    // plus tiny noise elsewhere: raw-axis PQ gives subspace 0 four codes
    // for a 4-D signal and spends subspaces 1-3 entirely on noise, while
    // the OPQ rotation deals one high-variance eigendirection to each
    // subspace — four codes per effective dimension
    val rnd = new scala.util.Random(123)
    val rows = (0 until 400).map { i =>
      val v = Array.tabulate(16)(d =>
        if (d < 4) rnd.nextDouble() * 2 - 1 else (rnd.nextDouble() * 2 - 1) * 0.01)
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(df, "vec_id", "embedding", q, "vec_id", "embedding", 5)
      .withColumn("qid", col("qid").cast("string"))
    def recall(approx: org.apache.spark.sql.DataFrame): Long =
      approx.join(exact, Seq("qid", "id"), "left_semi").count()
    val pq = Ann.pqBuild(df, "vec_id", "embedding", m = 4, nCodes = 8)
    val opq = Ann.opqBuild(df, "vec_id", "embedding", m = 4, nCodes = 8)
    // tight re-rank budget so ADC quality, not the exact re-rank, decides
    val rPq = recall(Ann.pqTopK(pq, q, "vec_id", "embedding", k = 5, rerankFactor = 3))
    val rOpq = recall(Ann.opqTopK(opq, q, "vec_id", "embedding", k = 5, rerankFactor = 3))
    assert(rOpq > rPq, s"opq recall $rOpq should beat raw-axis pq $rPq on anisotropic data")
    assert(rOpq >= 50, s"opq recall too low on its favorable case: $rOpq/100 (pq: $rPq)")
  }

  test("opq append: batch encodes through the fixed rotation with no refit; self-hit holds") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val base = Ann.opqBuild(e.filter(col("vec_id") >= 10), "vec_id", "embedding", m = 8, nCodes = 16)
    val grown = Ann.opqAppend(base, q, "vec_id", "embedding")
    // rotation and codebooks are untouched; only the code table grew
    assert(grown.rotation == base.rotation)
    assert(grown.pq.codebooks == base.pq.codebooks)
    assert(grown.pq.codes.count() == base.pq.codes.count() + 10)
    val approx = Ann.opqTopK(grown, q, "vec_id", "embedding", k = 5)
    val self = approx.filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(self.length == 10 && self.forall(identity),
      "appended rows must self-hit at rank 1")
  }

  test("ivf persisted delete: touched dirs only, emptied dir removed, reload excludes deleted") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val dir = Files.createTempDirectory("ivfdelete").toString
    val idx = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 16)
    Ann.ivfSave(idx, dir)
    def listing(): Map[String, Long] = Files.walk(Paths.get(s"$dir/lists")).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
      .map(p => p.toString -> Files.size(p)).toMap
    val before = listing()
    // drain ONE whole cluster (dir must disappear) + one id from another
    val clusters = idx.assigned.select(col("cluster").cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted
    val c0 = clusters.head
    val drained = idx.assigned.filter(col("cluster") === c0)
      .select(col("id").cast("string")).collect().map(_.getString(0)).toSeq
    val other = idx.assigned.filter(col("cluster") =!= c0)
      .select(col("id").cast("string"), col("cluster").cast("int")).head()
    val delIds = drained :+ other.getString(0)
    val touched = Ann.ivfDeleteSave(spark, dir, delIds)
    assert(touched.toSet == Set(c0, other.getInt(1)))
    assert(!Files.exists(Paths.get(s"$dir/lists/cluster=$c0")), "drained dir must be removed")
    // untouched cluster dirs keep their files byte-identical
    val after = listing()
    val untouchedBefore = before.filter { case (p, _) => !touched.exists(c => p.contains(s"cluster=$c/")) }
    val untouchedAfter = after.filter { case (p, _) => !touched.exists(c => p.contains(s"cluster=$c/")) }
    assert(untouchedBefore == untouchedAfter, "untouched cluster dirs must not be rewritten")
    val back = Ann.ivfLoad(spark, dir)
    assert(back.assigned.count() == e.count() - delIds.size)
    assert(back.assigned.filter(col("id").cast("string").isin(delIds: _*)).count() == 0L)
    // a surviving query still self-hits; a deleted vector is gone from results
    val delSet = delIds.toSet
    val qSurvive = e.filter(!col("vec_id").cast("string").isin(delIds: _*)).limit(5)
    val hits = Ann.ivfTopK(back, qSurvive, "vec_id", "embedding", k = 3, nProbe = 4)
    val self = hits.filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(self.length == 5 && self.forall(identity))
    val qDel = e.filter(col("vec_id").cast("string").isin(delIds: _*))
    val delHits = Ann.ivfTopK(back, qDel, "vec_id", "embedding", k = 3, nProbe = 4)
    assert(delHits.filter(col("id").isin(delSet.toSeq: _*)).count() == 0L,
      "deleted ids must never appear in results")
  }

  test("ivf shrink: undersized lists dissolve into survivors, dense ids, rows preserved") {
    import java.nio.file.Files
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val dir = Files.createTempDirectory("ivfshrink").toString
    val idx = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 16)
    Ann.ivfSave(idx, dir)
    // thin the largest list to 2 rows via persisted delete, then shrink
    val sizes = idx.assigned.groupBy(col("cluster").cast("int").as("c"))
      .agg(count(lit(1)).as("n")).collect().map(r => r.getInt(0) -> r.getLong(1))
    val cBig = sizes.maxBy(_._2)._1
    val ids = idx.assigned.filter(col("cluster") === cBig)
      .select(col("id").cast("string")).collect().map(_.getString(0)).toSeq
    val keep2 = ids.take(2)
    val del = ids.drop(2)
    Ann.ivfDeleteSave(spark, dir, del)
    val (dissolved, receiving) = Ann.ivfShrinkSave(spark, dir, minFactor = 4.0)
    assert(dissolved.contains(cBig), s"thinned list $cBig must dissolve (got $dissolved)")
    assert(receiving.nonEmpty)
    val back = Ann.ivfLoad(spark, dir)
    // dense renumbering, fewer centroids, zero row loss
    assert(back.centroids.map(_._1) == (0 until back.centroids.size))
    assert(back.centroids.size == 16 - dissolved.size)
    assert(back.assigned.count() == e.count() - del.size)
    assert(back.assigned.filter(col("id").cast("string").isin(keep2: _*)).count() == 2,
      "the thinned list's surviving rows must move, not vanish")
    // probes on the shrunk geometry still self-hit
    val q = e.filter(!col("vec_id").cast("string").isin(del: _*))
      .orderBy(col("vec_id")).limit(5)
    val hits = Ann.ivfTopK(back, q, "vec_id", "embedding", k = 3, nProbe = 4)
    val self = hits.filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(self.length == 5 && self.forall(identity))
    // the in-memory twin reaches the same geometry
    val thinned = Ann.IvfIndex(idx.centroids,
      idx.assigned.filter(!col("id").cast("string").isin(del: _*)))
    val mem = Ann.ivfShrink(thinned, minFactor = 4.0)
    assert(mem.centroids.size == back.centroids.size)
    assert(mem.assigned.count() == back.assigned.count())
  }

  test("persisted ivf lifecycle: build, append, delete, shrink, maintain keep the contract throughout") {
    import java.nio.file.Files
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val dir = Files.createTempDirectory("ivflifecycle").toString
    // build WITHOUT vec_id < 10, then absorb them as an appended batch
    Ann.ivfSave(Ann.ivfBuild(e.filter(col("vec_id") >= 10), "vec_id", "embedding",
      nLists = 8), dir)
    val touched = Ann.ivfAppendSave(spark, dir,
      e.filter(col("vec_id") < 10), "vec_id", "embedding")
    assert(touched.nonEmpty)
    // delete five of the original rows, then run both maintenance ops
    // (each may be a no-op on this geometry — the contract below must
    // hold regardless of which of them fired)
    val del = (10 until 15).map(_.toString)
    Ann.ivfDeleteSave(spark, dir, del)
    Ann.ivfShrinkSave(spark, dir)
    Ann.ivfMaintain(spark, dir)
    val back = Ann.ivfLoad(spark, dir)
    assert(back.assigned.count() == e.count() - del.size)
    assert(back.assigned.filter(col("id").cast("string").isin(del: _*)).count() == 0L)
    assert(back.centroids.map(_._1) == (0 until back.centroids.size),
      "centroid ids must stay dense through the whole lifecycle")
    // appended rows still probe correctly after the full mutate sequence
    val q = e.filter(col("vec_id") < 10)
    val hits = Ann.ivfTopK(back, q, "vec_id", "embedding", k = 3, nProbe = 4)
    val self = hits.filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(self.length == 10 && self.forall(identity),
      "appended rows must survive delete/shrink/maintain and self-hit")
    assert(hits.filter(col("id").isin(del: _*)).count() == 0L)
  }

  test("residual ivfpq persisted delete: both layouts rewritten consistently; probes exclude deleted") {
    import java.nio.file.Files
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val dir = Files.createTempDirectory("ivfpqdelete").toString
    val ivf = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 8)
    Ann.ivfPqSave(Ann.ivfPqBuildResidual(ivf, m = 8, nCodes = 16), dir)
    val delIds = Seq("0", "1", "2")
    Ann.ivfPqDeleteSave(spark, dir, delIds)
    val back = Ann.ivfPqLoad(spark, dir)
    // coarse and code layouts stay row-consistent
    assert(back.codes.count() == e.count() - 3)
    assert(back.ivf.assigned.count() == e.count() - 3)
    assert(back.codes.filter(col("id").cast("string").isin(delIds: _*)).count() == 0L)
    val q = e.filter(col("vec_id") < 6)
    val hits = Ann.ivfPqResidualTopK(back, q, "vec_id", "embedding", k = 3, nProbe = 4)
    assert(hits.filter(col("id").isin(delIds: _*)).count() == 0L)
    // surviving queries (vec_id 3..5) still self-hit at rank 1
    val self = hits.filter(col("rank") === 1 && !col("qid").isin(delIds: _*))
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(self.length == 3 && self.forall(identity))
  }

  test("streaming tombstones: store, ivf index, and dedup index forget per microbatch") {
    import graft.operators.{DedupIndex, VectorStore}
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val e = Tables.embeddings(spark, TestSpark.sf)
    // persisted artifacts: bucketed store + ivf layout + dedup index
    val storeDir = Files.createTempDirectory("tombstore").toString
    VectorStore.Partitioned.init(
      VectorStore.fromDataFrame(e, "vec_id", "embedding", 64), storeDir, 8)
    val ivfDir = Files.createTempDirectory("tombivf").toString
    Ann.ivfSave(Ann.ivfBuild(e, "vec_id", "embedding", nLists = 8), ivfDir)
    val docs = Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id") < 100).select(col("doc_id"), col("text"))
    val idxDir = Files.createTempDirectory("tombdedup").toString
    DedupIndex.create(docs, "doc_id", "text", idxDir)
    // two tombstone microbatches, mtime-ordered for the file source
    val watch = Files.createTempDirectory("tomb_watch")
    def stage(name: String, ids: Seq[Long], mtime: Long): Unit = {
      val staging = Files.createTempDirectory(s"tombstage_$name")
      ids.toDF("id").coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = Files.list(staging).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = watch.resolve(s"$name.parquet")
      Files.copy(part, dst)
      Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    stage("t1", Seq(0L, 1L, 2L), t0)
    stage("t2", Seq(3L, 4L), t0 + 5000)
    val schema = spark.read.parquet(watch.toString).schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(watch.toString)
    val q = graft.streaming.StreamingOps.tombstoneStream(stream, "id",
      storePath = Some(storeDir), ivfPath = Some(ivfDir), dedupIndexPath = Some(idxDir))
    try q.processAllAvailable() finally q.stop()
    val del = (0L until 5L).map(_.toString)
    // store forgot
    val store = VectorStore.Partitioned.load(spark, storeDir)
    assert(store.df.count() == e.count() - 5)
    assert(store.df.filter(col("__id__").isin(del: _*)).count() == 0L)
    // ivf layout forgot
    val ivf = Ann.ivfLoad(spark, ivfDir)
    assert(ivf.assigned.count() == e.count() - 5)
    assert(ivf.assigned.filter(col("id").cast("string").isin(del: _*)).count() == 0L)
    // dedup index forgot: copies of the tombstoned docs are ingestable again
    val reprobe = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 900L).as("doc_id"), col("text"))
    assert(DedupIndex.filterExact(spark, idxDir, reprobe, "text").count() == 5L)
    // and surviving content is still blocked
    val blocked = docs.filter(col("doc_id") >= 5 && col("doc_id") < 10)
      .select((col("doc_id") + 900L).as("doc_id"), col("text"))
    assert(DedupIndex.filterExact(spark, idxDir, blocked, "text").isEmpty)
  }

  test("tombstone stream: a 120k-id batch flows as joins (no isin literal), untouched ivf dirs byte-identical") {
    import graft.operators.{DedupIndex, VectorStore}
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val e = Tables.embeddings(spark, TestSpark.sf)
    val storeDir = Files.createTempDirectory("bigtombstore").toString
    VectorStore.Partitioned.init(
      VectorStore.fromDataFrame(e, "vec_id", "embedding", 64), storeDir, 8)
    val ivfDir = Files.createTempDirectory("bigtombivf").toString
    val idx = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 8)
    Ann.ivfSave(idx, ivfDir)
    val bqDir = Files.createTempDirectory("bigtombbq").toString
    Ann.bqSaveIndex(e, "vec_id", "embedding", bqDir, nBuckets = 4)
    val docsT = Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id") < 100).select(col("doc_id"), col("text"))
    val idxDir = Files.createTempDirectory("bigtombdedup").toString
    DedupIndex.create(docsT, "doc_id", "text", idxDir)
    // real victims: five ids present everywhere; the other 120k ids in
    // the batch exist nowhere — the point is batch SIZE: the old
    // isin-literal/driver-collect form would build a 120k-element
    // In-expression inside every rewrite plan (the defect class the r12
    // 150k-tombstone compact spec pinned for the inverted index)
    val realDel = Seq(0L, 1L, 2L, 3L, 4L)
    val delClusters = idx.assigned
      .filter(col("id").cast("string").isin(realDel.map(_.toString): _*))
      .select(col("cluster").cast("int")).distinct().collect().map(_.getInt(0)).toSet
    def listing(root: String): Map[String, Long] =
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith("_"))
        .map(p => p.toString -> java.nio.file.Files.size(p)).toMap
    val before = listing(s"$ivfDir/lists")
    val bqBefore = listing(s"$bqDir/sigs")
    val watch = Files.createTempDirectory("bigtomb_watch")
    val staging = Files.createTempDirectory("bigtomb_stage")
    (realDel ++ (1000000L until 1120000L)).toDF("id")
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, watch.resolve("big.parquet"))
    val schema = spark.read.parquet(watch.toString).schema
    val stream = spark.readStream.schema(schema).parquet(watch.toString)
    val q = graft.streaming.StreamingOps.tombstoneStream(stream, "id",
      storePath = Some(storeDir), ivfPath = Some(ivfDir),
      dedupIndexPath = Some(idxDir), bqIndexPath = Some(bqDir))
    try q.processAllAvailable() finally q.stop()
    val delS = realDel.map(_.toString)
    // every layout forgot exactly the five real ids
    val store = VectorStore.Partitioned.load(spark, storeDir)
    assert(store.df.count() == e.count() - 5)
    assert(store.df.filter(col("__id__").isin(delS: _*)).count() == 0L)
    val ivf = Ann.ivfLoad(spark, ivfDir)
    assert(ivf.assigned.count() == e.count() - 5)
    assert(ivf.assigned.filter(col("id").cast("string").isin(delS: _*)).count() == 0L)
    val bq = Ann.bqLoadIndex(spark, bqDir)
    assert(bq.sigs.count() == e.count() - 5)
    val reprobe = docsT.filter(col("doc_id") < 5)
      .select((col("doc_id") + 900L).as("doc_id"), col("text"))
    assert(DedupIndex.filterExact(spark, idxDir, reprobe, "text").count() == 5L)
    // ivf dirs outside the victims' clusters stay byte-identical —
    // presence-based touched-set discovery, not id-hash fanout
    val after = listing(s"$ivfDir/lists")
    val untouchedBefore = before.filter { case (p, _) =>
      !delClusters.exists(c => p.contains(s"cluster=$c/")) }
    val untouchedAfter = after.filter { case (p, _) =>
      !delClusters.exists(c => p.contains(s"cluster=$c/")) }
    assert(untouchedBefore == untouchedAfter,
      "untouched ivf cluster dirs must not be rewritten by a 120k-id batch")
    // bq touched set is PRESENCE-based too: only the real ids' hash
    // buckets rewrite — 120k absent ids must not fan the rewrite out
    val bqAfter = listing(s"$bqDir/sigs")
    val realBuckets = realDel.map { id =>
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(id.toString),
        org.apache.spark.sql.types.StringType, 42L)
      s"bucket=${((h % 4L) + 4L) % 4L}/" // pmod, as bqBucketOf computes it
    }.toSet
    val bqUntouchedBefore = bqBefore.filter { case (p, _) =>
      !realBuckets.exists(p.contains) }
    val bqUntouchedAfter = bqAfter.filter { case (p, _) =>
      !realBuckets.exists(p.contains) }
    assert(bqUntouchedBefore == bqUntouchedAfter,
      "bq buckets not holding a real victim must stay byte-identical")
  }

  test("serving-tier tombstones: cache and replica forget, bitwise-equal to cold rebuild") {
    import graft.operators.VectorStore
    import java.nio.file.Files
    import scala.jdk.CollectionConverters._
    val e = Tables.embeddings(spark, TestSpark.sf)
    val dir = Files.createTempDirectory("tombserve").toString
    VectorStore.Partitioned.init(
      VectorStore.fromDataFrame(e, "vec_id", "embedding", 64), dir, 8)
    val cache = new java.util.concurrent.atomic.AtomicReference(
      graft.operators.MatrixStore.fromPartitionedLayout(spark, dir))
    val replica = new java.util.concurrent.atomic.AtomicReference(cache.get.toLocal())
    val watch = Files.createTempDirectory("tombserve_watch")
    val staging = Files.createTempDirectory("tombserve_stage")
    (0L until 5L).toDF("id").coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, watch.resolve("t1.parquet"))
    val schema = spark.read.parquet(watch.toString).schema
    val stream = spark.readStream.schema(schema).parquet(watch.toString)
    val q = graft.streaming.StreamingOps.tombstoneStreamServing(
      stream, "id", dir, cache, Some(replica), graceMillis = 0L)
    try q.processAllAvailable() finally q.stop()
    // both serving tiers forgot the ids without a cold rebuild
    val q0 = e.filter(col("vec_id") === 0).select("embedding").head()
      .getSeq[Float](0).toArray
    assert(!cache.get.query(q0, 10).toSeq.map(_._1).contains("0"))
    assert(!replica.get.query(q0, 10).toSeq.map(_._1).contains("0"))
    // and serve bitwise-identically to a cold rebuild of the mutated layout
    val cold = graft.operators.MatrixStore.fromPartitionedLayout(spark, dir)
    try {
      assert(cache.get.query(q0, 10).toSeq == cold.query(q0, 10).toSeq)
      assert(replica.get.query(q0, 10).toSeq == cold.toLocal().query(q0, 10).toSeq)
    } finally { cold.unpersist(); cache.get.unpersist() }
  }

  test("residual ivfpq shrink: moved rows residual-re-encode; both layouts consistent") {
    import java.nio.file.Files
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val dir = Files.createTempDirectory("ivfpqshrink").toString
    val ivf = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 16)
    Ann.ivfPqSave(Ann.ivfPqBuildResidual(ivf, m = 8, nCodes = 16), dir)
    // thin the biggest list to 2 rows, then shrink the composed index
    val sizes = ivf.assigned.groupBy(col("cluster").cast("int").as("c"))
      .agg(count(lit(1)).as("n")).collect().map(r => r.getInt(0) -> r.getLong(1))
    val cBig = sizes.maxBy(_._2)._1
    val ids = ivf.assigned.filter(col("cluster") === cBig)
      .select(col("id").cast("string")).collect().map(_.getString(0)).toSeq
    val keep2 = ids.take(2)
    val del = ids.drop(2)
    Ann.ivfPqDeleteSave(spark, dir, del)
    val (dissolved, receiving) = Ann.ivfPqShrinkSave(spark, dir, minFactor = 4.0)
    assert(dissolved.contains(cBig) && receiving.nonEmpty)
    val back = Ann.ivfPqLoad(spark, dir)
    // both layouts absorbed the move and agree row-for-row
    assert(back.codes.count() == e.count() - del.size)
    assert(back.ivf.assigned.count() == e.count() - del.size)
    assert(back.centNorm.map(_._1) == (0 until back.centNorm.size))
    assert(back.ivf.centroids.map(_._1) == (0 until back.ivf.centroids.size))
    // the moved rows' codes now quantize residuals vs their NEW centroid:
    // they must still self-hit at rank 1 through the full probe path
    val qMoved = e.filter(col("vec_id").cast("string").isin(keep2: _*))
    val hitsMoved = Ann.ivfPqResidualTopK(back, qMoved, "vec_id", "embedding",
      k = 3, nProbe = 6)
    val selfMoved = hitsMoved.filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(selfMoved.length == 2 && selfMoved.forall(identity),
      "moved rows must re-encode against their new centroid and stay probeable")
    // untouched rows keep working too
    val q = e.filter(!col("vec_id").cast("string").isin(del: _*))
      .orderBy(col("vec_id")).limit(5)
    val hits = Ann.ivfPqResidualTopK(back, q, "vec_id", "embedding", k = 3, nProbe = 6)
    val self = hits.filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(self.length == 5 && self.forall(identity))
  }

  test("pq and opq batch probes rank identically to their collect paths") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "id").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val pq = Ann.pqBuild(e, "vec_id", "embedding", m = 8, nCodes = 16)
    assert(key(Ann.pqTopKBatch(pq, q, "vec_id", "embedding", k = 5)) ==
      key(Ann.pqTopK(pq, q, "vec_id", "embedding", k = 5)))
    val opq = Ann.opqBuild(e, "vec_id", "embedding", m = 8, nCodes = 16)
    assert(key(Ann.opqTopKBatch(opq, q, "vec_id", "embedding", k = 5)) ==
      key(Ann.opqTopK(opq, q, "vec_id", "embedding", k = 5)))
  }

  test("iterated opq: procrustes alternation does not raise distortion; rotation stays orthonormal") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val (idx, dist) = Ann.opqBuildIterated(e, "vec_id", "embedding",
      m = 8, nCodes = 16, opqIters = 3)
    assert(dist.size == 3)
    // dist.head is the parametric-init distortion; alternation must not
    // end worse than it started (per-step KMeans reseeding noise aside)
    assert(dist.last <= dist.head + 1e-9,
      s"iterated distortion ${dist.last} worse than parametric init ${dist.head} ($dist)")
    // the SVD-updated rotation must still be orthonormal
    val R = idx.rotation.map(_.toArray).toArray
    val dim = R.length
    for (i <- 0 until dim; j <- i until dim) {
      var s = 0.0; var c = 0
      while (c < dim) { s += R(i)(c) * R(j)(c); c += 1 }
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(s - want) < 1e-8, s"RR^T[$i][$j] = $s after procrustes updates")
    }
    // the standard quality contract still holds on the refined index
    val q = e.filter(col("vec_id") < 10)
    val approx = Ann.opqTopK(idx, q, "vec_id", "embedding", k = 5)
    val self = approx.filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(self.length == 10 && self.forall(identity))
    val exact = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", 5)
      .withColumn("qid", col("qid").cast("string"))
    val hits = approx.join(exact, Seq("qid", "id"), "left_semi").count()
    assert(hits >= 30, s"iterated opq recall too low: $hits/50")
  }

  test("opq persisted append: batch encodes from sidecars alone; reload probes the batch") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val base = Ann.opqBuild(e.filter(col("vec_id") >= 5), "vec_id", "embedding", m = 8, nCodes = 16)
    val dir = java.nio.file.Files.createTempDirectory("opqappend").toString
    Ann.opqSave(base, dir)
    assert(Ann.opqAppendSave(spark, dir, q, "vec_id", "embedding") == 5L)
    val back = Ann.opqLoad(spark, dir)
    assert(back.pq.codes.count() == base.pq.codes.count() + 5)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "rank", "id").collect()
        .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    // row-for-row equal to the in-memory append path
    val mem = Ann.opqAppend(base, q, "vec_id", "embedding")
    val fromDisk = Ann.opqTopK(back, q, "vec_id", "embedding", k = 3)
    assert(key(fromDisk) == key(Ann.opqTopK(mem, q, "vec_id", "embedding", k = 3)))
    val self = fromDisk.filter(col("rank") === 1)
      .select((col("id") === col("qid")).as("ok")).as[Boolean].collect()
    assert(self.length == 5 && self.forall(identity),
      "persisted-appended rows must self-hit at rank 1")
  }

  test("segmentDupStats: per-doc duplication profile matches hand counts") {
    val df = Seq(
      (1L, "x y z a b c"),       // segs: "x y z"(dup), "a b c"
      (2L, "x y z q w e"),       // segs: "x y z"(dup), "q w e"
      (3L, "m n o")).toDF("doc_id", "text")
    val r = Dedup.segmentDupStats(df, "doc_id", "text", segWords = 3, maxDf = 1)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(r.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (3L, 1L, 0L, 0.0)))
  }

  test("prefixRerankTopK: full-corpus oversample reproduces brute force exactly") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val n = e.count().toInt
    // oversample covering the whole corpus -> the rerank IS brute force,
    // whatever the prefix nomination ordered
    val approx = Ann.prefixRerankTopK(e, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 3, dPrefix = 8, oversample = n / 3 + 1)
    val exact = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", k = 3)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.get(0).toString, r.getInt(1), r.getString(2), r.getDouble(3))).toSet
    assert(key(approx) == key(exact))
  }

  test("prefixRerankTopK: prefix = full dimension nominates in exact order") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val approx = Ann.prefixRerankTopK(e, "vec_id", "embedding", q, "vec_id", "embedding",
      k = 3, dPrefix = 64, oversample = 2)
    val exact = Ann.bruteForceTopK(e, "vec_id", "embedding", q, "vec_id", "embedding", k = 3)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.get(0).toString, r.getInt(1), r.getString(2), r.getDouble(3))).toSet
    assert(key(approx) == key(exact))
  }

  test("rrfFuse: hand-computed fusion, membership counts, id tiebreak") {
    val lex = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val vec = Seq((2L, 1), (3L, 2), (4L, 3)).toDF("id", "rank")
    val r = Ann.rrfFuse(Seq(lex, vec), "id", "rank", k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def rr(ranks: Int*): Double =  // Spark round() = HALF_UP
      BigDecimal(ranks.map(x => 1.0 / (60.0 + x)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.toSeq == Seq(
      (2L, rr(2, 1), 2L),   // in both lists
      (3L, rr(3, 2), 2L),
      (1L, rr(1), 1L),      // lex only
      (4L, rr(3), 1L)))     // vec only
  }

  test("opq: save/load round trip gives identical query results") {
    val e = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val idx = Ann.opqBuild(e, "vec_id", "embedding", m = 8, nCodes = 16)
    val dir = java.nio.file.Files.createTempDirectory("opqsave").toString
    Ann.opqSave(idx, dir)
    val back = Ann.opqLoad(spark, dir)
    assert(back.rotation == idx.rotation, "rotation must round-trip exactly (JSON doubles)")
    assert(back.pq.m == idx.pq.m && back.pq.codebooks == idx.pq.codebooks)
    val q = e.filter(col("vec_id") < 5)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(key(Ann.opqTopK(back, q, "vec_id", "embedding", k = 3).select("qid", "rank", "id")) ==
      key(Ann.opqTopK(idx, q, "vec_id", "embedding", k = 3).select("qid", "rank", "id")))
  }

  test("semanticDedupFromPairs over semanticPairs equals semanticDedup") {
    val rows = Seq(
      (1L, Seq(1.0, 0.0, 0.0), 0), (2L, Seq(0.999, 0.01, 0.0), 0),
      (3L, Seq(0.98, 0.05, 0.0), 0), (4L, Seq(0.0, 1.0, 0.0), 1),
      (5L, Seq(0.0, 0.999, 0.01), 1), (6L, Seq(0.0, 0.0, 1.0), 1))
      .toDF("id", "v", "cluster")
    val direct = Dedup.semanticDedup(rows, "id", "v", "cluster", tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val pairs = Dedup.semanticPairs(rows, "id", "v", "cluster", tau = 0.95,
      maxBlock = 65536)
    val viaPairs = Dedup.semanticDedupFromPairs(rows, "id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(viaPairs == direct)
  }

  test("stageIdFrame: LocalRelation fast path matches the generic arm") {
    // Seq.toDF optimizes to a LocalRelation -> the driver-local arm;
    // filtering a real table defeats it -> the distinct/checkpoint arm.
    // Both must stage the same distinct string id set and count.
    val local = Seq("7", "3", "3", "7", "9").toDF("id")
    val (ldf, ln) = Ann.stageIdFrame(local)
    assert(ln == 3L)
    assert(ldf.collect().map(_.getString(0)).toSet == Set("3", "7", "9"))
    // long-typed LocalRelation stages via toString == cast-to-string
    val (ldf2, ln2) = Ann.stageIdFrame(Seq(5L, 5L, 11L).toDF("vid"))
    assert(ln2 == 2L)
    assert(ldf2.collect().map(_.getString(0)).toSet == Set("5", "11"))
    // generic arm on a non-local plan: same results
    val tbl = Seq("7", "3", "3", "9").toDF("id").repartition(2)
    val (gdf, gn) = Ann.stageIdFrame(tbl.filter(col("id") =!= "0"))
    assert(gn == 3L)
    assert(gdf.collect().map(_.getString(0)).toSet == Set("3", "7", "9"))
  }
}
