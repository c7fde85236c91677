package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EventAnalytics, Multimodal, TextAnalysis}

class TextEventsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token counts: whitespace vs BPE-ish regex") {
    val df = Seq((1L, "hello world, 42 times!")).toDF("id", "text")
    val r = df.select(
      TextAnalysis.tokenCountWs(col("text")).as("ws"),
      TextAnalysis.tokenCountRegex(col("text")).as("re")).head()
    assert(r.getLong(0) == 4)
    // hello | world | , | 42 | times | !
    assert(r.getLong(1) == 6)
  }

  test("quality columns on a known string") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("id", "text")
    val m = TextAnalysis.qualityColumns(col("text"))
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }.head()
    assert(m.getAs[Long]("n_words") == 6)
    assert(m.getAs[Double]("punct_ratio") == 0.0)
    assert(math.abs(m.getAs[Double]("stopword_ratio") - 3.0 / 6) < 1e-9)
  }

  test("langid picks the marker-heavy language deterministically") {
    val df = Seq(
      (1L, "the cat is here and the dog is there"),
      (2L, "der hund und der mann und die frau"),
      (3L, "xyz qqq zzz")).toDF("id", "text")
    val out = TextAnalysis.langIdColumns(col("text"))
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .select("id", "lang_pred").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("sessionize splits on the inactivity gap") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val ev = Seq(
      (1L, ts(0), 7L, "click", 1.0, "{}"),
      (2L, ts(10), 7L, "click", 1.0, "{}"),
      (3L, ts(70), 7L, "click", 1.0, "{}"), // 60 min gap -> new session
      (4L, ts(75), 8L, "view", 2.0, "{}"))  // other user
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val s = EventAnalytics.sessionize(ev, gapMinutes = 30)
      .select("event_id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == 1 && s(2L) == 1 && s(3L) == 2 && s(4L) == 1)
    val stats = EventAnalytics.sessionStats(ev, 30)
    assert(stats.count() == 3)
  }

  test("multimodal: format sniffing via magic bytes and stub decode determinism") {
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 1, 2)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10)
    val txt = "hello".getBytes("UTF-8")
    val df = Seq((1L, jpeg, ""), (2L, png, ""), (3L, txt, "text"))
      .toDF("id", "media", "mimeHint")
    val sniffed = df.select(col("id"), Multimodal.sniffFormat(col("media")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sniffed == Map(1L -> "jpeg", 2L -> "png", 3L -> "bin"))
    val feats = Multimodal.decodeFeatures(df.as[Multimodal.MediaRow], dim = 8).collect()
    val byId = feats.map(f => f.id -> f).toMap
    assert(byId(1L).format == "jpeg" && byId(2L).format == "png" && byId(3L).format == "text")
    assert(byId(3L).n_bytes == 5)
    // determinism: same bytes -> same feature
    val again = Multimodal.decodeFeatures(df.as[Multimodal.MediaRow], dim = 8).collect()
      .map(f => f.id -> f).toMap
    assert(byId(1L).feature.toSeq == again(1L).feature.toSeq)
    // unit norm
    val n = math.sqrt(byId(1L).feature.map(x => x * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)
    // undecodable image-magic payloads fall back to the stub seam
    assert(byId(1L).width == -1 && byId(1L).height == -1 && byId(1L).avg_r == -1L)
  }

  test("multimodal: javax.imageio decodes real PNG/BMP pixels; stub kept elsewhere") {
    def solid(w: Int, h: Int, r: Int, g: Int, b: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = img.createGraphics()
      try { gfx.setColor(new java.awt.Color(r, g, b)); gfx.fillRect(0, 0, w, h) }
      finally gfx.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val png = solid(6, 4, 10, 20, 30, "png")
    val bmp = solid(3, 5, 200, 100, 50, "bmp")
    assert(Multimodal.tryDecodeImage(png).contains((6, 4, 10L, 20L, 30L)))
    assert(Multimodal.tryDecodeImage(bmp).contains((3, 5, 200L, 100L, 50L)))
    assert(Multimodal.tryDecodeImage("not an image".getBytes("UTF-8")).isEmpty)
    // through the distributed seam: real dims for decodable rows,
    // -1 sentinel (stub contract) for the rest
    val df = Seq((1L, png, ""), (2L, bmp, ""), (3L, "plain".getBytes("UTF-8"), "text"))
      .toDF("id", "media", "mimeHint")
    val byId = Multimodal.decodeFeatures(df.as[Multimodal.MediaRow], dim = 8)
      .collect().map(f => f.id -> f).toMap
    assert(byId(1L).format == "png" && byId(1L).width == 6 && byId(1L).height == 4 &&
      byId(1L).avg_r == 10L && byId(1L).avg_g == 20L && byId(1L).avg_b == 30L)
    assert(byId(2L).format == "bmp" && byId(2L).width == 3 && byId(2L).height == 5 &&
      byId(2L).avg_r == 200L)
    assert(byId(3L).format == "text" && byId(3L).width == -1 && byId(3L).avg_b == -1L)
    // sniffFormat agrees on the bmp magic
    val sniffed = df.select(col("id"), Multimodal.sniffFormat(col("media")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sniffed(2L) == "bmp")
  }

  test("dHash64: closed-form grid value, upscale collision, banded pairs complete") {
    import graft.operators.{Dedup, Multimodal}
    def png(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val p = gray(y, x)
        img.setRGB(x, y, (p << 16) | (p << 8) | p)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // 9x8 input: identity pooling — the hash is the direct comparison
    // grid, computable by hand from the pixel function
    def g0(r: Int, c: Int): Int = (c * 23 + r * 7) % 200
    val fp = Multimodal.dHash64(png(9, 8, g0)).get
    var want = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (g0(r, c) > g0(r, c + 1)) want |= 1L << (r * 8 + c)
    assert(fp == want)
    // a 3x pixel-doubled copy pools back to the same grid -> same hash
    assert(Multimodal.dHash64(png(27, 24, (y, x) => g0(y / 3, x / 3))).get == fp)
    // undecodable / too-small payloads yield None, and the pair join
    // drops them instead of matching failures to each other
    assert(Multimodal.dHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.dHash64(png(4, 4, (_, _) => 7)).isEmpty)
    // banding completeness: banded pairs == brute force at the radius
    val spark2 = spark
    import spark2.implicits._
    val rows = (0L until 40L).map { i =>
      Multimodal.MediaRow(i, png(9, 8,
        (r, c) => (((i / 2) * 37 + c * 23 + r * 7) % 200).toInt +
          (if (i % 2 == 1 && r == 0 && c == 0) 40 else 0)), "png")
    }
    val ph = Multimodal.imagePHashes(spark.createDataset(rows))
      .select(col("id"), col("phash")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, fa) <- ph; (ib, fb) <- ph if ia < ib
      hm = java.lang.Long.bitCount(fa ^ fb) if hm <= 2
    } yield (ia, ib, hm)).sortBy(p => (p._1, p._2)).toSeq
    val banded = Dedup.fingerprintPairs(
        Multimodal.imagePHashes(spark.createDataset(rows)), "id", "phash",
        maxHamming = 2)
      .orderBy(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(banded == brute, s"banded join must be pigeonhole-complete")
    assert(brute.nonEmpty, "fixture must actually produce near-dup pairs")
  }

  test("chunk sampling shapes") {
    val df = Seq((1L, ("x" * 1000).getBytes("UTF-8"))).toDF("id", "bin")
    val chunks = Multimodal.sampleChunks(df, "id", "bin", chunkBytes = 256, maxChunks = 3)
    assert(chunks.count() == 3) // capped below ceil(1000/256)=4
    assert(chunks.select("offset").as[Long].collect().toSeq == Seq(0L, 256L, 512L))
  }

  test("token chunks: stride boundaries, overlap, short tails, tiny docs") {
    import graft.operators.TextAnalysis
    val text = (1 to 50).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text), (2L, "a b c")).toDF("id", "text")
    val rows = df.select(col("id"),
        posexplode(TextAnalysis.tokenChunks(col("text"), chunkSize = 24, overlap = 4))
          .as(Seq("i", "chunk")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    // 50 tokens, stride 20: chunks start at 0/20/40
    assert(doc1.length == 3)
    assert(doc1(0) == (1 to 24).map(i => s"t$i").mkString(" "))
    assert(doc1(1) == (21 to 44).map(i => s"t$i").mkString(" "))
    assert(doc1(2) == (41 to 50).map(i => s"t$i").mkString(" ")) // short tail
    // consecutive chunks share exactly the 4-token overlap
    assert(doc1(0).split(" ").takeRight(4).sameElements(doc1(1).split(" ").take(4)))
    // a doc shorter than chunkSize is one whole chunk
    assert(rows.filter(_._1 == 2L).map(_._3).toSeq == Seq("a b c"))
  }

  test("hash sampling: deterministic, partitioning-independent, near the target rate") {
    import graft.operators.Relational
    val df = spark.range(10000L).toDF("id")
    val keep = Relational.hashSampleKeep(col("id"), 200)
    val a = df.filter(keep).collect().map(_.getLong(0)).toSet
    val b = df.repartition(17).filter(keep).collect().map(_.getLong(0)).toSet
    assert(a == b, "kept set must not depend on partitioning")
    assert(math.abs(a.size - 2000) < 200, s"kept ${a.size} of 10000 at 20%")
    // rate 0 and 1000 are the empty and full sets
    assert(df.filter(Relational.hashSampleKeep(col("id"), 0)).isEmpty)
    assert(df.filter(Relational.hashSampleKeep(col("id"), 1000)).count() == 10000L)
  }

  test("redact: urls, emails, long digit runs become typed placeholders") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "mail bob.smith+x@foo-bar.org or visit https://x.io/p?q=1 acct 12345678 ok"),
      (2L, "no pii here just words 123"))
      .toDF("id", "text")
    val out = TextAnalysis.redactColumns(col("text"))
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .orderBy("id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_urls") == 1L && r1.getAs[Long]("n_emails") == 1L &&
      r1.getAs[Long]("n_longnums") == 1L)
    assert(r1.getAs[String]("redacted") ==
      "mail [EMAIL] or visit [URL] acct [ID] ok")
    val r2 = out(1)
    assert(r2.getAs[Long]("n_urls") == 0L && r2.getAs[Long]("n_emails") == 0L &&
      r2.getAs[Long]("n_longnums") == 0L)
    assert(r2.getAs[String]("redacted") == "no pii here just words 123")
  }

  test("extractHtmlText: markup drops, boundaries kept, entities single-decode") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "<html><head><style a=b>h1{x:y}</style><script>if(a<b&&c>d){}</script>" +
        "</head><body><!-- boilerplate --><h1>Title</h1><p>one</p><p>two</p></body></html>"),
      // entity decode is SINGLE: &amp;lt; yields the literal '&lt;'
      (2L, "A &amp; B, &lt;tag&gt;, &quot;q&quot;, &#39;s&apos;, &amp;lt;,&nbsp;end"),
      // whitespace folds; an unclosed script keeps its text (documented)
      (3L, "a\n\n<br/>\t b <script>orphan"),
      (4L, "plain text untouched"))
      .toDF("id", "html")
    val got = df.select(col("id"),
        TextAnalysis.extractHtmlText(col("html")).as("t"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(got == Seq(
      "Title one two",
      "A & B, <tag>, \"q\", 's', &lt;, end",
      "a b orphan",
      "plain text untouched"))
  }

  test("streaming simhash pairs equal the batch band join on bounded input") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (500000L, "the quick brown fox jumps over the lazy dog"), // far-id exact dup
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "spark catalyst optimizer rewrites logical plans"),
      (5L, "completely different content about query engines"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("simhashstream")
    docs.write.parquet(s"$dir/data")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/data").schema).parquet(s"$dir/data")
    val streamed = graft.streaming.StreamingOps.runBounded(
        graft.streaming.StreamingOps.simhashPairsStream(stream, "doc_id", "text", maxHamming = 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed == batch)
    assert(streamed.exists { case (a, b, h) => a == 1L && b == 500000L && h == 0 })
  }

  test("streaming fingerprint pairs equal the batch band join (image phash shape)") {
    // precomputed 64-bit fingerprints standing in for image perceptual
    // hashes (incl. a null = undecodable payload, which must drop);
    // 0x11/0x13 differ by 1 bit, 0x11/0xF0F0 by many
    val docs = Seq(
      (1L, java.lang.Long.valueOf(0x11L)),
      (900000L, java.lang.Long.valueOf(0x11L)), // far-id exact dup
      (3L, java.lang.Long.valueOf(0x13L)),
      (4L, java.lang.Long.valueOf(0xF0F0L)),
      (5L, null.asInstanceOf[java.lang.Long]))
      .toDF("img_id", "phash")
    val dir = java.nio.file.Files.createTempDirectory("fpstream")
    docs.write.parquet(s"$dir/data")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/data").schema).parquet(s"$dir/data")
    val streamed = graft.streaming.StreamingOps.runBounded(
        graft.streaming.StreamingOps.fingerprintPairsStream(
          stream, "img_id", "phash", maxHamming = 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = graft.operators.Dedup.fingerprintPairs(
        docs, "img_id", "phash", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(streamed == batch)
    assert(streamed == Set((1L, 900000L, 0), (1L, 3L, 1), (3L, 900000L, 1)))
  }

  test("bloom two-phase contamination equals the exact formulation; bloom gate in plan") {
    import graft.operators.TextAnalysis
    val d = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val train = d.filter(col("doc_id") % 97 =!= 0)
    val eval_ = d.filter(col("doc_id") % 97 === 0)
    val bloom = TextAnalysis.contaminationStatsBloom(train, eval_, "doc_id", "text")
    val exact = TextAnalysis.contaminationStats(train, eval_, "doc_id", "text")
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(key(bloom) == key(exact))
    // the phase-1 gate is the native bloom expression, not a UDF
    assert(bloom.queryExecution.executedPlan.toString.contains("might_contain"))
    // no false negatives at a hostile fpp either: equality must hold
    // because phase 2 is exact (high fpp only flags more docs)
    val sloppy = TextAnalysis.contaminationStatsBloom(train, eval_, "doc_id", "text",
      fpp = 0.5)
    assert(key(sloppy) == key(exact))
  }

  test("streaming grouped contamination stats equal the batch formulation") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma completely different tail here"),
      (3L, "nothing shared with the benchmark split at all"))
      .toDF("doc_id", "text")
    val evalDocs = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val evalGrams = evalDocs
      .select(explode(graft.operators.Dedup.wordShingles(col("text"), 3)).as("gram"))
    val dir = java.nio.file.Files.createTempDirectory("contamstream")
    docs.write.parquet(s"$dir/data")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/data").schema).parquet(s"$dir/data")
    val streamed = graft.streaming.StreamingOps.runBounded(
        graft.streaming.StreamingOps.contaminationStatsStream(
          stream, evalGrams, "doc_id", "text"),
        mode = "complete")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = TextAnalysis.contaminationStats(docs, evalDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming contamination stats with event time run append-mode (watermark evicts)") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma completely different tail here"),
      (3L, "nothing shared with the benchmark split at all"))
      .toDF("doc_id", "text")
    val evalDocs = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val evalGrams = evalDocs
      .select(explode(graft.operators.Dedup.wordShingles(col("text"), 3)).as("gram"))
    val dir = java.nio.file.Files.createTempDirectory("contamwm")
    docs.write.parquet(s"$dir/data")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/data").schema).parquet(s"$dir/data")
      // synthetic event time: one hour per doc id, so every doc's window
      // closes once the watermark passes it
      .withColumn("ts", timestamp_seconds(col("doc_id") * 3600))
    // APPEND mode: rows only emit because the watermark finalizes (and
    // evicts) each doc's aggregation state — the unbounded-ingest path
    val streamed = graft.streaming.StreamingOps.runBounded(
        graft.streaming.StreamingOps.contaminationStatsStream(
          stream, evalGrams, "doc_id", "text", tsCol = Some("ts"), watermark = "1 hour"),
        mode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = TextAnalysis.contaminationStats(docs, evalDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // bounded-input caveat shared with stream_hourly: the finalized set
    // is everything the advancing watermark closed; on this fixture that
    // is all but the max-ts doc, which stays in state
    assert(streamed.subsetOf(batch) && streamed.nonEmpty)
  }

  test("streaming minhash pairs equal the batch band-join candidates") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (700000L, "the quick brown fox jumps over the lazy dog"), // far-id exact dup
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "spark catalyst optimizer rewrites logical plans"),
      (5L, "completely different content about query engines"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("minhashstream")
    docs.write.parquet(s"$dir/data")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/data").schema).parquet(s"$dir/data")
    val streamed = graft.streaming.StreamingOps.runBounded(
        graft.streaming.StreamingOps.minhashPairsStream(stream, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
        portableHash = true)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(streamed == batch)
    assert(streamed.contains((1L, 700000L)))
  }

  /** Shared driver for the two pair-stream TTL specs. With a
    * processing-time TTL the engine self-triggers empty batches to keep
    * evaluating timeouts, so `processAllAvailable` never observes "no
    * new data" — sync on cumulative source rows from query progress
    * instead. Sequence: doc 1 arrives, sits idle past the TTL (the
    * self-triggered batches evict its buckets), then an exact dup (doc 2)
    * arrives and must NOT pair with the evicted member; doc 3 follows
    * immediately (well inside doc 2's TTL) and must pair with doc 2. */
  private def ttlEvictionCheck(
      pairsOf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      sinkName: String): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dup = "the quick brown fox jumps over the lazy dog"
    val ms = MemoryStream[(Long, String)]
    val q = pairsOf(ms.toDF.toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName(sinkName).start()
    def waitProcessed(n: Long): Unit = {
      val end = System.currentTimeMillis + 60000
      def total = q.recentProgress.map(_.numInputRows).sum
      while (total < n && System.currentTimeMillis < end) Thread.sleep(50)
      assert(total >= n, s"stream did not reach $n input rows in time")
    }
    def got = spark.table(sinkName).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      ms.addData((1L, dup)); waitProcessed(1)
      Thread.sleep(6000) // idle past the 2s TTL -> doc 1's buckets evict
      // marker doc: proves a post-expiry batch ran before the dup arrives
      ms.addData((900L, "completely different content about query engines"))
      waitProcessed(2)
      ms.addData((2L, dup)); waitProcessed(3) // post-eviction: no (1,2)
      ms.addData((3L, dup)); waitProcessed(4) // inside doc 2's TTL: (2,3)
      val end = System.currentTimeMillis + 30000
      while (!got.contains((2L, 3L)) && System.currentTimeMillis < end)
        Thread.sleep(50)
      assert(got == Set((2L, 3L)),
        s"expected exactly the post-eviction pair (2,3), got $got")
    } finally q.stop()
  }

  test("pair-key dedup state is TTL-bounded: pair re-emits after the horizon") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dup = "the quick brown fox jumps over the lazy dog"
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingOps.minhashPairsStream(
        ms.toDF.toDF("doc_id", "text"), "doc_id", "text", ttl = Some("4 seconds"))
      .writeStream.outputMode("append").format("memory").queryName("t_pairbound").start()
    def waitProcessed(n: Long): Unit = {
      val end = System.currentTimeMillis + 60000
      def total = q.recentProgress.map(_.numInputRows).sum
      while (total < n && System.currentTimeMillis < end) Thread.sleep(50)
      assert(total >= n, s"stream did not reach $n input rows in time")
    }
    def pairCount = spark.table("t_pairbound").collect()
      .count(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    try {
      // warmup: the query's FIRST batch pays state-store init + JIT and
      // can exceed the TTL all by itself; pay it on a throwaway doc so
      // the paired adds below land well inside one TTL of each other
      ms.addData((999L, "warmup doc unrelated to anything else here"))
      waitProcessed(1)
      ms.addData((1L, dup)); waitProcessed(2)
      ms.addData((2L, dup)); waitProcessed(3) // emits (1,2) the first time
      val end0 = System.currentTimeMillis + 30000
      while (pairCount < 1 && System.currentTimeMillis < end0) Thread.sleep(50)
      assert(pairCount == 1)
      Thread.sleep(12000) // idle past the 4s TTL: bucket AND pair state evict
      ms.addData((1L, dup)); waitProcessed(4) // re-registers id 1; no pair yet
      ms.addData((2L, dup)); waitProcessed(5) // re-pairs (1,2) post-horizon
      val end = System.currentTimeMillis + 30000
      while (pairCount < 2 && System.currentTimeMillis < end) Thread.sleep(50)
      // the global-dedup formulation would suppress this forever; the
      // bounded store must let the re-surfaced pair through
      assert(pairCount == 2,
        "pair key must re-emit once the TTL evicted its dedup state")
    } finally q.stop()
  }

  test("minhash pair-stream TTL evicts idle bucket state") {
    ttlEvictionCheck(
      df => graft.streaming.StreamingOps.minhashPairsStream(
        df, "doc_id", "text", ttl = Some("2 seconds")),
      "t_ttl_pairs")
  }

  test("simhash pair-stream TTL evicts idle bucket state") {
    ttlEvictionCheck(
      df => graft.streaming.StreamingOps.simhashPairsStream(
        df, "doc_id", "text", maxHamming = 3, ttl = Some("2 seconds")),
      "t_ttl_sim")
  }

  test("stateful streaming sessionization closes sessions on the gap") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val dir = java.nio.file.Files.createTempDirectory("sessstream")
    Seq(
      (1L, ts(0), 7L, "click", 1.0, "{}"),
      (2L, ts(10), 7L, "click", 2.0, "{}"),
      (3L, ts(70), 7L, "click", 4.0, "{}"), // 60-min gap closes session 1
      (4L, ts(75), 8L, "view", 8.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/data")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/data").schema)
      .parquet(s"$dir/data")
    val q = graft.streaming.StreamingOps.runToCompletion(
      graft.streaming.StreamingOps.sessionizeStream(stream, gapMinutes = 30), "t_sess")
    try {
      val rows = spark.sql("SELECT * FROM t_sess ORDER BY user_id, session_seq").collect()
      // only user 7's first session is CLOSED within the stream; open
      // sessions (7's second, 8's only) remain in state
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getAs[Long]("user_id") == 7L)
      assert(r.getAs[Long]("n_events") == 2L)
      assert(r.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streaming sessionization timeout flushes idle users' open sessions") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val dir = java.nio.file.Files.createTempDirectory("sessflush")
    val watch = dir.resolve("watch")
    java.nio.file.Files.createDirectories(watch)
    // stage each batch with a normal write, then drop its part-file into
    // the watched dir (FileStreamSource wants plain files in ONE dir)
    def write(name: String, rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit = {
      val staging = dir.resolve(s"stage_$name")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part, watch.resolve(s"$name.parquet"))
    }
    write("b1", Seq((1L, ts(0), 7L, "click", 1.0, "{}"), (2L, ts(5), 7L, "click", 2.0, "{}")))
    val schema = spark.read.parquet(watch.toString).schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(watch.toString)
    // a timeout-bearing query keeps triggering (empty) batches to evaluate
    // timeouts, so processAllAvailable never settles — poll the sink
    val q = graft.streaming.StreamingOps.sessionizeStream(stream, gapMinutes = 30,
        flushTimeout = Some("1 second"))
      .writeStream.outputMode("append").format("memory").queryName("t_flush").start()
    try {
      val deadline = System.currentTimeMillis() + 60000
      def flushed() = spark.sql(
        "SELECT user_id, n_events, sum_value FROM t_flush WHERE user_id = 7").collect()
      while (flushed().isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(250)
      val rows = flushed()
      assert(rows.length == 1, "idle user's open session was not flushed by the timeout")
      assert(rows.head.getAs[Long]("n_events") == 2L)
      assert(rows.head.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("winnowing fingerprints: local overlap survives edits, short texts hash whole") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away home"
    val edited = "INTRO added. " + base // prefix edit: suffix k-grams unchanged
    val df = Seq((1L, base), (2L, edited), (3L, "tiny")).toDF("id", "text")
    val fps = df.select(col("id"),
        TextAnalysis.winnowFingerprints(col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val overlap = fps(1L).intersect(fps(2L)).size.toDouble / fps(1L).size
    assert(overlap > 0.5, s"local fingerprints should survive a prefix edit, overlap=$overlap")
    assert(fps(1L) != fps(2L), "edit must change at least one fingerprint")
    assert(fps(3L).size == 1, "texts shorter than k hash whole")
    // deterministic: sorted distinct
    val l = fps(1L).toSeq.sorted
    assert(df.filter(col("id") === 1)
      .select(TextAnalysis.winnowFingerprints(col("text"))).head().getSeq[Long](0) == l)
  }

  test("asofJoin picks the latest at-or-before right row, inclusive on ties") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val clicks = Seq((1L, 7L, ts(10)), (2L, 7L, ts(20)), (3L, 8L, ts(5)))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq((7L, ts(0), 10L, 5.0), (7L, ts(20), 11L, 7.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = EventAnalytics.asofJoin(clicks, purchases, "user_id", "ts")
      .select(col("event_id"), col("asof.event_id").as("pid"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    // click@10 -> purchase@0; click@20 -> purchase@20 (ties inclusive);
    // user 8 has no purchase -> null
    assert(out.toSeq == Seq((1L, 10L), (2L, 11L), (3L, -1L)))
  }

  test("lookbackStats counts right rows in [ts - lookback, ts) per key") {
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    val clicks = Seq((1L, 7L, ts(10)), (2L, 8L, ts(10))).toDF("event_id", "user_id", "ts")
    val views = Seq(
      (7L, ts(0), 2.0),   // exactly lookback before: included (inclusive lower)
      (7L, ts(9), 3.0),   // in window
      (7L, ts(10), 99.0), // at click ts: excluded (exclusive upper)
      (7L, ts(11), 99.0)) // after: excluded
      .toDF("user_id", "ts", "value")
    val out = EventAnalytics.lookbackStats(clicks, views, "user_id", "ts", "value", 10)
      .select(col("event_id"), col("n_matches"), col("sum_value"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 5.0), (2L, 0L, 0.0)))
  }

  test("streaming closed sessions = batch sessions minus each user's open tail") {
    val batch = EventAnalytics.sessionStats(Tables.events(spark, TestSpark.sf), gapMinutes = 30)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val expected = batch
      .withColumn("last_seq", max(col("session_seq")).over(w))
      .filter(col("session_seq") < col("last_seq"))
      .drop("last_seq")
      .orderBy(col("user_id"), col("session_seq"))
      .collect().toSeq
    val ev = graft.streaming.StreamingOps.eventsStream(
      spark, SparkEntry.stagedEventsDir(TestSpark.sf), maxFilesPerTrigger = None)
    val got = graft.streaming.StreamingOps
      .runBounded(graft.streaming.StreamingOps.sessionizeStream(ev, gapMinutes = 30))
      .orderBy(col("user_id"), col("session_seq"))
      .collect().toSeq
    assert(got == expected)
  }

  test("watermark drops late events in append mode") {
    def ts(min: Int) = new Timestamp(1700000000000L / 3600000L * 3600000L + min * 60000L)
    val dir = java.nio.file.Files.createTempDirectory("late")
    val watch = dir.resolve("watch")
    java.nio.file.Files.createDirectories(watch)
    def write(name: String, rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit = {
      val staging = dir.resolve(s"stage_$name")
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(staging.toString)
      val part = java.nio.file.Files.list(staging).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part, watch.resolve(s"$name.parquet"))
    }
    // batch 1: window [0,60) gets one event; t=130 pushes the watermark
    // to 70min once the batch commits
    write("b1", Seq(
      (1L, ts(0), 7L, "click", 1.0, "{}"),
      (2L, ts(130), 7L, "click", 1.0, "{}")))
    val schema = spark.read.parquet(watch.toString).schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(watch.toString)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("n"))
    val q = agg.writeStream.outputMode("append").format("memory").queryName("t_late").start()
    try {
      q.processAllAvailable()
      // batch 2: t=30 is BEHIND the 70min watermark -> dropped before the
      // aggregation; the closed [0,60) window emits with n=1, not 2
      write("b2", Seq((3L, ts(30), 7L, "click", 99.0, "{}")))
      q.processAllAvailable()
      val rows = spark.sql("SELECT ws, n FROM t_late").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val w0 = ts(0).getTime / 1000
      assert(rows == Seq((w0, 1L)),
        s"expected only the closed first window with the late row dropped, got $rows")
    } finally q.stop()
  }

  test("streaming windowed agg matches batch hourly counts") {
    val batch = EventAnalytics.hourlyAgg(Tables.events(spark, TestSpark.sf))
      .agg(sum("n")).as[Long].head()
    // FileStreamSource needs a directory, not a single file
    val dir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf}/events.parquet"),
      dir.resolve("events.parquet"))
    val stream = graft.streaming.StreamingOps.eventsStream(spark, dir.toString)
    val q = graft.streaming.StreamingOps.runToCompletion(
      graft.streaming.StreamingOps.windowedAgg(stream), "t_hourly", mode = "complete")
    try {
      // complete mode on bounded input surfaces every window: totals match
      // the batch aggregation exactly (unified batch/stream semantics)
      val emitted = spark.sql("SELECT coalesce(sum(n), 0) FROM t_hourly").as[Long].head()
      assert(emitted == batch)
    } finally q.stop()
  }

  test("sequence packing: offsets, spans, and per-group independence") {
    import graft.operators.TextAnalysis
    val df = Seq(
      ("a", 1L, Seq.fill(100)("w").mkString(" ")),  // 100 toks: seq 0 @ 0
      ("a", 2L, Seq.fill(200)("w").mkString(" ")),  // starts seq 0 @ 100, spans into seq 1
      ("a", 3L, Seq.fill(20)("w").mkString(" ")),   // starts seq 1 @ 44
      ("b", 9L, Seq.fill(300)("w").mkString(" ")))  // own group: seq 0 @ 0, spans 2
      .toDF("source", "doc_id", "text")
    val out = TextAnalysis.packSequences(df, "doc_id", "text", "source", 256)
      .orderBy(col("source"), col("doc_id")).collect()
    assert(out(0).getAs[Long]("seq_id") == 0 && out(0).getAs[Long]("seq_offset") == 0)
    assert(out(1).getAs[Long]("seq_id") == 0 && out(1).getAs[Long]("seq_offset") == 100)
    assert(out(1).getAs[Long]("n_seqs_spanned") == 2) // tokens 100..299 cross 256
    assert(out(2).getAs[Long]("seq_id") == 1 && out(2).getAs[Long]("seq_offset") == 44)
    assert(out(3).getAs[Long]("seq_id") == 0 && out(3).getAs[Long]("n_seqs_spanned") == 2)
  }

  test("mixture sampling: per-source rates, consistent with single-rate hash") {
    import graft.operators.Relational
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "keepall" else "dropall"))
      .toDF("id", "source")
    val kept = df.filter(Relational.mixtureSampleKeep(col("id"), col("source"),
        Seq("keepall" -> 1000, "dropall" -> 0), defaultPermille = 500))
      .collect().map(_.getLong(0))
    assert(kept.length == 500 && kept.forall(_ % 2 == 0))
    // a source at rate r keeps exactly the rows hashSampleKeep(r) keeps:
    // mixture membership is per-source consistent with the plain sampler
    val uni = df.filter(col("source") === "keepall")
      .filter(Relational.hashSampleKeep(col("id"), 300))
      .collect().map(_.getLong(0)).toSet
    val mix = df.filter(Relational.mixtureSampleKeep(col("id"), col("source"),
        Seq("keepall" -> 300), defaultPermille = 0))
      .collect().map(_.getLong(0)).toSet
    assert(uni == mix)
  }

  test("stratified quota: exact per-stratum counts, monotone in quota, partitioning-independent") {
    import graft.operators.Relational
    val docs = Tables.documents(spark, TestSpark.sf)
    val q10 = Relational.stratifiedQuota(docs, "doc_id", Seq("lang"), 10)
    val counts = q10.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    full.foreach { case (l, n) =>
      assert(counts(l) == math.min(10L, n), s"lang $l quota count") }
    // monotone: a larger quota SUPERSETS the smaller slice
    val ids10 = q10.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids20 = Relational.stratifiedQuota(docs, "doc_id", Seq("lang"), 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids10.subsetOf(ids20))
    // pure function of (strata, id): partitioning cannot change the pick
    val ids10b = Relational.stratifiedQuota(docs.repartition(7), "doc_id", Seq("lang"), 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids10b == ids10)
  }

  test("temperature mixing: shares sum to 1, small groups flatten up, sample is deterministic") {
    import graft.operators.Relational
    val docs = Tables.documents(spark, TestSpark.sf)
    val rates = Relational.temperatureMixRates(docs, "lang", targetRows = 300)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(math.abs(rates.map(_._3).sum - 1.0) < 1e-9)
    assert(rates.forall { case (_, _, _, r) => r > 0.0 && r <= 1.0 })
    // expected kept = sum(n · rate): at most the target (the min-cap only
    // removes mass), and well above half of it on this mix
    val expKept = rates.map { case (_, n, _, r) => n * r }.sum
    assert(expKept <= 300.0 + 1e-6 && expKept > 200.0, s"expected kept $expKept")
    // temperature flattening: the smallest group gets the largest rate
    val sorted = rates.sortBy(_._2)
    assert(sorted.head._4 >= sorted.last._4)
    // the applied sample is a pure function of (id, lang): rerun under a
    // different partitioning keeps the identical set, size near expectation
    val kept = Relational.temperatureSample(docs, "doc_id", "lang", 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(math.abs(kept.size - expKept) < 80, s"kept ${kept.size} vs expected $expKept")
    val kept2 = Relational.temperatureSample(docs.repartition(5), "doc_id", "lang", 300)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == kept)
  }

  test("upsampleRepeat: exact whole copies, fractional tail near expectation, deterministic") {
    import graft.operators.Relational
    val docs = Tables.documents(spark, TestSpark.sf).select(col("doc_id"), col("lang"))
    val n = docs.count()
    // integer weight: every row emits EXACTLY w copies (tail prob 0)
    val x2 = Relational.upsampleRepeat(docs, "doc_id", "lang", Map.empty, defaultWeight = 2.0)
    assert(x2.count() == 2 * n)
    assert(x2.groupBy("doc_id").count().filter(col("count") =!= 2).isEmpty)
    // copies carry distinct 0-based indices
    assert(x2.filter(!col("copy").isin(0L, 1L)).isEmpty)
    // fractional weight: multiplicity in {floor(w), floor(w)+1} and the
    // total lands near n*w (48-bit md5 draws are uniform)
    val x = Relational.upsampleRepeat(docs, "doc_id", "lang", Map.empty, defaultWeight = 1.6)
    val mult = x.groupBy("doc_id").count()
    assert(mult.filter(!col("count").isin(1L, 2L)).isEmpty)
    val total = x.count().toDouble
    assert(math.abs(total - 1.6 * n) < 0.15 * n, s"total $total vs ${1.6 * n}")
    // w < 1 degenerates to the plain downsample: subset of input, one copy each
    val down = Relational.upsampleRepeat(docs, "doc_id", "lang", Map.empty, defaultWeight = 0.3)
    assert(down.filter(col("copy") =!= 0L).isEmpty)
    assert(math.abs(down.count().toDouble - 0.3 * n) < 0.15 * n)
    // pure function of (id, group, weights): identical under repartition
    val a = x.select(col("doc_id"), col("copy")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Relational.upsampleRepeat(docs.repartition(7), "doc_id", "lang",
        Map.empty, defaultWeight = 1.6)
      .select(col("doc_id"), col("copy")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    // per-group weights hit their own groups only
    val wmap = Map("en" -> 3.0)
    val g = Relational.upsampleRepeat(docs, "doc_id", "lang", wmap, defaultWeight = 1.0)
    val en = docs.filter(col("lang") === "en").count()
    assert(g.filter(col("lang") === "en").count() == 3 * en)
    assert(g.filter(col("lang") =!= "en").count() == n - en)
    // the rates-frame twin rejects bad weights at runtime instead of
    // silently emitting wrong rows (negative floor -> descending copies)
    Seq(-1.0, Double.NaN, Double.PositiveInfinity).foreach { bad =>
      val rates = Seq(("en", bad)).toDF("lang", "weight")
      val ex = intercept[Exception] {
        Relational.upsampleRepeatByRates(docs, "doc_id", "lang", rates).count()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("weights must be finite and >= 0")),
        s"weight $bad must fail fast")
    }
    // and a valid rates frame still matches the literal-map twin
    val gr = Relational.upsampleRepeatByRates(docs, "doc_id", "lang",
      Seq(("en", 3.0), ("de", 1.0), ("fr", 1.0)).toDF("lang", "weight"))
    assert(gr.filter(col("lang") === "en").count() == 3 * en)
  }

  test("contamination: eval-set n-gram overlap fraction per training doc") {
    val train = Seq(
      (1L, "a b c d e f"),          // shares grams "a b c".."d e f" with eval
      (2L, "x y z w v u"),          // disjoint from eval
      (3L, "a b c q r s")).toDF("doc_id", "text") // one shared gram
    val eval_ = Seq((100L, "a b c d e f g")).toDF("doc_id", "text")
    val out = TextAnalysis.contaminationStats(train, eval_, "doc_id", "text",
        n = 3, threshold = 0.5)
      .orderBy(col("id")).collect()
    // doc 1: grams {abc,bcd,cde,def} all 4 in eval -> frac 1.0
    assert(out(0).getAs[Long]("n_grams") == 4 && out(0).getAs[Long]("n_hits") == 4)
    assert(out(0).getAs[Boolean]("contaminated"))
    // doc 2: zero overlap
    assert(out(1).getAs[Long]("n_hits") == 0 && !out(1).getAs[Boolean]("contaminated"))
    // doc 3: only "a b c" of its 4 grams -> 0.25 < 0.5
    assert(out(2).getAs[Long]("n_hits") == 1 && !out(2).getAs[Boolean]("contaminated"))
  }

  test("repetition: dup-word/dup-bigram/top-bigram fractions and flag") {
    val df = Seq(
      (1L, "spam spam spam spam"),     // maximally repetitive
      // 20 distinct words: top_bigram_frac floor is 1/19 < 0.07 — the
      // thresholds presuppose corpus-length docs, as Gopher's do
      (2L, ('a' to 't').map(_.toString).mkString(" ")),
      (3L, "one")).toDF("doc_id", "text") // no bigrams -> zeros, passes
    val out = TextAnalysis.repetitionColumns(col("text"))
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
      .orderBy(col("doc_id")).collect()
    assert(out(0).getAs[Double]("dup_word_frac") == 0.75)
    assert(out(0).getAs[Double]("top_bigram_frac") == 1.0) // "spam spam" x3 of 3
    assert(!out(0).getAs[Boolean]("repetition_pass"))
    assert(out(1).getAs[Double]("dup_word_frac") == 0.0)
    assert(out(1).getAs[Double]("dup_bigram_frac") == 0.0)
    assert(out(1).getAs[Boolean]("repetition_pass"))
    assert(out(2).getAs[Double]("top_bigram_frac") == 0.0)
    assert(out(2).getAs[Boolean]("repetition_pass"))
  }

  test("segment dedup drops cross-doc boilerplate segments, keeps order") {
    import graft.operators.Dedup
    // 3-word segments; "x y z" is shared boilerplate in docs 1 and 2
    val df = Seq(
      (1L, "x y z a b c"),
      (2L, "x y z d e f"),
      (3L, "g h i j k")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(df, "doc_id", "text", segWords = 3, maxDf = 1)
      .orderBy(col("id")).collect()
    assert(out(0).getAs[Long]("n_segments") == 2 && out(0).getAs[Long]("n_dropped") == 1)
    assert(out(0).getAs[String]("cleaned_text") == "a b c")
    assert(out(1).getAs[String]("cleaned_text") == "d e f")
    // doc 3: nothing shared; short tail segment preserved in order
    assert(out(2).getAs[Long]("n_dropped") == 0)
    assert(out(2).getAs[String]("cleaned_text") == "g h i j k")
  }

  test("segment dedup map: every dropped occurrence attributed to min-doc survivor") {
    import graft.operators.Dedup
    val df = Seq(
      (1L, "x y z a b c"),
      (2L, "x y z d e f x y z"), // boilerplate twice in doc 2 (idx 0 and 2)
      (3L, "g h i j k")).toDF("doc_id", "text")
    val m = Dedup.segmentDedupMap(df, "doc_id", "text", segWords = 3, maxDf = 1)
      .orderBy(col("id"), col("seg_idx"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    // occurrences: doc1 idx0 (the survivor), doc2 idx0, doc2 idx2
    assert(m.toSeq == Seq((1L, 0, 1L, 0), (2L, 0, 1L, 0), (2L, 2, 1L, 0)))
    // per-doc map counts agree with segmentDedup's n_dropped
    val dropped = Dedup.segmentDedup(df, "doc_id", "text", segWords = 3, maxDf = 1)
      .select("id", "n_dropped").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perDoc = m.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(dropped.forall { case (id, n) => perDoc.getOrElse(id, 0L) == n })
  }

  test("bm25TopK: hand-computed Okapi scores, zero-score docs excluded") {
    val docs = Seq(
      (1L, "a b a"),     // tf_a=2, dl=3
      (2L, "a c"),       // tf_a=1, dl=2
      (3L, "d d d d"),   // tf_d=4, dl=4
      (4L, "e f g")      // no query term -> excluded
    ).toDF("doc_id", "text")
    val r = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("a", "d"), k = 10)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    // independent scalar recompute of the same formula
    val n = 4.0; val avgdl = (3 + 2 + 4 + 3) / 4.0
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def term(idfV: Double, tf: Double, dl: Double) =
      idfV * tf / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val s1 = r6(term(idf(2), 2, 3))              // doc 1: only 'a'
    val s2 = r6(term(idf(2), 1, 2))              // doc 2: only 'a'
    val s3 = r6(term(idf(2), 0, 4) + term(idf(1), 4, 4)) // doc 3: only 'd'
    assert(r.toSeq == Seq((3L, s3), (1L, s1), (2L, s2)),
      s"got ${r.toSeq}, want ${Seq((3L, s3), (1L, s1), (2L, s2))}")
  }

  test("bm25TopK: k bound and determinism on the synthetic corpus") {
    val d = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val a = TextAnalysis.bm25TopK(d, "doc_id", "text", Seq("spark", "vector", "join"), k = 5)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    val b = TextAnalysis.bm25TopK(d, "doc_id", "text", Seq("spark", "vector", "join"), k = 5)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    assert(a.length == 5 && a.toSeq == b.toSeq)
    assert(a.map(_._2).sliding(2).forall(p => p.head >= p.last), "descending scores")
  }

  test("hot-fingerprint flood: star mode emits O(M) component-equivalent edges") {
    import graft.operators.Dedup
    // M-repost flood (one fingerprint posted 300 times) + a 3-member
    // near group 1 bit away + a 2-member far group — the web-image
    // dedup shape the guard exists for
    val flood = (1L to 300L).map(i => (i, 0x11L))
    val near = (401L to 403L).map(i => (i, 0x13L)) // hamming(0x11,0x13)=1
    val far = (501L to 502L).map(i => (i, 0xF0F0L))
    val docs = (flood ++ near ++ far).toDF("id", "fp")
    val full = Dedup.fingerprintPairs(docs, "id", "fp", maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // all-pairs semantics: C(300,2)+C(3,2)+C(2,2)=44854 exact pairs +
    // 300*3 cross pairs at hamming 1
    assert(full.size == 44850 + 3 + 1 + 900)
    assert(full.contains((1L, 401L, 1)) && full.contains((300L, 403L, 1)))
    val star = Dedup.fingerprintPairs(docs, "id", "fp", maxHamming = 1,
        exactStar = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // star semantics: (M-1) edges per exact group + ONE rep-to-rep pair
    // per near fp pair — O(M), not O(M^2)
    assert(star.size == 299 + 2 + 1 + 1, s"got ${star.size}")
    assert(star.contains((1L, 401L, 1)), "rep-to-rep near pair (min ids)")
    assert(star.forall { case (a, b, _) => a < b })
    // connectivity equivalence: identical dedup clusters
    def comps(pairs: Set[(Long, Long, Int)]) =
      Dedup.connectedComponents(pairs.toSeq.map(p => (p._1, p._2))
          .toDF("id_a", "id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(comps(star) == comps(full))
  }

  test("fingerprint maxBucket cap drops hot chunk buckets, never invents pairs") {
    import graft.operators.Dedup
    // ten DISTINCT fingerprints all sharing chunk 0 (low 32 bits = 0) —
    // the all-zero-chunk pileup flat images produce in a dHash
    val docs = (0L to 9L).map(k => (k + 1L, k << 32)).toDF("id", "fp")
    val uncapped = Dedup.fingerprintPairs(docs, "id", "fp", maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // pairs whose high chunks differ by 1 bit: (k, k') with
    // bitCount(k^k') == 1 — e.g. (0,1),(0,2),(1,3),...
    assert(uncapped.nonEmpty && uncapped.forall(_._3 == 1))
    val capped = Dedup.fingerprintPairs(docs, "id", "fp", maxHamming = 1,
        maxBucket = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // the shared chunk-0 bucket (10 > 5 members) is dropped; these fps
    // agree on NO other chunk, so discovery through it is gone — the
    // cap only ever loses pairs (documented recall trade), never adds
    assert(capped.subsetOf(uncapped))
    assert(capped.isEmpty, s"all candidate discovery ran through the hot bucket")
  }

  test("streaming star mode matches batch star mode on single-batch arrival") {
    import graft.operators.Dedup
    val flood = (1L to 50L).map(i => (i, java.lang.Long.valueOf(0x11L)))
    val near = Seq((401L, java.lang.Long.valueOf(0x13L)),
      (402L, java.lang.Long.valueOf(0x13L)))
    val docs = (flood ++ near).toDF("id", "fp")
    val dir = java.nio.file.Files.createTempDirectory("fpstar")
    docs.write.parquet(s"$dir/data")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/data").schema).parquet(s"$dir/data")
    val streamed = graft.streaming.StreamingOps.runBounded(
        graft.streaming.StreamingOps.fingerprintPairsStream(
          stream, "id", "fp", maxHamming = 1, exactStar = true))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = Dedup.fingerprintPairs(docs, "id", "fp", maxHamming = 1,
        exactStar = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // one microbatch + in-batch id sort => first-seen rep == min-id rep,
    // so the sets agree exactly (multi-batch arrival is only
    // connectivity-equivalent — documented)
    assert(streamed == batch)
    assert(streamed.size == 49 + 1 + 1)
  }

  test("audio: real WAV decode and closed-form energy fingerprint") {
    import graft.operators.{Dedup, Multimodal}
    // square wave at amplitude 3*2048, 15 frames of 256 samples — every
    // |sample| = A so each frame's 4-bit level is exactly 3
    def wav(level0: Int, level: Int): Array[Byte] = {
      val n = 256 * 15
      val pcm = new Array[Byte](n * 2)
      var t = 0
      while (t < n) {
        val l = if (t / 256 == 0) level0 else level
        val a = l * 2048
        val sv = if ((t / 16) % 2 == 0) a else -a
        pcm(2 * t) = (sv & 0xff).toByte
        pcm(2 * t + 1) = ((sv >> 8) & 0xff).toByte
        t += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val base = wav(3, 3)
    val dec = Multimodal.tryDecodeWavPcm(base)
    assert(dec.isDefined && dec.get.length == 256 * 15)
    assert(dec.get.forall(s => math.abs(s) == 3 * 2048))
    val fp = Multimodal.audioEnergyFingerprint(dec.get, 256)
    val expected = (0 until 15).map(i => 3L << (4 * i)).sum
    assert(fp == expected, s"fp=$fp expected=$expected")
    // frame-0 perturbation moves exactly one nibble: 3 -> 4 = 3 bits
    val fp1 = Multimodal.audioEnergyFingerprint(
      Multimodal.tryDecodeWavPcm(wav(4, 3)).get, 256)
    assert(java.lang.Long.bitCount(fp ^ fp1) == 3)
    // non-audio payloads take the null seam and drop from the pair join
    val rows = Seq(
      Multimodal.MediaRow(1L, base, "wav"),
      Multimodal.MediaRow(2L, wav(4, 3), "wav"),
      Multimodal.MediaRow(3L, Array[Byte](1, 2, 3), "bin"))
    val fps = Multimodal.audioFingerprints(
      spark.createDataset(rows)(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]))
    assert(fps.filter(col("afp").isNull).select("id").as[Long].collect().toSeq == Seq(3L))
    val pairs = Dedup.fingerprintPairs(fps, "id", "afp", maxHamming = 4, fpBits = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 3)))
  }

  test("audio: 8-bit PCM_SIGNED scales to the 16-bit range, not to silence") {
    import graft.operators.Multimodal
    // 8-bit signed square wave in an AU container (the javax.sound
    // route 8-bit SIGNED payloads arrive by — WAV 8-bit is unsigned):
    // amplitude level*8 must decode to level*2048 after the <<8 scale
    def au8(level0: Int, level: Int): Array[Byte] = {
      val n = 256 * 15
      val pcm = new Array[Byte](n)
      var t = 0
      while (t < n) {
        val l = if (t / 256 == 0) level0 else level
        val a = l * 8
        pcm(t) = (if ((t / 16) % 2 == 0) a else -a).toByte
        t += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
        javax.sound.sampled.AudioFileFormat.Type.AU, bos)
      bos.toByteArray
    }
    val dec = Multimodal.tryDecodeWavPcm(au8(3, 3))
    assert(dec.isDefined && dec.get.length == 256 * 15)
    assert(dec.get.forall(s => math.abs(s) == 3 * 2048),
      "8-bit samples must scale <<8 into the promised 16-bit range")
    // fingerprint equals the same-level 16-bit fixture's closed form —
    // NOT zero (the pre-fix behavior: every 8-bit payload -> silence)
    val fp = Multimodal.audioEnergyFingerprint(dec.get, 256)
    assert(fp == (0 until 15).map(i => 3L << (4 * i)).sum)
    assert(fp != 0L)
    // two different 8-bit amplitudes are NOT hamming-0 of each other
    val fpAlt = Multimodal.audioEnergyFingerprint(
      Multimodal.tryDecodeWavPcm(au8(9, 9)).get, 256)
    assert(java.lang.Long.bitCount(fp ^ fpAlt) > 4)
  }

  test("video: MP4 and AVI container headers parse to metadata; junk takes the null seam") {
    import graft.operators.Multimodal
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String) = s.getBytes("ISO-8859-1")
    def box(tp: String, p: Array[Byte]) = be32(p.length + 8L) ++ cc(tp) ++ p
    // MP4: timescale 1000, duration 7000 ticks, 640x360, avc1
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(7000) ++ Array.fill[Byte](80)(0))
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++
      be32(1) ++ be32(0) ++ be32(7000) ++ Array.fill[Byte](52)(0) ++
      be32(640L << 16) ++ be32(360L << 16))
    val stsd = box("stsd", Array[Byte](0, 0, 0, 0) ++ be32(1) ++
      (be32(16) ++ cc("avc1") ++ Array.fill[Byte](8)(0)))
    val mp4 = box("ftyp", cc("isom") ++ be32(0)) ++
      box("moov", mvhd ++ box("trak", tkhd ++ box("mdia", box("minf", box("stbl", stsd)))))
    assert(Multimodal.tryParseVideoMeta(mp4)
      .contains(Multimodal.VideoMeta("mp4", 7000L, 640, 360, "avc1")))
    // AVI: 40000 us/frame x 50 frames = 2000 ms, 320x240, mjpg
    val avih = cc("avih") ++ le32(56) ++ (le32(40000) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(50) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(320) ++ le32(240) ++ Array.fill[Byte](16)(0))
    val strh = cc("strh") ++ le32(56) ++ (cc("vids") ++ cc("mjpg") ++
      Array.fill[Byte](48)(0))
    val strl = cc("LIST") ++ le32(4L + strh.length) ++ cc("strl") ++ strh
    val hdrl = cc("LIST") ++ le32(4L + avih.length + strl.length) ++
      cc("hdrl") ++ avih ++ strl
    val avi = cc("RIFF") ++ le32(4L + hdrl.length) ++ cc("AVI ") ++ hdrl
    assert(Multimodal.tryParseVideoMeta(avi)
      .contains(Multimodal.VideoMeta("avi", 2000L, 320, 240, "mjpg")))
    // junk, truncation, and a lying extension all take the null seam
    assert(Multimodal.tryParseVideoMeta(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.tryParseVideoMeta(mp4.take(40)).isEmpty)
    assert(Multimodal.tryParseVideoMeta(cc("RIFF") ++ le32(4) ++ cc("WAVE")).isEmpty)
    // the distributed op carries the null seam as NULL columns
    val rows = Seq(Multimodal.MediaRow(1L, mp4, "mp4"),
      Multimodal.MediaRow(2L, avi, "avi"),
      Multimodal.MediaRow(3L, Array[Byte](9, 9), "bin"))
    val out = Multimodal.videoMetas(spark.createDataset(rows)(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]))
      .orderBy(col("id")).collect()
    assert(out.length == 3)
    assert(out(0).getString(2) == "mp4" && out(0).getLong(3) == 7000L)
    assert(out(1).getString(2) == "avi" && out(1).getInt(4) == 320)
    assert(out(2).isNullAt(2) && out(2).isNullAt(3) && out(2).isNullAt(6))
  }
}
