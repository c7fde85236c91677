package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * The reference has no dedup surface; these are the north-star extensions
  * (BASELINE.json) designed Spark-first: every variant is a pure
  * DataFrame transformation whose heavy phase is a hash-partitioned
  * groupBy/join, so it scales by partition parallelism with no driver
  * state. Candidate generation is always blocked/bucketed (LSH bands,
  * id-distance blocks) — never an unbounded O(N^2) cross join.
  */
object Dedup {

  // ------------------------------------------------------------- exact
  /** Exact dedup groups: content hash -> (survivor id, group size).
    * One shuffle on the content hash; map-side combinable. */
  def exactGroups(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame =
    df.groupBy(contentHash(contentCols).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  /** Content hash for exact dedup. Single column: plain md5 (ANSI-
    * mirrorable). Multiple columns: hash each column separately with a
    * distinct NULL encoding before combining, so ("ab","c") vs ("a","bc")
    * and ("a",NULL) vs (NULL,"a") do NOT collide the way a bare concat
    * would. */
  def contentHash(contentCols: Seq[String]): Column =
    if (contentCols.size == 1) md5(col(contentCols.head))
    else md5(concat_ws("|", contentCols.map(c =>
      md5(coalesce(col(c).cast(StringType), lit(" NULL")))): _*))

  /** Drop exact duplicates, keeping the smallest id per content group. */
  def dropExactDups(df: DataFrame, idCol: String, contentCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(contentCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") === 1)
      .drop("__rn__")
  }

  // ---------------------------------------------------------- shingles
  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (distinct). Texts shorter than n shingle to the
    * whole text so they can still hash-match exactly. Single-pass custom
    * expression ([[graft.functions.TextHashes.wordShingles]]); semantics
    * identical to the HOF formulation (see its Scaladoc). */
  def wordShingles(text: Column, n: Int): Column =
    graft.functions.TextHashes.wordShingles(text, n)

  /** Jaccard similarity of two array columns (set semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  // ----------------------------------------------------------- minhash
  /** MinHash signature: min of the g_k(x) = h1 + k*h2 family over the
    * shingle set, one byte-level pass per row
    * ([[graft.functions.TextHashes]]). */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    graft.functions.TextHashes.minhashSignature(shingles, numHashes)

  /** Engine-portable MinHash signature: the same g_k = h1 + k*h2 family
    * but with 48-bit md5-prefix base hashes, so `h1 + k*h2 < 2^53` is
    * exact BIGINT math any engine (and the DuckDB oracle) reproduces.
    * Value-identical to the HOF formulation
    * `transform(seq(0,n-1), k -> array_min(transform(shingles, s ->
    *   conv(md5(s)[1:12],16,10) + k * conv(md5(s)[13:24],16,10))))`
    * but one digest pass per shingle ([[graft.functions.PortableHashes]])
    * instead of n x shingles interpreted lambda frames. Slower than
    * [[minhashSignature]] (md5 vs xxhash64) — use it when cross-engine
    * checkability matters. */
  def minhashSignaturePortable(shingles: Column, numHashes: Int): Column =
    graft.functions.PortableHashes.portableMinHash(shingles, numHashes)

  /** Incremental exact dedup: drop batch rows whose content already
    * exists in a base corpus — the ingestion-time shape for a corpus
    * that grows batch by batch. The base side reduces to its DISTINCT
    * content hashes before the join (scalars; base text is never
    * reshuffled), and the batch anti-joins on the hash. The hash is
    * 128-bit md5 — the same family as [[contentHash]] — because hash
    * equality here IS content equality (no text verification follows):
    * at the billions-of-docs design point a 64-bit hash has a
    * plausible birthday collision, which would silently drop a unique
    * document; 2^64 is a rounding error, 2^128 is not. At 100 TB the
    * base hash projection is the persisted ingestion index — appended
    * per accepted batch, never rebuilt. */
  def dropExactDupsAgainst(base: DataFrame, batch: DataFrame,
      contentCol: String): DataFrame = {
    val baseH = base.select(md5(col(contentCol)).as("__h__")).distinct()
    batch.join(baseH, md5(col(contentCol)) === col("__h__"), "left_anti")
  }

  /** Explode (id, sig) rows into (id, band, band_hash) — the band-key
    * derivation shared by the in-memory band joins and the persisted
    * ingestion index ([[DedupIndex]]). Shuffles carry only these three
    * scalars. */
  private[operators] def bandedOfSignatures(sigs: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(array_join(
          transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast(StringType)), ",")))).as(Seq("band", "band_hash")))
  }

  /** (id, band, band_hash) rows for the MinHash band join — the shared
    * banding of [[minhashLshPairs]] and [[minhashLshPairsAgainst]]. */
  private def minhashBanded(base: DataFrame, shingleN: Int, numHashes: Int,
      bands: Int, portableHash: Boolean): DataFrame =
    bandedOfSignatures(
      base.withColumn("sig",
        if (portableHash) minhashSignaturePortable(wordShingles(col("text"), shingleN), numHashes)
        else minhashSignature(wordShingles(col("text"), shingleN), numHashes)),
      numHashes, bands)

  /** Cross-corpus MinHash-LSH near-dup pairs: candidates between an
    * incoming batch and an existing base corpus ONLY (base-internal
    * pairs are out of scope — the base is already deduped — and the
    * batch dedups itself with [[minhashLshPairs]]). Same banding as the
    * self-join variant, but the band join is base-banded × batch-banded,
    * so at scale the base's banded projection is the persisted LSH
    * index (append-only) and a batch's cost is proportional to the
    * batch, not the corpus. Output: (id_base, id_batch, est_jaccard
    * [, jaccard]). */
  def minhashLshPairsAgainst(
      base: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      exactVerify: Boolean = true, portableHash: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val baseN = base.select(col(idCol).as("id"), col(textCol).as("text"))
    val batchN = batch.select(col(idCol).as("id"), col(textCol).as("text"))
    val cand = minhashBanded(baseN, shingleN, numHashes, bands, portableHash)
      .select(col("band"), col("band_hash"), col("id").as("id_base"))
      .join(minhashBanded(batchN, shingleN, numHashes, bands, portableHash)
          .select(col("band"), col("band_hash"), col("id").as("id_batch")),
        Seq("band", "band_hash"))
      .select(col("id_base"), col("id_batch"))
      .distinct()
    def pay(side: DataFrame, candIds: DataFrame, suffix: String) = {
      val p = side.join(candIds, Seq("id"), "left_semi")
        .withColumn("shingles", wordShingles(col("text"), shingleN))
        .withColumn("sig",
          if (portableHash) minhashSignaturePortable(col("shingles"), numHashes)
          else minhashSignature(col("shingles"), numHashes))
      val cols = Seq(col("id").as(s"id_$suffix"), col("sig").as(s"sig_$suffix")) ++
        (if (exactVerify) Seq(col("shingles").as(s"sh_$suffix")) else Nil)
      p.select(cols: _*)
    }
    val pairs = cand
      .join(pay(baseN, cand.select(col("id_base").as("id")), "base"), Seq("id_base"))
      .join(pay(batchN, cand.select(col("id_batch").as("id")), "batch"), Seq("id_batch"))
    val est = (size(array_intersect(col("sig_base"), col("sig_batch")))
      .cast(DoubleType) / numHashes).as("est_jaccard")
    if (exactVerify)
      pairs.select(col("id_base"), col("id_batch"), est,
        jaccard(col("sh_base"), col("sh_batch")).as("jaccard"))
    else pairs.select(col("id_base"), col("id_batch"), est)
  }

  /** MinHash-LSH near-dup candidate pairs.
    *
    * shingle -> minhash signature -> band hashes -> explode bands ->
    * self-join on (band index, band hash) -> distinct candidate pairs with
    * signature-estimated and exact Jaccard. The band join is the only
    * shuffle over data-sized input; the pair set is bucket-bounded, never
    * all-pairs.
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      exactVerify: Boolean = true, portableHash: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))
    // Band shuffle carries ONLY (id, band, band_hash): the shingle and
    // signature arrays are projected away before the explode, so the
    // self-join moves 8 small rows per doc instead of 8 copies of every
    // array — the shuffle is what dominates at scale.
    val banded = minhashBanded(base, shingleN, numHashes, bands, portableHash)
    val cand = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("band_hash"), col("id").as("id_b")),
        Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // Payloads are re-derived for candidate rows only: semi-join on the
    // raw text FIRST, then compute shingles/signature on the survivors —
    // the bucket-bounded candidate set, not the corpus.
    val candIds = cand.select(col("id_a").as("id"))
      .unionByName(cand.select(col("id_b").as("id"))) // semi-join dedups
    val pay = base.join(candIds, Seq("id"), "left_semi")
      .withColumn("shingles", wordShingles(col("text"), shingleN))
      .withColumn("sig",
        if (portableHash) minhashSignaturePortable(col("shingles"), numHashes)
        else minhashSignature(col("shingles"), numHashes))
    def side(suffix: String) = {
      val cols = Seq(col("id").as(s"id_$suffix"), col("sig").as(s"sig_$suffix")) ++
        (if (exactVerify) Seq(col("shingles").as(s"sh_$suffix")) else Nil)
      pay.select(cols: _*)
    }
    val pairs = cand.join(side("a"), Seq("id_a")).join(side("b"), Seq("id_b"))
    val est = (size(array_intersect(col("sig_a"), col("sig_b"))).cast(DoubleType) / numHashes)
      .as("est_jaccard")
    if (exactVerify) {
      pairs.select(col("id_a"), col("id_b"), est,
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
    } else {
      pairs.select(col("id_a"), col("id_b"), est)
    }
  }

  // ----------------------------------------------------------- simhash
  /** 64-bit SimHash fingerprint over the token array, one pass per row
    * ([[graft.functions.TextHashes]]). */
  def simhash64(toks: Column): Column =
    graft.functions.TextHashes.simhash64(toks)

  /** Hamming distance between two 64-bit fingerprints. */
  def simhashHamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Engine-portable 48-bit SimHash: md5-prefix token hashes, per-bit
    * votes `(h >> b) & 1`, fingerprint < 2^48 — exact BIGINT math the
    * oracle reproduces ([[graft.functions.PortableHashes]], one digest
    * per token). Use [[simhash64]] when cross-engine checkability isn't
    * needed. */
  def simhash48Portable(toks: Column): Column =
    graft.functions.PortableHashes.portableSimHash48(toks)

  /** (chunk index, chunk value) struct array over a fingerprint column:
    * chunk i covers bits [i*fpBits/nChunks, (i+1)*fpBits/nChunks) — any
    * partition of the bits satisfies the pigeonhole argument. Shared by
    * the batch band join and its streaming twin
    * ([[graft.streaming.StreamingOps.simhashPairsStream]]). */
  private[graft] def fpChunks(fp: Column, fpBits: Int, nChunks: Int): Column =
    array((0 until nChunks).map { i =>
      val start = i * fpBits / nChunks
      val width = (i + 1) * fpBits / nChunks - start
      // 1L << 64 wraps to 1L in Scala: a full-width chunk (nChunks = 1
      // on the 64-bit hash) needs the all-ones mask spelled explicitly
      val mask = if (width >= 64) -1L else (1L << width) - 1L
      struct(lit(i).as("ci"),
        shiftrightunsigned(fp, start).bitwiseAND(lit(mask)).as("cv"))
    }: _*)

  /** Id-distance-blocked candidate pairs as an EQUI join.
    *
    * A raw `id_b BETWEEN id_a+1 AND id_a+B` predicate plans as a nested
    * loop (no equi keys). Bucketing ids into blocks of size B and probing
    * (block, block+1) turns it into a hash/sort-merge join on the block
    * key — partition-parallel with per-block bounded fan-out, which is the
    * shape that survives a 100x scale-up. Every qualifying pair lands in
    * exactly one probed block, so no dedup is needed.
    */
  private def blockedPairs(
      v: DataFrame, idCol: String, payload: String, idBlock: Long): DataFrame = {
    require(v.schema(idCol).dataType.isInstanceOf[NumericType],
      s"blocked pair generation needs a numeric id column, got " +
        s"${v.schema(idCol).dataType} for '$idCol' (map string ids to a " +
        "dense numeric surrogate first)")
    // floor division (not cast-truncation) so negative ids bucket correctly
    val blkOf = floor(col(idCol).cast(DoubleType) / idBlock).cast(LongType)
    val l = v.select(col(idCol).as("id_a"), col(payload).as(s"${payload}_a"),
      explode(array(blkOf, blkOf + 1)).as("blk"))
    val r = v.select(col(idCol).as("id_b"), col(payload).as(s"${payload}_b"),
      blkOf.as("blk"))
    l.join(r, Seq("blk"))
      .filter(col("id_b") > col("id_a") && col("id_b") <= col("id_a") + idBlock)
      .drop("blk")
  }

  /** SimHash near-dup pairs via fingerprint band join — FULL recall.
    *
    * The fingerprint is split into `maxHamming + 1` disjoint bit chunks;
    * by pigeonhole, any pair within Hamming distance `maxHamming` agrees
    * exactly on at least one whole chunk, so an equi self-join on
    * (chunk index, chunk value) finds EVERY qualifying pair regardless of
    * where the documents sit in the corpus — unlike id-distance blocking,
    * which only sees pairs that happen to be id-adjacent. Same shuffle
    * discipline as [[minhashLshPairs]]: the band shuffle carries only
    * (id, chunk index, chunk value, fingerprint) scalar rows, and the
    * per-bucket join fan-out is bounded by chunk-value collisions
    * (2^chunkBits buckets per chunk index), never all-pairs.
    *
    * `maxHamming` trades recall radius against candidate volume: more
    * chunks means narrower chunk values, hence hotter buckets. The
    * default (3 → four 16-bit chunks over the 64-bit fingerprint) is the
    * classic web-dedup configuration; raising it past ~7 makes chunks
    * narrow enough (<8 bits) that bucket sizes approach corpus scale —
    * prefer raising the shingle granularity instead.
    */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3,
      portableHash: Boolean = false): DataFrame = {
    val fpBits = if (portableHash) 48 else 64
    val fp = if (portableHash) simhash48Portable(tokens(col(textCol)))
      else simhash64(tokens(col(textCol)))
    fingerprintPairs(df.select(col(idCol).as("id"), fp.as("fp")),
      "id", "fp", maxHamming, fpBits)
  }

  /** Hamming-radius near-dup pairs over a PRECOMPUTED fingerprint
    * column — the band-join core of [[simhashPairs]] factored out for
    * any 64-bit-or-narrower fingerprint a pipeline computes upstream:
    * an image perceptual hash ([[Multimodal.imagePHashes]]), an audio
    * energy digest ([[Multimodal.audioFingerprints]]), a rolled
    * document fingerprint. Same pigeonhole completeness (any pair
    * within `maxHamming` agrees on a whole chunk → the equi self-join
    * finds EVERY qualifying pair) and same shuffle discipline: scalar
    * band rows, fan-out bounded by chunk-value collisions, never
    * all-pairs. Null fingerprints (e.g. undecodable payloads) drop — a
    * null is not equal to anything, matching SQL join semantics.
    *
    * HOT-FINGERPRINT GUARD: exact-equal fingerprints — the dominant
    * real-world duplicate shape (one image reposted M times) — are
    * collapsed to one row per DISTINCT fingerprint before banding, so
    * the band join's candidate space is bounded by the distinct-fp
    * collision structure, never by repost multiplicity: a flood of M
    * identical fingerprints contributes ONE banded row per chunk where
    * it used to contribute M (M²·(maxHamming+1)/2 join candidates).
    * Exact-duplicate pairs are recovered OUTSIDE the band join by a
    * single fingerprint equi self-join that emits final output rows
    * directly (output-bounded — no chunk fan-out, no post-join
    * distinct), and near-dup fp pairs expand back to member pairs by
    * two output-bounded joins. Default output is byte-identical to the
    * pre-guard operator: every (id_a < id_b, hamming ≤ maxHamming)
    * pair.
    *
    * `exactStar = true` switches the exact-duplicate shape from
    * all-pairs to STAR EDGES — (group min id, member, 0) per member —
    * and near-dup pairs to representative-to-representative, which is
    * CONNECTIVITY-EQUIVALENT (same [[connectedComponents]] clusters:
    * a star reaches every member the clique did) but O(M), not O(M²),
    * for an M-repost flood. Use it when the consumer is a clustering /
    * survivor pipeline rather than a pair audit.
    *
    * `maxBucket` caps hot (chunk index, chunk value) buckets of
    * DISTINCT fingerprints — e.g. the all-zero high-chunk that flat
    * images share in a dHash — dropping buckets past the cap from
    * candidate discovery, like [[winnowPairs]]' `maxDf` stopword cap.
    * Conservative in the same direction (never invents a pair) but,
    * unlike the exact collapse, LOSSY: a pair whose every agreeing
    * chunk is capped is missed. Off by default. */
  def fingerprintPairs(df: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int = 3, fpBits: Int = 64,
      exactStar: Boolean = false, maxBucket: Option[Int] = None): DataFrame = {
    val nChunks = maxHamming + 1
    require(fpBits >= 1 && fpBits <= 64, s"fpBits must be in [1, 64], got $fpBits")
    require(maxHamming >= 0 && nChunks <= fpBits,
      s"maxHamming must be in [0, ${fpBits - 1}], got $maxHamming")
    maxBucket.foreach(c => require(c >= 1, s"maxBucket must be >= 1, got $c"))
    val members = df.select(col(idCol).as("id"), col(fpCol).cast(LongType).as("fp"))
      .filter(col("fp").isNotNull)
    // one row per DISTINCT fingerprint through the band join; rep = min
    // id of the group (the star root / expansion anchor)
    val groups = members.groupBy(col("fp")).agg(min(col("id")).as("rep"))
    val banded0 = groups.select(col("fp"),
        explode(fpChunks(col("fp"), fpBits, nChunks)).as("c"))
      .select(col("fp"), col("c.ci").as("ci"), col("c.cv").as("cv"))
    val banded = maxBucket match {
      case Some(cap) =>
        val hot = banded0.groupBy(col("ci"), col("cv"))
          .agg(count(lit(1)).as("__n__")).filter(col("__n__") > cap)
          .select(col("ci"), col("cv"))
        banded0.join(hot, Seq("ci", "cv"), "left_anti")
      case None => banded0
    }
    // distinct-fp near pairs: hamming ≥ 1 is structural (equal fps
    // collapsed), so the band join never carries the flood
    val fpPairs = banded.select(col("ci"), col("cv"), col("fp").as("fp_a"))
      .join(banded.select(col("ci"), col("cv"), col("fp").as("fp_b")),
        Seq("ci", "cv"))
      .filter(col("fp_a") < col("fp_b"))
      .select(col("fp_a"), col("fp_b"),
        simhashHamming(col("fp_a"), col("fp_b")).cast(IntegerType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
    def orient(a: Column, b: Column, h: Column) =
      Seq(least(a, b).as("id_a"), greatest(a, b).as("id_b"), h.as("hamming"))
    if (exactStar) {
      val star = members.join(groups, Seq("fp"))
        .filter(col("id") =!= col("rep"))
        .select(col("rep").as("id_a"), col("id").as("id_b"),
          lit(0).cast(IntegerType).as("hamming"))
      val near = fpPairs
        .join(groups.select(col("fp").as("fp_a"), col("rep").as("ra")), Seq("fp_a"))
        .join(groups.select(col("fp").as("fp_b"), col("rep").as("rb")), Seq("fp_b"))
        .select(orient(col("ra"), col("rb"), col("hamming")): _*)
        .filter(col("id_a") =!= col("id_b")) // an id carrying two fps must not self-pair
      // distinct like the default branch: duplicated input rows (same
      // id+fp twice) must not duplicate star edges, and an id carrying
      // two equal-hamming fp routes must emit its rep pair once
      star.union(near).distinct()
    } else {
      val exact = members.select(col("fp"), col("id").as("id_a"))
        .join(members.select(col("fp"), col("id").as("id_b")), Seq("fp"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), lit(0).cast(IntegerType).as("hamming"))
      val near = fpPairs
        .join(members.select(col("fp").as("fp_a"), col("id").as("ia")), Seq("fp_a"))
        .join(members.select(col("fp").as("fp_b"), col("id").as("ib")), Seq("fp_b"))
        .select(orient(col("ia"), col("ib"), col("hamming")): _*)
        .filter(col("id_a") =!= col("id_b")) // an id carrying two fps must not self-pair
      exact.union(near).distinct()
    }
  }

  /** Cross-corpus SimHash near-dup pairs — the batch-vs-base twin of
    * [[simhashPairs]] and the Hamming-radius sibling of
    * [[minhashLshPairsAgainst]]: fingerprint chunks of the incoming
    * batch equi-join the base's chunks (pigeonhole-complete for
    * hamming <= maxHamming, like the self-join variant), so only
    * (base, batch) pairs emerge and a batch's cost is proportional to
    * the batch. At scale the base's (id, ci, cv, fp) projection is an
    * append-only stored index like [[DedupIndex]]'s band table.
    * Output: (id_base, id_batch, hamming). */
  def simhashPairsAgainst(
      base: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, portableHash: Boolean = false): DataFrame = {
    val fpBits = if (portableHash) 48 else 64
    val nChunks = maxHamming + 1
    require(maxHamming >= 0 && nChunks <= fpBits,
      s"maxHamming must be in [0, ${fpBits - 1}], got $maxHamming")
    def banded(df: DataFrame) = {
      val fp = if (portableHash) simhash48Portable(tokens(col(textCol)))
        else simhash64(tokens(col(textCol)))
      df.select(col(idCol).as("id"), fp.as("fp"))
        .select(col("id"), col("fp"), explode(fpChunks(col("fp"), fpBits, nChunks)).as("c"))
        .select(col("id"), col("fp"), col("c.ci").as("ci"), col("c.cv").as("cv"))
    }
    banded(base)
      .select(col("ci"), col("cv"), col("id").as("id_base"), col("fp").as("fp_base"))
      .join(banded(batch)
          .select(col("ci"), col("cv"), col("id").as("id_batch"), col("fp").as("fp_batch")),
        Seq("ci", "cv"))
      .select(col("id_base"), col("id_batch"),
        simhashHamming(col("fp_base"), col("fp_batch")).cast(IntegerType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // --------------------------------------------------- winnowing pairs
  /** Winnowing near-dup candidate pairs: the classic local-fingerprint
    * index. Explode each doc's winnowing fingerprints
    * ([[graft.functions.WinnowFingerprints]]), self-join the inverted
    * (fingerprint -> doc) index — the only data-sized shuffle — and keep
    * pairs whose shared-fingerprint fraction (shared / min fingerprint
    * count) clears the threshold. Robust to edits/reordering that break
    * whole-document hashing.
    *
    * `maxDf` is the hot-fingerprint cap: a fingerprint shared by d
    * documents contributes d·(d-1)/2 rows to the self-join, so one
    * boilerplate k-gram (license header, navigation chrome) shared by a
    * million documents would make the join quadratic. Fingerprints whose
    * document frequency exceeds the cap are dropped before the join,
    * like corpus stopwords; the overlap DENOMINATOR keeps each document's
    * original fingerprint count, so capping only ever shrinks overlap
    * (conservative — never invents a pair). */
  def winnowPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 16, minOverlap: Double = 0.25,
      maxDf: Option[Int] = None): DataFrame = {
    val withFps = df.select(col(idCol).as("id"),
        graft.functions.PortableHashes.winnowFingerprints(col(textCol), k, w).as("fps"))
      .withColumn("nfp", size(col("fps")))
    val inv0 = withFps.select(col("id"), col("nfp"), explode(col("fps")).as("fp"))
    val inv = maxDf match {
      case Some(cap) =>
        // fps are distinct per document, so count(*) per fp == doc freq
        val hot = inv0.groupBy(col("fp")).agg(count(lit(1)).as("__df__"))
          .filter(col("__df__") > cap).select(col("fp"))
        inv0.join(hot, Seq("fp"), "left_anti")
      case None => inv0
    }
    val a = inv.select(col("fp"), col("id").as("id_a"), col("nfp").as("n_a"))
    val b = inv.select(col("fp"), col("id").as("id_b"), col("nfp").as("n_b"))
    a.join(b, Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("overlap",
        col("shared").cast(DoubleType) / least(col("n_a"), col("n_b")).cast(DoubleType))
      .filter(col("overlap") >= minOverlap)
      .select(col("id_a"), col("id_b"), col("shared"), round(col("overlap"), 6).as("overlap"))
  }

  // --------------------------------------------------- dedup clustering
  /** Connected components over a near-dup pair list — the transitive
    * closure that turns pairwise matches into dedup clusters (A~B, B~C
    * => one group even though A,C never matched directly).
    *
    * Alternating large-star/small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond"): each round rewires every
    * node's strictly-larger neighbors to its local minimum (large-star),
    * then its smaller-or-equal neighborhood to that hood's minimum
    * (small-star). The edge set contracts toward a star forest rooted at
    * each component's minimum id in O(log diameter) rounds — unlike
    * one-hop min-label propagation ([[connectedComponentsMinLabel]]),
    * whose round count is the diameter itself and dies on long chains.
    * Every phase is one groupBy + one join over the canonical edge list;
    * the loop runs on the driver but all data stays distributed, with
    * `localCheckpoint` capping lineage per round.
    *
    * Returns (id, component) where component = min id of the cluster.
    *
    * Size-adaptive execution (round 19): the canonical edge list is
    * counted once; at or under `spark.graft.cc.localEdgeThreshold`
    * edges (default 500k — a few MB collected, the same order as a
    * broadcast-join build side) the transitive closure runs as a
    * driver-local min-root union-find over the collected edges, which
    * replaces the star loop's O(log d) rounds of ~6 jobs each with a
    * single collect. Above the threshold the distributed star loop
    * runs unchanged — it remains the 100 TB path; the gate is the same
    * adaptive small-side decision a broadcast join makes. The two arms
    * produce identical (id, component) row sets: the star fixpoint
    * roots every component at its minimum id, and the union-find
    * attaches the larger root under the smaller (string ids compare as
    * UTF-8 bytes, matching Spark's UTF8String ordering), so both label
    * every node with the component minimum ([[DedupAnnSpec]] pins the
    * cross-arm equality).
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = canonicalEdges(pairs).localCheckpoint(true)
    val n = edges.count()
    val threshold =
      try edges.sparkSession.conf.get("spark.graft.cc.localEdgeThreshold", "500000").toLong
      catch { case _: NumberFormatException => 500000L }
    if (n <= threshold) localComponents(edges)
    else starLoop(edges, n, maxIter)._1
  }

  /** Canonical undirected edge list: (u, v) with u < v, no self loops. */
  private def canonicalEdges(pairs: DataFrame): DataFrame =
    pairs
      .select(least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct()

  /** `a < b` under the SAME total order Spark's least/greatest and the
    * star loop's min() use for the supported id types (strings compare
    * as unsigned UTF-8 bytes, exactly UTF8String's binary order). */
  private def idLess(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Long, y: Long) => x < y
    case (x: Int, y: Int) => x < y
    case (x: Short, y: Short) => x < y
    case (x: Byte, y: Byte) => x < y
    case (x: Double, y: Double) => x < y
    case (x: Float, y: Float) => x < y
    case (x: String, y: String) =>
      val ab = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val bb = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val lim = math.min(ab.length, bb.length)
      while (i < lim) {
        val c = (ab(i) & 0xff) - (bb(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      ab.length < bb.length
    case _ => throw new IllegalArgumentException(
      s"connectedComponents local arm: unsupported id type ${a.getClass}")
  }

  /** Driver-local min-root union-find over a collected canonical edge
    * list — output rows identical to the star loop's fixpoint labels. */
  private def localComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val idType = edges.schema("u").dataType
    val rows = edges.collect()
    val parent = new java.util.HashMap[Any, Any]()
    def find(x0: Any): Any = {
      var x = x0
      var p = parent.get(x)
      while (p != null && p != x) { // path halving
        val gp = parent.get(p)
        if (gp != null && gp != p) { parent.put(x, gp); x = gp }
        else x = p
        p = parent.get(x)
      }
      x
    }
    rows.foreach { r =>
      val a = r.get(0); val b = r.get(1)
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (idLess(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size())
    val it = parent.keySet().iterator()
    while (it.hasNext) {
      val node = it.next()
      out.add(org.apache.spark.sql.Row(node, find(node)))
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("id", idType), StructField("component", idType))))
  }

  /** [[connectedComponents]] plus the number of alternation rounds used
    * (exposed for convergence tests). */
  private[graft] def connectedComponentsStarWithRounds(
      pairs: DataFrame, maxIter: Int = 20): (DataFrame, Int) = {
    val edges = canonicalEdges(pairs).localCheckpoint(true)
    starLoop(edges, edges.count(), maxIter)
  }

  /** The distributed alternating-star loop over an already-canonical,
    * checkpointed edge list with a known cardinality (shared by the
    * size-gated [[connectedComponents]] and the rounds-exposing test
    * seam above). */
  private def starLoop(edges0: DataFrame, nEdges0: Long,
      maxIter: Int): (DataFrame, Int) = {
    var edges = edges0

    def adj(e: DataFrame): DataFrame =
      e.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(e.select(col("v").as("src"), col("u").as("dst")))

    // large-star(u): rewire every strictly-larger neighbor to
    // m(u) = min(neighborhood ∪ {u}); emitted edges are canonical
    // because m <= u < dst
    def largeStar(e: DataFrame): DataFrame = {
      val a = adj(e)
      val m = a.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      a.filter(col("dst") > col("src")).join(m, "src")
        .select(col("m").as("u"), col("dst").as("v"))
        .distinct()
    }

    // small-star(u): rewire the smaller neighbors and u itself to the
    // minimum of that smaller neighborhood
    def smallStar(e: DataFrame): DataFrame = {
      val neg = adj(e).filter(col("dst") < col("src"))
      val m = neg.groupBy(col("src")).agg(min(col("dst")).as("m"))
      val nbrs = neg.join(m, "src").filter(col("dst") =!= col("m"))
        .select(col("m").as("u"), col("dst").as("v"))
      val self = m.select(col("m").as("u"), col("src").as("v"))
      nbrs.unionByName(self).distinct()
    }

    // exact set equality of two canonical distinct edge lists (known
    // cardinalities + empty anti-join) — deterministic, no
    // hash-signature shortcut that could mask a missed round. Counts
    // are carried across rounds (every frame is counted once, when
    // first materialized), so each equality test costs ONE job.
    def subsetOf(a: DataFrame, b: DataFrame): Boolean =
      a.join(b, Seq("u", "v"), "left_anti").isEmpty

    var nEdges = nEdges0
    var converged = nEdges == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      val afterLarge = largeStar(edges).localCheckpoint(true)
      val afterSmall = smallStar(afterLarge).localCheckpoint(true)
      val nSmall = afterSmall.count()
      // Convergence = both phases stable. Equivalent test with FEWER
      // jobs on non-final rounds: (edges == afterSmall) && (edges ==
      // afterLarge) ⟺ largeStable && smallStable — if both phases are
      // stable all three sets are equal; conversely edges == afterLarge
      // and edges == afterSmall give afterLarge == afterSmall. The
      // composed check runs every round (1 anti-join, counts carried);
      // the large-phase confirmation runs ONLY once the composed set
      // has stopped moving, so the steady-state rounds pay one
      // equality test instead of two. Edge-set sequence and round
      // count are identical to the two-test formulation.
      converged = nSmall == nEdges && subsetOf(afterSmall, edges) &&
        afterLarge.count() == nEdges && subsetOf(afterLarge, edges)
      edges = afterSmall
      nEdges = nSmall
      iter += 1
    }
    // a silent cutoff would hand back a half-contracted forest as if it
    // were components — fail loudly instead
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — raise maxIter")
    // belt + suspenders: the fixpoint must be a star forest (each leaf
    // has exactly one parent, no node is both parent and leaf);
    // nEdges carries the already-computed cardinality
    require(nEdges == edges.select(col("v")).distinct().count() &&
        edges.select(col("u")).intersect(edges.select(col("v"))).isEmpty,
      "connectedComponents fixpoint is not a star forest — algorithm invariant broken")
    val labels = edges.select(col("v").as("id"), col("u").as("component"))
      .unionByName(edges.select(col("u").as("id"), col("u").as("component")))
      .distinct()
    (labels, iter)
  }

  /** One-hop min-label propagation — the simple diameter-bound loop,
    * kept as an independent implementation for cross-checking
    * [[connectedComponents]] (and for shallow graphs, where its two
    * shuffles per round beat the star rounds' four).
    *
    * Returns (id, component) where component = min id of the cluster.
    */
  def connectedComponentsMinLabel(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    // initialization fuses the first propagation round: component_0 =
    // min(id, min(neighbors)) needs no join — the undirected edge list
    // already pairs every node with each neighbor
    var labels = edges
      .select(col("src").as("id"), least(col("src"), col("dst")).as("component"))
      .groupBy(col("id")).agg(min(col("component")).as("component"))
      .localCheckpoint(true)
    // per-node labels only ever decrease, so the label sum is strictly
    // monotone until the fixpoint — one aggregate per round detects
    // convergence without a join (exact DECIMAL: id sums can pass 2^63;
    // coalesce guards the empty-graph null sum)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("component").cast(DecimalType(38, 0))),
        lit(java.math.BigDecimal.ZERO))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = labels.isEmpty // no edges -> nothing to propagate
    var iter = 0
    while (!converged && iter < maxIter) {
      val fromNeighbors = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("component"))
      val next = labels.unionByName(fromNeighbors)
        .groupBy(col("id")).agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      val newSum = labelSum(next)
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      labels = next
      iter += 1
    }
    // a silent cutoff would return intermediate labels as if they were
    // components — fail loudly instead (raise maxIter past the diameter)
    require(converged,
      s"connectedComponentsMinLabel did not converge in $maxIter rounds — " +
        "the graph diameter exceeds maxIter; raise it (or use the " +
        "large-star/small-star connectedComponents, which is log-diameter)")
    labels
  }

  /** Survivor selection over near-dup clusters: keep one document per
    * connected component (its min id), drop the rest — the final step of
    * the pairs -> clusters -> corpus dedup pipeline. Unpaired documents
    * pass through untouched. */
  def dropNearDups(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val losers = connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** [[dropNearDups]] with a QUALITY-AWARE survivor policy: keep the
    * component member MAXIMIZING `scoreCol` (ties broken by ascending
    * id, so selection stays deterministic and cross-engine
    * reproducible) instead of the minimum id. This is the production
    * dedup stance: a near-dup cluster should keep its best-quality
    * member (longest, cleanest, highest LM score — any
    * [[TextAnalysis.qualityColumns]] output works), not whichever
    * happened to be crawled first. Unpaired documents pass through
    * untouched.
    *
    * Scale shape: components ride the existing log-diameter star
    * contraction; the survivor pick adds ONE WindowGroupLimit pass
    * over the PAIRED rows only (a groups-sized frame — unpaired rows,
    * the vast majority at realistic dup rates, never enter the
    * window shuffle), and the final anti-join carries only loser ids. */
  def dropNearDupsBy(df: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    val idT = df.schema(idCol).dataType
    val scored = comp.join(
      df.select(col(idCol).cast(comp.schema("id").dataType).as("id"),
        col(scoreCol).as("__score__")), Seq("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(col("__score__").desc, col("id"))
    val losers = scored
      .withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") =!= 1)
      .select(col("id").cast(idT).as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Provenance twin of [[dropNearDupsBy]]: (survivor_id, dropped_id)
    * under the best-scoring survivor policy — every dropped document
    * attributes to the member that replaced it, exactly as
    * [[survivorMap]] does for the min-id policy. Derived from the same
    * components and the same (score desc, id asc) window, so
    * dropNearDupsBy(df) ∪ {dropped ids here} == the paired universe. */
  def survivorMapBy(df: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame): DataFrame = {
    val comp = connectedComponents(pairs)
    val scored = comp.join(
      df.select(col(idCol).cast(comp.schema("id").dataType).as("id"),
        col(scoreCol).as("__score__")), Seq("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
      .orderBy(col("__score__").desc, col("id"))
    val ranked = scored.withColumn("__rn__", row_number().over(w))
    val winners = ranked.filter(col("__rn__") === 1)
      .select(col("component"), col("id").as("survivor_id"))
    ranked.filter(col("__rn__") =!= 1)
      .select(col("component"), col("id").as("dropped_id"))
      .join(winners, Seq("component"))
      .select(col("survivor_id"), col("dropped_id"))
  }

  /** Dedup provenance: (survivor_id, dropped_id) for every document a
    * dedup pass removed — the lineage record a training-data pipeline
    * keeps so every dropped document is attributable to the survivor
    * that replaced it (audit, contamination tracing, re-dedup after
    * appeals). Derived from the same components as [[dropNearDups]], so
    * survivors(pairs) ∪ droppedIds == all paired docs, exactly. */
  def survivorMap(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .filter(col("id") =!= col("component"))
      .select(col("component").as("survivor_id"), col("id").as("dropped_id"))

  // ------------------------------------------ segment-level (C4-style)
  /** Segment-level cross-document dedup (the C4/RefinedWeb "drop
    * repeated lines" pass, on fixed word windows since this corpus has
    * no newlines): split every document into non-overlapping
    * `segWords`-word segments, count each distinct segment's document
    * frequency, drop segment OCCURRENCES whose segment appears in more
    * than `maxDf` distinct documents (boilerplate), and reassemble the
    * surviving segments in document order.
    *
    * Scale shape: NO shuffle in the pipeline carries segment text. The
    * per-occurrence pass emits only (id, seg_idx, seg_hash) scalars —
    * the segment text is hashed in place on the row it was sliced from
    * and discarded. The frequency table is one groupBy on the hash
    * (map-side combinable; a boilerplate segment with millions of
    * occurrences stays one COUNT row, so hot segments cannot skew it);
    * the per-occurrence df-lookup joins occurrences against the
    * boilerplate hashes only; the per-doc dropped-index sets then join
    * back to the ORIGINAL doc row, which re-slices its own text
    * locally. Since dropped-index rows exist only for docs that hit
    * boilerplate, that last join's build side is a small fraction of
    * the corpus and AQE broadcasts it — the document text never enters
    * any exchange. The same discipline at 100 TB: shuffle bytes are
    * O(occurrences × scalars), never O(corpus text).
    *
    * Output: (id, n_segments, n_dropped, cleaned_text); documents whose
    * every segment is boilerplate survive with an empty cleaned_text —
    * dropping them is a separate policy decision left to the caller.
    */
  def segmentDedup(
      df: DataFrame, idCol: String, textCol: String,
      segWords: Int = 10, maxDf: Int = 1): DataFrame = {
    require(segWords > 0 && maxDf >= 1, s"need segWords>0, maxDf>=1")
    def toksOf(c: Column) = split(c, " ")
    def nSegsOf(toks: Column) =
      ceil(size(toks).cast(DoubleType) / segWords).cast(IntegerType)
    def segAt(toks: Column, i: Column) =
      array_join(slice(toks, i * segWords + 1, lit(segWords)), " ")
    // Per-occurrence 64-bit content addresses: (id, seg_idx, seg_hash)
    // scalars only — the segment text never leaves its source row.
    val segMeta = df.select(col(idCol).as("id"), {
      val toks = toksOf(col(textCol))
      posexplode(transform(sequence(lit(0), nSegsOf(toks) - 1),
        i => xxhash64(segAt(toks, i)))).as(Seq("seg_idx", "seg_hash"))
    })
    val boiler = segMeta.groupBy(col("seg_hash"))
      .agg(countDistinct(col("id")).as("seg_df"))
      .filter(col("seg_df") > maxDf)
    val droppedIdx = segMeta.join(boiler, Seq("seg_hash"))
      .groupBy(col("id"))
      .agg(collect_list(col("seg_idx")).as("dropped_idx"))
    val joined = df.select(col(idCol).as("id"), col(textCol).as("__seg_txt"))
      .join(droppedIdx, Seq("id"), "left_outer")
    val toks = toksOf(col("__seg_txt"))
    val nSegs = nSegsOf(toks)
    val dropped = coalesce(col("dropped_idx"),
      array().cast(ArrayType(IntegerType, containsNull = false)))
    joined.select(
      col("id"),
      nSegs.cast(LongType).as("n_segments"),
      size(dropped).cast(LongType).as("n_dropped"),
      array_join(transform(
        filter(sequence(lit(0), nSegs - 1), i => !array_contains(dropped, i)),
        i => segAt(toks, i)), " ").as("cleaned_text"))
  }

  /** Provenance for [[segmentDedup]]: one row per occurrence of a
    * boilerplate segment, attributing it to the canonical survivor
    * occurrence (lowest doc id, then lowest segment index within that
    * doc) — the segment-level analogue of the doc-level survivor map
    * (`pipe_dedup_map`), so a C4 pass is auditable: every removed
    * span can be traced to where its content canonically lives.
    *
    * Same shuffle discipline as [[segmentDedup]]: occurrences are
    * (id, seg_idx, seg_hash) scalars; the survivor attribution is a
    * min-struct aggregate per hash; no exchange ever carries text.
    *
    * Output: (id, seg_idx, survivor_id, survivor_seg_idx), one row per
    * boilerplate occurrence INCLUDING the survivor occurrence itself
    * (its id/seg_idx equal the survivor columns) — [[segmentDedup]]
    * drops all occurrences, so the audit keeps all of them too. */
  def segmentDedupMap(
      df: DataFrame, idCol: String, textCol: String,
      segWords: Int = 10, maxDf: Int = 1): DataFrame = {
    require(segWords > 0 && maxDf >= 1, s"need segWords>0, maxDf>=1")
    def toksOf(c: Column) = split(c, " ")
    val segMeta = df.select(col(idCol).as("id"), {
      val toks = toksOf(col(textCol))
      val nSegs = ceil(size(toks).cast(DoubleType) / segWords).cast(IntegerType)
      posexplode(transform(sequence(lit(0), nSegs - 1),
        i => xxhash64(array_join(slice(toks, i * segWords + 1, lit(segWords)), " "))))
        .as(Seq("seg_idx", "seg_hash"))
    })
    val boiler = segMeta.groupBy(col("seg_hash"))
      .agg(countDistinct(col("id")).as("seg_df"),
        min(struct(col("id"), col("seg_idx"))).as("surv"))
      .filter(col("seg_df") > maxDf)
      .select(col("seg_hash"),
        col("surv.id").as("survivor_id"),
        col("surv.seg_idx").as("survivor_seg_idx"))
    segMeta.join(boiler, Seq("seg_hash"))
      .select(col("id"), col("seg_idx"), col("survivor_id"), col("survivor_seg_idx"))
  }

  /** Gopher-style per-document duplication profile: for every document,
    * how many of its `segWords`-word segments also appear in more than
    * `maxDf` distinct documents, and the fraction they make up — the
    * quality signal behind "drop documents whose duplicated-content
    * fraction exceeds X" repetition filters. The profiling twin of
    * [[segmentDedup]] (which rewrites text): emits (id, n_segments,
    * n_dup, dup_frac rounded to 6 dp) and leaves the filter policy to
    * the caller.
    *
    * Same shuffle discipline as [[segmentDedup]]: occurrences are
    * (id, seg_idx, seg_hash) scalars hashed in place, the frequency
    * table is one map-side-combinable groupBy on the hash, and the
    * boilerplate flags join back as a broadcast — no exchange carries
    * text. */
  def segmentDupStats(
      df: DataFrame, idCol: String, textCol: String,
      segWords: Int = 10, maxDf: Int = 1): DataFrame = {
    require(segWords > 0 && maxDf >= 1, s"need segWords>0, maxDf>=1")
    def toksOf(c: Column) = split(c, " ")
    val segMeta = df.select(col(idCol).as("id"), {
      val toks = toksOf(col(textCol))
      val nSegs = ceil(size(toks).cast(DoubleType) / segWords).cast(IntegerType)
      posexplode(transform(sequence(lit(0), nSegs - 1),
        i => xxhash64(array_join(slice(toks, i * segWords + 1, lit(segWords)), " "))))
        .as(Seq("seg_idx", "seg_hash"))
    })
    val boiler = segMeta.groupBy(col("seg_hash"))
      .agg(countDistinct(col("id")).as("seg_df"))
      .filter(col("seg_df") > maxDf)
      .select(col("seg_hash"), lit(1L).as("__dup__"))
    segMeta.join(boiler, Seq("seg_hash"), "left_outer")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(coalesce(col("__dup__"), lit(0L))).as("n_dup"))
      .select(col("id"), col("n_segments"), col("n_dup"),
        round(col("n_dup").cast(DoubleType) / col("n_segments"), 6).as("dup_frac"))
  }

  // ------------------------------------------- embedding near-duplicates
  /** Embedding-cosine near-dup pairs within id-distance blocks — a
    * bounded-candidate variant for corpora where near-dups ARE
    * id-adjacent (e.g. consecutive crawl snapshots). Candidate recall
    * collapses when they are not; [[embeddingNearDupsLsh]] is the
    * content-addressed generator that scales. */
  def embeddingNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, idBlock: Long = 50): DataFrame = {
    // normalize once per row (before the pair fan-out): cosine == dot on
    // unit vectors, so each candidate pair costs one dot instead of three
    val v = df.select(col(idCol).as("id"),
      graft.functions.VectorNormalize.normalize(col(vecCol), outputFloat = false).as("v"))
    blockedPairs(v, "id", "v", idBlock)
      .withColumn("cos", graft.functions.VectorFunctions.dotD(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Embedding-cosine near-dup pairs via multi-band sign-LSH bucketing —
    * the content-addressed, sub-quadratic scale path. Each of `bands`
    * independent hyperplane families ([[Ann.hyperplaneBucket]] with a
    * disjoint plane offset) buckets every vector; candidates are pairs
    * sharing a bucket in ANY band (multi-band OR). The band shuffle
    * carries only (id, band, bucket) scalar rows; vectors are re-joined
    * for the bucket-bounded candidate set only, exactly like
    * [[minhashLshPairs]]'s payload discipline.
    *
    * Recall is probabilistic — a qualifying pair whose vectors disagree
    * on ≥1 sign in every band is missed; P(found) =
    * 1 - (1 - (1 - θ/π)^nPlanes)^bands for angle θ. Raise `bands` (more
    * passes) or lower `nPlanes` (hotter buckets) for recall. The
    * sin-family hyperplanes are deterministic pure math, so the whole
    * pipeline is engine-reproducible. */
  def embeddingNearDupsLsh(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, nPlanes: Int = 8, bands: Int = 2): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      graft.functions.VectorNormalize.normalize(col(vecCol), outputFloat = false).as("v"))
    val banded = v.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        Ann.hyperplaneBucket(col("v"), dim, nPlanes, planeOffset = b * nPlanes)): _*))
        .as(Seq("band", "bucket")))
    val cand = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(v.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(v.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cos", graft.functions.VectorFunctions.dotD(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Within-cluster embedding near-dup pairs — the candidate generator
    * of [[semanticDedup]]. One equi self-join on the cluster id: pair
    * volume is Σ|cluster|² / 2, so the coarse quantizer's list sizing is
    * the scale knob (nLists ∝ corpus keeps E[cluster] constant;
    * [[Ann.ivfRebalance]] splits skewed lists, which bounds the worst
    * cluster too). The join carries (cluster, id, normalized vector)
    * only; cosine == dot on the pre-normalized vectors, one dot per
    * candidate pair.
    *
    * Skew guard (`maxBlock` > 0): a single hot cluster re-quadratizes
    * the self-join no matter how the quantizer was sized — one
    * degenerate list of h rows costs h²/2 pairs, which at corpus scale
    * is the whole job. Clusters larger than `maxBlock` are therefore
    * hash-split into ceil(size/maxBlock) sub-blocks and the self-join
    * runs per (cluster, sub-block), bounding expected pair volume at
    * Σ size·maxBlock instead of Σ size². The sub-block key is a hash of
    * the NORMALIZED VECTOR itself, so bit-identical vectors (exact
    * duplicates — the rows SemDeDup must always group) land in the same
    * sub-block by construction; what the cap sacrifices is near-dup
    * pairs straddling sub-blocks of an oversized cluster — the same
    * approximation SemDeDup already makes for pairs straddling
    * clusters, extended to clusters the quantizer failed to keep small.
    * Cluster sizes are one small agg (|clusters| rows) broadcast to the
    * probe side — no extra shuffle of the data path. */
  def semanticPairs(assigned: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, tau: Double, maxBlock: Int = 0): DataFrame = {
    val v0 = assigned.select(col(clusterCol).as("__c__"), col(idCol).as("id"),
      graft.functions.VectorNormalize.normalize(col(vecCol), outputFloat = false).as("v"))
    val v =
      if (maxBlock <= 0) v0.withColumn("__sub__", lit(0L))
      else {
        val nsub = v0.groupBy(col("__c__"))
          .agg(ceil(count(lit(1)).cast(DoubleType) / maxBlock).cast(LongType).as("__nsub__"))
        v0.join(broadcast(nsub), Seq("__c__"))
          .withColumn("__sub__", pmod(xxhash64(col("v")), greatest(col("__nsub__"), lit(1L))))
          .drop("__nsub__")
      }
    v.select(col("__c__"), col("__sub__"), col("id").as("id_a"), col("v").as("v_a"))
      .join(v.select(col("__c__"), col("__sub__"), col("id").as("id_b"), col("v").as("v_b")),
        Seq("__c__", "__sub__"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", graft.functions.VectorFunctions.dotD(col("v_a"), col("v_b")))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Deterministic text embedding for corpora without a vector column:
    * a random-signs (JL-style) projection of the char-bigram count
    * vector. Each bigram is hashed ONCE (xxhash64); dimension j takes
    * the bigram's count with the sign of hash bit j, so
    * `emb[j] = Σ_g c_g · (±1)_gj` — the SimHash accumulator kept as a
    * vector instead of collapsed to signs. Cosine on these vectors
    * approximates cosine on the bigram counts. Everything is per-row
    * expression work (no shuffle, no UDF); the inner fold is cheap
    * integer arithmetic — the hash is hoisted out of the per-dimension
    * loop, so cost is |bigrams| digests + |bigrams|·dim adds per row.
    * dim ≤ 63 (one 64-bit hash supplies the sign bits). */
  def textEmbedding(text: Column, dim: Int): Column = {
    require(dim >= 1 && dim <= 63, s"dim must be in [1, 63], got $dim")
    val hashed = transform(
      map_entries(graft.functions.PortableHashes.charBigramCounts(text)),
      e => struct(xxhash64(e.getField("key")).as("h"),
        e.getField("value").cast(DoubleType).as("c")))
    val zeros = array((0 until dim).map(_ => lit(0.0)): _*)
    aggregate(hashed, zeros, (acc, e) =>
      zip_with(acc,
        array((0 until dim).map(j => e.getField("c") *
          (shiftright(e.getField("h"), j).bitwiseAND(lit(1L)).cast(DoubleType) * 2.0
            - 1.0)): _*),
        (a, s) => a + s))
  }

  /** [[semanticDedup]] for TEXT corpora: derive [[textEmbedding]]
    * vectors, cluster them ([[Ann.ivfBuild]] — the same coarse
    * quantizer the ANN side uses), and dedup within clusters.
    * Exact-duplicate texts produce identical embeddings (cos = 1), so
    * they always group; near-dup texts group when their bigram
    * distributions agree past tau. Complements the lexical families:
    * MinHash sees shared shingles, SimHash shared tokens — this sees
    * character-distribution similarity, robust to token reordering. */
  def semanticDedupText(df: DataFrame, idCol: String, textCol: String,
      tau: Double, dim: Int = 16, nLists: Int = 16): DataFrame = {
    val emb = df.select(col(idCol), textEmbedding(col(textCol), dim).as("__emb__"))
    val idx = Ann.ivfBuild(emb, idCol, "__emb__", nLists)
    semanticDedup(idx.assigned, "id", "v", "cluster", tau)
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): cluster-blocked cosine near-dup with component
    * survivors. Candidates come from [[semanticPairs]] (pairs in
    * DIFFERENT coarse clusters are never compared — the paper's
    * approximation, which is what makes the op sub-quadratic), duplicate
    * groups are the connected components of the threshold graph
    * ([[connectedComponents]] — min-id label), and the deterministic
    * survivor of each group is its smallest id (the paper keeps an
    * arbitrary representative; min-id makes the choice
    * engine-reproducible). Returns every input row as
    * (id, group_id, keep): singletons keep trivially with
    * group_id = id. */
  def semanticDedup(assigned: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, tau: Double, maxBlock: Int = 65536): DataFrame =
    semanticDedupFromPairs(assigned, idCol,
      semanticPairs(assigned, idCol, vecCol, clusterCol, tau, maxBlock))

  /** [[semanticDedup]] over an ALREADY-COMPUTED candidate pair set —
    * the seam a caller that also consumes the pairs (audits, group
    * diagnostics) uses to pay the blocked cosine join ONCE instead of
    * once per consumer. `pairs` must carry (id_a, id_b); identical
    * output to [[semanticDedup]] when fed [[semanticPairs]] of the same
    * arguments. */
  def semanticDedupFromPairs(assigned: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs.select(col("id_a"), col("id_b")))
    assigned.select(col(idCol).as("id"))
      .join(comps, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("component"), col("id")).as("group_id"),
        (coalesce(col("component"), col("id")) === col("id")).as("keep"))
  }
}
