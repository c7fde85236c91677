package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, append-only dedup ingestion index — the on-disk artifact
  * the incremental dedup operators ([[Dedup.dropExactDupsAgainst]],
  * [[Dedup.minhashLshPairsAgainst]]) describe: instead of re-deriving
  * the base corpus's hashes and MinHash projection on every incoming
  * batch, the corpus maintains
  *
  *   - `hashes/`  — distinct 128-bit md5 content hashes (exact-dup
  *                  probe; hash equality stands in for content
  *                  equality, so 64 bits would not do),
  *   - `bands/`   — the (id, band, band_hash) LSH projection
  *                  (near-dup candidate probe),
  *   - `sigs/`    — the (id, sig) MinHash signatures (signature-level
  *                  Jaccard estimate without touching base text),
  *   - `simchunks/` — the (id, fp, ci, cv) SimHash fingerprint-chunk
  *                  projection ([[Dedup.simhashPairsAgainst]]'s base
  *                  side, pigeonhole-complete for hamming <=
  *                  simMaxHamming; fp rides along so the Hamming
  *                  verify also never touches base text),
  *
  * each as plain parquet, plus a JSON sidecar pinning the parameters
  * (shingleN/numHashes/bands/portableHash/simMaxHamming) so a probe
  * with mismatched parameters fails loudly instead of silently finding
  * nothing.
  *
  * Lifecycle: [[DedupIndex.create]] over the initial corpus, then per
  * accepted batch [[DedupIndex.append]] — both are APPEND-shaped writes
  * proportional to the batch; nothing is ever rebuilt. At 100 TB the
  * index is the only thing an ingest touches: the corpus text stays
  * cold. Exact-jaccard verification of candidates (which needs text)
  * stays in [[Dedup.minhashLshPairsAgainst]] — by design the index
  * stores no text.
  */
object DedupIndex {

  final case class Params(
      shingleN: Int, numHashes: Int, bands: Int, portableHash: Boolean,
      simMaxHamming: Int = 3)

  private def sidecar(path: String) = s"$path/_dedup_index.json"

  private def writeParams(spark: SparkSession, path: String, p: Params): Unit =
    VectorStore.writeSidecar(spark, sidecar(path),
      s"""{"shingle_n": ${p.shingleN}, "num_hashes": ${p.numHashes}, """ +
        s""""bands": ${p.bands}, "portable_hash": ${p.portableHash}, """ +
        s""""sim_max_hamming": ${p.simMaxHamming}, """ +
        s""""content_hash": "md5", "hashes_keyed": true}""")

  def readParams(spark: SparkSession, path: String): Params = {
    val pth = new org.apache.hadoop.fs.Path(sidecar(path))
    val fs = pth.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(pth)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
    // a probe against an index whose content-hash family differs would
    // silently match nothing — fail loudly instead (missing field =
    // pre-md5 index: rebuild with create())
    val algo = Option(node.get("content_hash")).map(_.asText()).getOrElse("xxhash64")
    require(algo == "md5",
      s"index at $path uses content_hash=$algo; this build probes md5 — rebuild the index")
    require(node.has("sim_max_hamming"),
      s"index at $path predates the simhash projection — rebuild with create()")
    require(Option(node.get("hashes_keyed")).exists(_.asBoolean()),
      s"index at $path stores unkeyed content hashes (no per-doc rows) — " +
        "delete() cannot know which hash rows belong to a document; rebuild with create()")
    Params(node.get("shingle_n").asInt(), node.get("num_hashes").asInt(),
      node.get("bands").asInt(), node.get("portable_hash").asBoolean(),
      node.get("sim_max_hamming").asInt())
  }

  /** The four projections of one corpus slice, under the index params. */
  private def project(df: DataFrame, idCol: String, textCol: String, p: Params)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))
    // 128-bit md5, not a 64-bit hash: filterExact treats hash equality
    // as content equality with no text verification, so the projection
    // must make collisions negligible at billions of documents (see
    // Dedup.dropExactDupsAgainst)
    val hashes = base.select(col("id"), md5(col("text")).as("content_hash"))
    val sigs = base.select(col("id"), {
      val sh = Dedup.wordShingles(col("text"), p.shingleN)
      (if (p.portableHash) Dedup.minhashSignaturePortable(sh, p.numHashes)
      else Dedup.minhashSignature(sh, p.numHashes)).as("sig")
    })
    val bands = Dedup.bandedOfSignatures(sigs, p.numHashes, p.bands)
    (hashes, bands, sigs, simChunksOf(base, "text", p))
  }

  /** (id, fp, ci, cv) SimHash chunk projection of (id, text) rows —
    * the shared banding of the stored base side and the probe's batch
    * side, so the equi join is pigeonhole-complete by construction. */
  private def simChunksOf(rows: DataFrame, textCol: String, p: Params): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    val fp = if (p.portableHash) Dedup.simhash48Portable(toks) else Dedup.simhash64(toks)
    val fpBits = if (p.portableHash) 48 else 64
    rows.select(col("id"), fp.as("fp"))
      .select(col("id"), col("fp"),
        explode(Dedup.fpChunks(col("fp"), fpBits, p.simMaxHamming + 1)).as("c"))
      .select(col("id"), col("fp"), col("c.ci").as("ci"), col("c.cv").as("cv"))
  }

  /** The four projection subdirectories every index carries — the
    * snapshot set for file-level replay idempotence
    * ([[graft.streaming.StreamingOps.dedupIngestStream]]'s ledger):
    * flat roots whose file counts the compaction cadence bounds. */
  private[graft] val projectionRoots: Seq[String] =
    Seq("hashes", "bands", "sigs", "simchunks")

  /** Build the index over the initial corpus. */
  def create(df: DataFrame, idCol: String, textCol: String, path: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      portableHash: Boolean = false, simMaxHamming: Int = 3): Unit = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val p = Params(shingleN, numHashes, bands, portableHash, simMaxHamming)
    val (hashes, banded, sigs, simchunks) = project(df, idCol, textCol, p)
    hashes.write.mode("overwrite").parquet(s"$path/hashes")
    banded.write.mode("overwrite").parquet(s"$path/bands")
    sigs.write.mode("overwrite").parquet(s"$path/sigs")
    simchunks.write.mode("overwrite").parquet(s"$path/simchunks")
    writeParams(df.sparkSession, path, p)
  }

  /** Append an ACCEPTED batch's projections — cost ∝ batch, no rewrite.
    * (Dedup the batch first; the index trusts its inputs.) */
  def append(df: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    val p = readParams(df.sparkSession, path)
    val (hashes, banded, sigs, simchunks) = project(df, idCol, textCol, p)
    hashes.write.mode("append").parquet(s"$path/hashes")
    banded.write.mode("append").parquet(s"$path/bands")
    sigs.write.mode("append").parquet(s"$path/sigs")
    simchunks.write.mode("append").parquet(s"$path/simchunks")
  }

  /** Exact-dup filter against the index: batch rows whose content hash
    * is already present are dropped (anti join on the stored hashes —
    * base text is never read). */
  def filterExact(spark: SparkSession, path: String, batch: DataFrame,
      contentCol: String): DataFrame = {
    readParams(spark, path) // loud param check (incl. content-hash algo)
    val idx = spark.read.parquet(s"$path/hashes")
      .select(col("content_hash").as("__h__")).distinct()
    batch.join(idx, md5(col(contentCol)) === col("__h__"), "left_anti")
  }

  /** SimHash near-dup pairs against the index: (id_base, id_batch,
    * hamming) — [[Dedup.simhashPairsAgainst]] with the base side read
    * straight from the stored `simchunks/` projection, so neither base
    * text nor base fingerprints are re-derived on a probe; only the
    * BATCH is fingerprinted (cost ∝ batch). Pigeonhole-complete for
    * hamming <= the index's simMaxHamming, and exact (the stored fp
    * verifies the Hamming distance — no estimate column needed). */
  def simhashCandidates(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val p = readParams(spark, path)
    val batchChunks = simChunksOf(
      batch.select(col(idCol).as("id"), col(textCol).as("text")), "text", p)
    spark.read.parquet(s"$path/simchunks")
      .select(col("ci"), col("cv"), col("id").as("id_base"), col("fp").as("fp_base"))
      .join(batchChunks
          .select(col("ci"), col("cv"), col("id").as("id_batch"), col("fp").as("fp_batch")),
        Seq("ci", "cv"))
      .select(col("id_base"), col("id_batch"),
        Dedup.simhashHamming(col("fp_base"), col("fp_batch")).cast("int").as("hamming"))
      .filter(col("hamming") <= p.simMaxHamming)
      .distinct()
  }

  /** Near-dup candidates against the index: (id_base, id_batch,
    * est_jaccard) from the stored bands and signatures — one equi band
    * join plus a signature re-join for candidates only; the base corpus
    * TEXT is never touched. Pass the candidate pairs to
    * [[Dedup.minhashLshPairsAgainst]]-style exact verification only if
    * the estimate is not enough. */
  def candidates(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val p = readParams(spark, path)
    val batchN = batch.select(col(idCol).as("id"), col(textCol).as("text"))
    val batchSigs = batchN.select(col("id"), {
      val sh = Dedup.wordShingles(col("text"), p.shingleN)
      (if (p.portableHash) Dedup.minhashSignaturePortable(sh, p.numHashes)
      else Dedup.minhashSignature(sh, p.numHashes)).as("sig")
    })
    val cand = spark.read.parquet(s"$path/bands")
      .select(col("band"), col("band_hash"), col("id").as("id_base"))
      .join(Dedup.bandedOfSignatures(batchSigs, p.numHashes, p.bands)
          .select(col("band"), col("band_hash"), col("id").as("id_batch")),
        Seq("band", "band_hash"))
      .select(col("id_base"), col("id_batch"))
      .distinct()
    cand
      .join(spark.read.parquet(s"$path/sigs")
        .select(col("id").as("id_base"), col("sig").as("sig_base")), Seq("id_base"))
      .join(batchSigs.select(col("id").as("id_batch"), col("sig").as("sig_batch")),
        Seq("id_batch"))
      .select(col("id_base"), col("id_batch"),
        (size(array_intersect(col("sig_base"), col("sig_batch")))
          .cast("double") / p.numHashes).as("est_jaccard"))
  }

  /** Forget documents: remove every projection row the given ids
    * contributed — hash, bands, signature, fingerprint chunks. Because
    * the hash projection is keyed per document (a probe distincts it,
    * [[filterExact]]), a deleted document's content becomes ingestable
    * again UNLESS another surviving document still carries the same
    * hash — exactly the semantics "forget this document" needs. Each
    * projection rewrites through a dot-prefixed tmp + atomic rename
    * (survivors materialized first); this is the one index operation
    * whose cost is ∝ index size, not batch — a forget pass over
    * projections that hold a few dozen bytes per document, with the
    * corpus text never read. Deleting every document this way is out of
    * scope: drop the index directory and [[create]] afresh instead. */
  def delete(spark: SparkSession, path: String, ids: Seq[String]): Unit = {
    require(ids.nonEmpty, "delete needs at least one id")
    import spark.implicits._
    delete(spark, path, ids.toDF("id"))
  }

  /** [[delete]] with the ids as a DataFrame — the streaming / bulk
    * form: each projection rewrite anti-joins the size-gated broadcast
    * id set ([[Ann.maybeBroadcastIds]]) instead of building an `isin`
    * literal, so a six-figure tombstone batch neither blows up the plan
    * nor funnels through the driver. An empty frame is a no-op (the
    * Seq overload keeps its loud nonEmpty contract). */
  def delete(spark: SparkSession, path: String, ids: DataFrame): Unit = {
    readParams(spark, path) // loud layout check (incl. keyed hashes)
    val (idDf, n) = Ann.stageIdFrame(ids)
    if (n == 0L) return
    val hinted = Ann.maybeBroadcastIds(spark, idDf, n)
    Seq("hashes", "bands", "sigs", "simchunks").foreach { proj =>
      rewriteProjection(spark, path, proj)(df =>
        df.join(hinted,
          df("id").cast(org.apache.spark.sql.types.StringType) === hinted("id"),
          "left_anti"))
    }
  }

  /** Probe key of each projection — the column(s) a probe's equi join
    * or anti join lands on. Compaction range-partitions and sorts by
    * these so parquet row-group min/max stats cover tight key ranges. */
  private val probeKeys: Seq[(String, Seq[String])] = Seq(
    "hashes" -> Seq("content_hash"),
    "bands" -> Seq("band", "band_hash"),
    "sigs" -> Seq("id"),
    "simchunks" -> Seq("ci", "cv"))

  /** Compact the index layout. [[append]] (and its streaming twin) adds
    * a fresh set of part-files per batch — correct, append-shaped, but
    * after thousands of microbatches each probe opens thousands of tiny
    * files and every row group spans the full key range. Compaction
    * rewrites each projection into at most `filesPerProjection` files,
    * RANGE-partitioned and sorted by that projection's probe key
    * ([[probeKeys]]), so post-compact probes open a bounded file count
    * and row-group stats become selective. Logically a no-op: probe
    * results are identical before and after (spec-asserted; the
    * `dedup_idx_compact` oracle recomputes the probe from raw text).
    * Same staging discipline as [[delete]]: survivors materialize
    * first, then a tmp + atomic-rename swap per projection — a reader
    * never sees a half-written projection. Cost ∝ index size (a few
    * dozen bytes per document, text never read); run it on the
    * maintenance cadence, e.g. whenever a projection's file count
    * exceeds a few × `filesPerProjection`. */
  def compact(spark: SparkSession, path: String,
      filesPerProjection: Int = 8): Unit = {
    require(filesPerProjection > 0, "filesPerProjection must be positive")
    readParams(spark, path) // loud layout check
    probeKeys.foreach { case (proj, key) =>
      rewriteProjection(spark, path, proj) { df =>
        df.repartitionByRange(filesPerProjection, key.map(col): _*)
          .sortWithinPartitions(key.map(col): _*)
      }
    }
  }

  /** Rewrite one projection through dot-prefixed staging + atomic
    * rename (shared by [[delete]] and [[compact]]). The transformed
    * rows are materialized (localCheckpoint) BEFORE the swap so the
    * rewrite never reads a directory it is replacing. */
  private def rewriteProjection(spark: SparkSession, path: String,
      proj: String)(f: DataFrame => DataFrame): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$path/$proj")
    val tmp = new org.apache.hadoop.fs.Path(s"$path/.$proj.rewrite.tmp")
    val kept = f(spark.read.parquet(dir.toString)).localCheckpoint(true)
    kept.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dir, true)
    require(fs.rename(tmp, dir), s"rename of rewritten $proj failed under $path")
  }
}
