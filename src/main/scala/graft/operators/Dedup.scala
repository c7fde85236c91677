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
    df.groupBy(md5(concat_ws("", contentCols.map(col): _*)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

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
    * whole text so they can still hash-match exactly. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
        .otherwise(array(text)))
  }

  /** Jaccard similarity of two array columns (set semantics). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  // ----------------------------------------------------------- minhash
  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min xxhash64 over the shingle set. One pass over the shingles. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(shingles, t => xxhash64(t, s))))

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
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val withSig = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("shingles", wordShingles(col("text"), shingleN))
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))
    val banded = withSig.select(
      col("id"), col("shingles"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(array_join(
          transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast(StringType)), ",")))).as(Seq("band", "band_hash")))
    val l = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("shingles").as("sh_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("shingles").as("sh_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sig_a"), col("sig_b"))).cast(DoubleType) / numHashes)
          .as("est_jaccard"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .distinct()
  }

  // ----------------------------------------------------------- simhash
  /** SimHash as a 64-slot bit-score array in one pass over the tokens
    * (sign of each slot = fingerprint bit). Kept as ARRAY<BIGINT> of
    * {-t..t} so hamming distance stays a cheap zip_with. */
  def simhashBitScores(toks: Column): Column =
    aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          b => when(call_function("getbit", xxhash64(t), b) === 1, lit(1L)).otherwise(lit(-1L))),
        (x, y) => x + y))

  /** Hamming distance between two simhash bit-score arrays (bits differ
    * when the score signs differ; zero score counts as bit 0). */
  def simhashHamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => when((x > 0) =!= (y > 0), 1).otherwise(0)),
      lit(0), (acc, x) => acc + x)

  /** SimHash near-dup pairs within id-distance blocks (blocked candidate
    * generation; at scale, swap the block for a band join on fingerprint
    * chunks). */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8, idBlock: Long = 50): DataFrame = {
    val withFp = df.select(col(idCol).as("id"), simhashBitScores(tokens(col(textCol))).as("fp"))
    val l = withFp.select(col("id").as("id_a"), col("fp").as("fp_a"))
    val r = withFp.select(col("id").as("id_b"), col("fp").as("fp_b"))
    l.join(r, col("id_b") > col("id_a") && col("id_b") <= col("id_a") + idBlock)
      .withColumn("hamming", simhashHamming(col("fp_a"), col("fp_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // ------------------------------------------- embedding near-duplicates
  /** Embedding-cosine near-dup pairs within id-distance blocks. The
    * blocked join bounds candidates to N*blockSize; the LSH variant in
    * [[Ann.hyperplaneBuckets]] is the sub-quadratic scale path. */
  def embeddingNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, idBlock: Long = 50): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val l = v.select(col("id").as("id_a"), col("v").as("v_a"))
    val r = v.select(col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, col("id_b") > col("id_a") && col("id_b") <= col("id_a") + idBlock)
      .withColumn("cos", cosineD(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
