package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational helpers with explicit 100-TB posture. */
object Relational {

  /** Deterministic, engine-portable hash sampling predicate: keep a row
    * iff the first 48 bits of md5(key) mod 1000 fall under
    * `ratePermille`. Unlike `df.sample` (seeded per-partition RNG, so
    * the kept set changes with partitioning), the decision is a pure
    * function of the KEY — reproducible across runs, engines, and
    * cluster layouts, and consistent across tables sharing the key
    * (sample a corpus once, every derived table samples identically).
    * The md5-prefix value is uniform, so the kept fraction concentrates
    * tightly around ratePermille/1000. */
  def hashSampleKeep(key: org.apache.spark.sql.Column, ratePermille: Int): org.apache.spark.sql.Column = {
    require(ratePermille >= 0 && ratePermille <= 1000,
      s"ratePermille must be in [0, 1000], got $ratePermille")
    import org.apache.spark.sql.functions._
    (conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("long") % 1000L) <
      ratePermille.toLong
  }

  /** Per-source mixture sampling: keep a row iff the [[hashSampleKeep]]
    * hash of its key falls under ITS SOURCE's target rate — the "data
    * mixing" step of a training pipeline (upsample curated sources,
    * downsample crawl), as one deterministic predicate instead of one
    * sampled scan per source. The rate table is a tiny when-chain
    * (sources are few); the decision stays a pure function of
    * (key, source), so the same mixture reproduces on any engine,
    * partitioning, or rerun — and a re-run with a changed rate for one
    * source leaves every other source's kept set untouched.
    */
  def mixtureSampleKeep(key: Column, source: Column,
      ratesPermille: Seq[(String, Int)], defaultPermille: Int): Column = {
    (ratesPermille.map(_._2) :+ defaultPermille).foreach(r =>
      require(r >= 0 && r <= 1000, s"rate must be in [0, 1000], got $r"))
    val hash1000 =
      conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("long") % 1000L
    val rate = ratesPermille.foldLeft(Option.empty[Column]) { case (acc, (s, r)) =>
      Some(acc match {
        case None => when(source === s, lit(r.toLong))
        case Some(c) => c.when(source === s, lit(r.toLong))
      })
    }.map(_.otherwise(lit(defaultPermille.toLong)))
      .getOrElse(lit(defaultPermille.toLong))
    hash1000 < rate
  }

  /** Deterministic shard assignment for training-data output: shard =
    * first-48-md5-bits(key) mod nShards — a pure function of the key,
    * in the same portable-hash family as [[hashSampleKeep]] (the
    * md5-prefix value is uniform, so shards are balanced in
    * expectation; any engine can recompute the assignment). */
  def shardOf(key: Column, nShards: Int): Column = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    (conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("long")
      % nShards.toLong).cast(IntegerType)
  }

  /** Write a deterministically sharded-and-shuffled training dataset.
    *
    * The final step of a data pipeline before a training run wants a
    * GLOBAL shuffle (no source/time locality within a shard) that is
    * nevertheless REPRODUCIBLE. Both come from pure key functions:
    * rows land in `shard=<k>/` by [[shardOf]] the id, and are ordered
    * within the shard by an independent salted md5 of the id — so the
    * (shard, position) of every row is a function of its id alone,
    * independent of input partitioning, task scheduling, or engine.
    * Two runs over the same rows produce row-identical shard files
    * (spec-pinned), which makes training jobs resumable and data
    * ablations diffable.
    *
    * One shuffle total: repartition on the shard column routes each
    * shard's rows to one task (nShards output files — size shards to
    * your training loader, e.g. 256 MB-1 GB each at 100 TB), and the
    * within-partition sort is shuffle-free. A `_manifest.json` sidecar
    * records per-shard row counts so loaders can size epochs without
    * listing data files; the count pass aggregates to nShards rows
    * before the driver sees it. */
  def writeShards(df: DataFrame, idCol: String, path: String, nShards: Int): Unit = {
    val spark = df.sparkSession
    val withShard = df
      .withColumn("shard", shardOf(col(idCol), nShards))
      .withColumn("__ord__", md5(concat(lit("ord|"), col(idCol).cast("string"))))
    withShard
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__ord__"), col(idCol))
      .drop("__ord__")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    // per-shard integrity checksum: order-insensitive sum of a 31-bit
    // md5-prefix per id (31 bits so a 4-billion-row shard still fits the
    // BIGINT sum) — any engine can recompute it from ids alone, so a
    // loader can verify a shard without trusting the writer
    val idChk = (conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("long") % 2147483648L)
    val counts = withShard.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"), sum(idChk).as("chk")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val shardsJson = counts
      .map { case (s, n, c) => s"""{"shard": $s, "rows": $n, "ids_chk": $c}""" }
      .mkString(", ")
    VectorStore.writeSidecar(spark, s"$path/_manifest.json",
      s"""{"n_shards": $nShards, "total": ${counts.map(_._2).sum}, """ +
        s""""order": "md5(ord|id)", "shards": [$shardsJson]}""")
  }

  /** Number of shards for a total and a per-shard target: ceiling
    * division in pure integers (`(total + target - 1) / target`, never
    * FP — at 100 TB totals a double CEIL can round across the shard
    * boundary), floored at one shard. Exposed so loaders and oracles can
    * recompute the choice from the same two numbers. */
  def shardCountFor(total: Long, targetPerShard: Long): Int = {
    require(targetPerShard > 0, s"target per shard must be positive, got $targetPerShard")
    math.max(1L, (total + targetPerShard - 1) / targetPerShard).toInt
  }

  /** [[writeShards]] with nShards chosen from a target ROW count per
    * shard: one count pass, then the stock deterministic layout. Returns
    * the chosen shard count (also recorded in the manifest). */
  def writeShardsSized(df: DataFrame, idCol: String, path: String,
      targetRowsPerShard: Long): Int = {
    val k = shardCountFor(df.count(), targetRowsPerShard)
    writeShards(df, idCol, path, k)
    k
  }

  /** [[writeShards]] with nShards chosen from a target PAYLOAD size per
    * shard — the knob training loaders actually hold ("256 MB-1 GB
    * files"): one aggregate pass sums `octet_length(payloadCol)`, then
    * ceiling-divides by the target. The payload column is a sizing
    * proxy (parquet encoding and the other columns shift the real file
    * size); the choice only needs to be deterministic and
    * recomputable, not byte-exact. */
  def writeShardsSizedBytes(df: DataFrame, idCol: String, payloadCol: String,
      path: String, targetBytesPerShard: Long): Int = {
    val total = df
      .agg(coalesce(sum(octet_length(col(payloadCol).cast(BinaryType)).cast(LongType)), lit(0L)))
      .head().getLong(0)
    val k = shardCountFor(total, targetBytesPerShard)
    writeShards(df, idCol, path, k)
    k
  }

  /** Two-phase salted sum for skewed grouping keys.
    *
    * Phase 1 aggregates on (keys, salt) so a hot key fans out over
    * `salts` reducers; phase 2 re-aggregates on the keys alone. Sums ride
    * as exact integer cents, so the result is bit-identical to the plain
    * single-shuffle groupBy regardless of salt assignment — which is what
    * makes the rewrite safe to apply mechanically under skew (AQE's
    * skew-join handles joins; this is the aggregation-side equivalent).
    */
  def saltedCentsSum(
      df: DataFrame, keys: Seq[String], valueCol: String,
      outCol: String, salts: Int = 16): DataFrame = {
    // Salt must vary per ROW, not per value: a hot key with a constant
    // value would otherwise land on one reducer anyway. The physical row
    // id is fine — any assignment yields the identical exact sum.
    val salted = df.withColumn("__salt__",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    salted
      .groupBy((keys.map(col) :+ col("__salt__")): _*)
      .agg(sum(round(col(valueCol) * 100).cast(LongType)).as("__partial__"))
      .groupBy(keys.map(col): _*)
      .agg((sum(col("__partial__")).cast(DoubleType) / 100.0).as(outCol))
  }
}
