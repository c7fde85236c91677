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

  /** Deterministic per-stratum quota sampling: the first `quota` rows of
    * every stratum in portable-md5-of-id order — the "N documents per
    * language/domain" step of a corpus mix, as a pure function of
    * (strata, id). Unlike a rate, a QUOTA yields exact per-stratum
    * counts (min(quota, stratum size)), which is what a curated
    * evaluation slice or a balanced fine-tuning mix specifies; the
    * md5 order makes the picked set stable across runs, engines, and
    * partitionings, and monotone in `quota` (raising the quota only
    * ADDS rows — a grown slice supersets the old one).
    *
    * Scale: one hash partition per strata combination; the
    * `row_number <= quota` filter lowers to WindowGroupLimit in Spark 4
    * (rank-limit pushdown), so each map task keeps at most `quota` rows
    * per stratum BEFORE the shuffle — the shuffle carries
    * O(partitions × strata × quota), not the corpus. */
  def stratifiedQuota(df: DataFrame, idCol: String, strataCols: Seq[String],
      quota: Int): DataFrame = {
    require(quota > 0, s"quota must be positive, got $quota")
    require(strataCols.nonEmpty, "need at least one stratum column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= quota)
      .drop("__rn__")
  }

  /** Temperature-rebalanced mixture rates: per-group sampling rates that
    * move the mix from the natural distribution (alpha = 1) toward
    * uniform (alpha = 0) — the standard multilingual/multi-domain
    * rebalancing step (share ∝ count^alpha). Fixed to alpha = 0.5
    * (`sqrt`) so the whole pipeline is bit-reproducible across engines:
    * sqrt is IEEE-exact where a general `pow` may differ in the last
    * ulp between libm builds. Returns one row per group:
    * (group, n, share, rate) with rate = min(1, targetRows·share/n) —
    * feed the rates to [[temperatureSampleKeep]] or read them off for
    * an external sampler. Cost: one groupBy over the corpus (map-side
    * combine), then arithmetic on a groups-sized frame. */
  def temperatureMixRates(df: DataFrame, groupCol: String,
      targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    // the denominator is ONE scalar (Σ√n over the groups-sized counts
    // frame) — a broadcast cross join, not an unpartitioned window:
    // Window.partitionBy() funnels every row through one task and
    // WARNs on every run, noise that would mask a real missing
    // partitionBy elsewhere
    counts
      .withColumn("__sq__", sqrt(col("n").cast(DoubleType)))
      .crossJoin(broadcast(
        counts.agg(sum(sqrt(col("n").cast(DoubleType))).as("__den__"))))
      .withColumn("share", col("__sq__") / col("__den__"))
      .withColumn("rate",
        least(lit(1.0), lit(targetRows.toDouble) * col("share") / col("n").cast(DoubleType)))
      .drop("__sq__", "__den__")
  }

  /** Apply [[temperatureMixRates]] as a deterministic filter: keep a row
    * iff its portable 48-bit md5-of-id unit-interval hash falls under
    * its group's rate. The rates frame is groups-sized, so the join
    * broadcasts; the keep decision is a pure function of (id, group,
    * targetRows) — same reproducibility contract as
    * [[hashSampleKeep]], with the rate derived from data instead of
    * hand-set. The expected kept count is ~targetRows (exact per-group
    * expectation n·rate; a group already below its target keeps
    * everything, so small groups are never subsampled past parity). */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
      targetRows: Long): DataFrame = {
    val rates = temperatureMixRates(df, groupCol, targetRows)
      .select(col(groupCol), col("rate"))
    val unit = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast(LongType).cast(DoubleType) / lit(281474976710656.0) // 2^48
    df.join(broadcast(rates), Seq(groupCol))
      .filter(unit < col("rate"))
      .drop("rate")
  }

  /** [[temperatureMixRates]] WITHOUT the min(1) cap: per-group target
    * WEIGHTS w = targetRows · share / n, where share ∝ sqrt(n). A
    * group under its temperature-fair size gets w > 1 — an UPSAMPLE
    * factor — instead of silently stopping at parity, so feeding these
    * weights to [[upsampleRepeatByRates]] hits the target mix exactly
    * in expectation from BOTH directions (head languages thin, tail
    * languages repeat). Returns (group, n, share, weight). */
  def temperatureMixWeights(df: DataFrame, groupCol: String,
      targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    // scalar denominator via broadcast cross join — same reasoning as
    // temperatureMixRates
    counts
      .withColumn("__sq__", sqrt(col("n").cast(DoubleType)))
      .crossJoin(broadcast(
        counts.agg(sum(sqrt(col("n").cast(DoubleType))).as("__den__"))))
      .withColumn("share", col("__sq__") / col("__den__"))
      .withColumn("weight",
        lit(targetRows.toDouble) * col("share") / col("n").cast(DoubleType))
      .drop("__sq__", "__den__")
  }

  /** [[upsampleRepeat]] with weights from a DATAFRAME instead of a
    * literal map — the form that scales past a handful of groups (the
    * weights frame broadcasts; the decision stays the same pure
    * function of (id, group, weight)). `rates` must carry `groupCol`
    * and a `weight` column; groups absent from it are DROPPED (inner
    * join — supply an explicit default row if pass-through is wanted).
    * Compose with [[temperatureMixWeights]] for data-derived
    * two-directional temperature mixing. */
  def upsampleRepeatByRates(df: DataFrame, idCol: String, groupCol: String,
      rates: DataFrame): DataFrame = {
    // runtime twin of upsampleRepeat's driver-side require: a negative
    // or NaN weight would otherwise silently emit wrong rows (sequence
    // to a negative floor yields descending copy indices) — fail fast
    // inside the plan instead, since the weights live in a frame
    val guarded = when(
      col("__w__") >= 0.0 && col("__w__") <= Double.MaxValue, // NaN/±Inf fail
      col("__w__"))
      .otherwise(raise_error(concat(
        lit("upsampleRepeatByRates: weights must be finite and >= 0, got "),
        col("__w__").cast(StringType))))
    val r = broadcast(rates.select(col(groupCol),
      col("weight").cast(DoubleType).as("__w__"))
      .withColumn("__w__", guarded))
    val whole = floor(col("__w__")).cast(LongType)
    val unit = conv(substring(md5(concat(col(idCol).cast("string"), lit("|"),
        col("copy").cast("string"))), 1, 12), 16, 10)
      .cast(LongType).cast(DoubleType) / lit(281474976710656.0) // 2^48
    df.join(r, Seq(groupCol))
      .withColumn("copy", explode(sequence(lit(0L), floor(col("__w__")).cast(LongType))))
      .filter(col("copy") < whole || unit < (col("__w__") - floor(col("__w__"))))
      .drop("__w__")
  }

  /** Deterministic fractional REPEAT sampling — the UPSAMPLE half of
    * the mixing story. [[temperatureSample]] / [[mixtureSampleKeep]]
    * can only thin a source; production mixes also boost curated
    * sources past one epoch (wiki × 2.7 and the like). Each row of
    * group g emits floor(w_g) whole copies plus one extra iff its
    * portable 48-bit md5 draw — keyed by (id, copy index), so each
    * epoch draws independently — falls under frac(w_g). Expected
    * multiplicity is exactly w_g per row; w < 1 degenerates to the
    * plain deterministic downsample (0 whole copies, kept with
    * probability w), so one operator covers the whole weight axis.
    *
    * The output carries a 0-based `copy` column so downstream
    * sharding/shuffling treats copies as distinct rows (feed
    * [[writeShards]] a composite key like concat(id, '#', copy)).
    * The decision is a pure function of (id, group, weights) — the
    * same cross-engine reproducibility contract as every sampler in
    * this file. Scale: weights are a literal when-chain (sources are
    * few), the copy explosion is a generator — cost ∝ OUTPUT rows, no
    * shuffle, no driver funnel. */
  def upsampleRepeat(df: DataFrame, idCol: String, groupCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    (weights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 0.0 && w.isFinite, s"weights must be finite and >= 0, got $w"))
    val wcol = weights.toSeq.sortBy(_._1).foldLeft(Option.empty[Column]) {
      case (acc, (g, w)) => Some(acc match {
        case None => when(col(groupCol) === g, lit(w))
        case Some(c) => c.when(col(groupCol) === g, lit(w))
      })
    }.map(_.otherwise(lit(defaultWeight))).getOrElse(lit(defaultWeight))
    val whole = floor(col("__w__")).cast(LongType)
    val unit = conv(substring(md5(concat(col(idCol).cast("string"), lit("|"),
        col("copy").cast("string"))), 1, 12), 16, 10)
      .cast(LongType).cast(DoubleType) / lit(281474976710656.0) // 2^48
    df.withColumn("__w__", wcol)
      .withColumn("copy", explode(sequence(lit(0L), floor(col("__w__")).cast(LongType))))
      .filter(col("copy") < whole || unit < (col("__w__") - floor(col("__w__"))))
      .drop("__w__")
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
