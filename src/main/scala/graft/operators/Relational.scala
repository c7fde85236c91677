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
