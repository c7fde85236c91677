package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational helpers with explicit 100-TB posture. */
object Relational {

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
