package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics over the `events` table (batch side; the
  * structured-streaming variants live in graft.streaming). Sums go
  * through exact DECIMAL so results are order-independent and
  * oracle-deterministic. */
object EventAnalytics {

  /** Order-independent exact sum: round to integer cents, sum as BIGINT,
    * scale back. (A DECIMAL cast of a double rounds differently across
    * engines at high scale — integer cents are bit-identical everywhere.) */
  private def decSum(c: Column): Column =
    (sum(round(c * 100).cast(LongType)).cast(DoubleType) / 100.0)

  /** Tumbling-hour aggregation by event type. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        decSum(col("value")).as("sum_value"))

  /** Gap-based sessionization: a new session starts after `gapMinutes` of
    * user inactivity. Window functions over (user, ts) — one shuffle.
    * Comparisons run on exact epoch microseconds and the sort carries an
    * event_id tiebreaker, so session assignment is fully deterministic. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("prev_ts", "new_session")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        count(lit(1)).as("n_events"),
        decSum(col("value")).as("sum_value"))

  /** As-of join: attach to each left row the LATEST right row with
    * `right.ts <= left.ts` on the same key (null struct when none).
    *
    * Spark has no native as-of join, and the naive `r.ts <= l.ts`
    * inequality join plans as a nested loop with unbounded fan-out.
    * Instead: tag both sides, union them, and take `last(right_payload,
    * ignoreNulls)` over a (key)-partitioned window ordered by (ts, tag,
    * payload) — ONE shuffle on the key, O(n log n) per partition, no pair
    * explosion, which is the shape that survives 100 TB.
    *
    * Determinism: at equal timestamps the right row wins (inclusive
    * semantics), and among right rows sharing (key, ts) the largest
    * payload tuple (lexicographic over `ts` then the remaining right
    * columns in order) wins.
    *
    * Output: every left column plus an `asof` struct of the matched right
    * row (`ts` + right's other non-key columns).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame =
    asofJoin(left, right, key, ts, toleranceMicros = None, forward = false)

  /** [[asofJoin]] with the two knobs production as-of engines expose:
    *
    *  - `forward = true` flips the direction — attach the EARLIEST right
    *    row with `right.ts >= left.ts` (inclusive; at equal timestamps
    *    the right row matches, and among right rows sharing (key, ts)
    *    the SMALLEST payload tuple wins — the ascending-order mirror of
    *    the backward variant's largest-wins rule).
    *  - `toleranceMicros = Some(t)` bounds the match window: a matched
    *    row further than `t` microseconds from the left timestamp nulls
    *    out (exactly how kdb's `wj`/pandas `merge_asof(tolerance=...)`
    *    behave). The bound is a per-row post-filter on the already-
    *    matched struct — the plan keeps the single keyed exchange +
    *    window, no extra join, so the 100 TB shape is unchanged.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      toleranceMicros: Option[Long], forward: Boolean): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == key || c == ts)
    // tag layout puts right rows on the matching side of the left row at
    // equal timestamps: backward = rights sort BEFORE lefts (0 < 1) so
    // the trailing frame sees them; forward = rights sort AFTER (2 > 1)
    // so the leading frame sees them — inclusive semantics both ways
    val rTag = if (forward) 2 else 0
    val r2 = right.select(
      col(key), col(ts), lit(rTag).as("__tag__"),
      struct(col(ts) +: payloadCols.map(col): _*).as("asof"))
    val l2 = left
      .withColumn("__tag__", lit(1))
      .withColumn("asof", lit(null).cast(r2.schema("asof").dataType))
    val w0 = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__tag__"), col("asof"))
    val matched =
      if (forward)
        first(col("asof"), ignoreNulls = true)
          .over(w0.rowsBetween(0, Window.unboundedFollowing))
      else
        last(col("asof"), ignoreNulls = true)
          .over(w0.rowsBetween(Window.unboundedPreceding, 0))
    val joined = l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("asof", matched)
      .filter(col("__tag__") === 1)
      .drop("__tag__")
    toleranceMicros match {
      case None => joined
      case Some(tol) =>
        val delta =
          if (forward) unix_micros(col(s"asof.$ts")) - unix_micros(col(ts))
          else unix_micros(col(ts)) - unix_micros(col(s"asof.$ts"))
        joined.withColumn("asof",
          when(col("asof").isNotNull && delta <= tol, col("asof")))
    }
  }

  /** Bounded-lookback range join: for each left row, aggregate the right
    * rows of the same key with `l.ts - lookback <= r.ts < l.ts`.
    *
    * A raw interval predicate has no equi key and plans as a nested loop.
    * Bucketing time by the lookback length turns it into a hash join:
    * each right row lands in exactly one bucket, each left row probes the
    * two buckets its window can span, and the exact interval filter runs
    * on the joined pairs. Fan-out is bounded by per-bucket density — the
    * bucketed-range-join shape, partition-parallel at any scale.
    *
    * Output: left's columns plus `n_matches` and the exact-cents
    * `sum_value` of the matched right rows (0 / 0.0 when none).
    */
  def lookbackStats(left: DataFrame, right: DataFrame, key: String, ts: String,
      valCol: String, lookbackMinutes: Int): DataFrame =
    lookWindowStats(left, right, key, ts, valCol, lookbackMinutes, forward = false)

  /** Forward twin of [[lookbackStats]]: aggregate the right rows with
    * `l.ts < r.ts <= l.ts + horizon` — "what happens in the N minutes
    * AFTER each event" (conversion-window aggregates). Same
    * bucketed-range-join shape: each left row probes its own bucket and
    * the NEXT one instead of the previous one. */
  def lookforwardStats(left: DataFrame, right: DataFrame, key: String, ts: String,
      valCol: String, horizonMinutes: Int): DataFrame =
    lookWindowStats(left, right, key, ts, valCol, horizonMinutes, forward = true)

  private def lookWindowStats(left: DataFrame, right: DataFrame, key: String,
      ts: String, valCol: String, windowMinutes: Int, forward: Boolean): DataFrame = {
    val lookUs = windowMinutes * 60L * 1000000L
    val lUs = unix_micros(col(ts))
    val blk = floor(lUs.cast(DoubleType) / lookUs).cast(LongType)
    // per-row tag assigned BEFORE the probe fan-out, so duplicate left
    // rows stay distinct output rows instead of collapsing in the final
    // groupBy (and double-counting their matches)
    val probeBlks = if (forward) array(blk, blk + 1) else array(blk, blk - 1)
    val l2 = left.withColumn("__rowid__", monotonically_increasing_id())
      .withColumn("__lus__", lUs)
      .withColumn("__blk__", explode(probeBlks))
    val r2 = right.select(
      col(key), unix_micros(col(ts)).as("__rus__"),
      round(col(valCol) * 100).cast(LongType).as("__rcents__"),
      blk.as("__blk__"))
    val hit =
      if (forward)
        col("__rus__") > col("__lus__") && col("__rus__") <= col("__lus__") + lookUs
      else
        col("__rus__") >= col("__lus__") - lookUs && col("__rus__") < col("__lus__")
    val groupCols = col("__rowid__") +: left.columns.map(col)
    l2.join(r2, Seq(key, "__blk__"), "left_outer")
      .groupBy(groupCols: _*)
      .agg(
        sum(when(hit, 1L).otherwise(0L)).as("n_matches"),
        (sum(when(hit, col("__rcents__")).otherwise(0L)).cast(DoubleType) / 100.0)
          .as("sum_value"))
      .drop("__rowid__")
  }

  /** JSON property extraction + aggregation (props is a JSON string). */
  def propsAgg(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))
}
