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
