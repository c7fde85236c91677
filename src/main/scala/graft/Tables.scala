package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Readers for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
  def documents(s: SparkSession, dir: String): DataFrame  = t(s, dir, "documents")

  /** Normalize an event-time column to session-zoned TIMESTAMP (epoch
    * micros) regardless of the parquet physical type the generator used:
    *  - TIMESTAMP(NANOS) under spark.sql.legacy.parquet.nanosAsLong=true
    *    surfaces as a raw long of nanoseconds -> truncate ns -> us
    *    (exactly what DuckDB does when it reads the same file);
    *  - TIMESTAMP(MICROS) with isAdjustedToUTC=false surfaces as
    *    TIMESTAMP_NTZ -> reinterpret the wall-clock under the UTC
    *    session (all graft sessions pin spark.sql.session.timeZone=UTC),
    *    matching DuckDB's epoch_us of the same column;
    *  - TIMESTAMP passes through.
    * Shared by the batch reader ([[events]]) and the streaming reader
    * (graft.streaming.StreamingOps.eventsStream) so the two paths can
    * never diverge on physical-type handling again. */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }

  def events(s: SparkSession, dir: String): DataFrame =
    normalizeTs(t(s, dir, "events"))
  def lineitem(s: SparkSession, dir: String): DataFrame   = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame     = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame   = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = t(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame     = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame     = t(s, dir, "region")
}
