package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
  def documents(s: SparkSession, dir: String): DataFrame  = t(s, dir, "documents")

  /** events.ts is parquet TIMESTAMP(NANOS); Spark reads it only as a raw
    * long (spark.sql.legacy.parquet.nanosAsLong=true, set in Verify/Bench
    * and the test sessions). Truncate ns -> us exactly like DuckDB does
    * when it surfaces the column as a micros TIMESTAMP. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    if (raw.schema("ts").dataType == LongType) {
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else raw
  }
  def lineitem(s: SparkSession, dir: String): DataFrame   = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame     = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame   = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = t(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame     = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame     = t(s, dir, "region")
}
