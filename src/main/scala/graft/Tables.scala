package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated parquet tables (TESTDATA.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
  def documents(s: SparkSession, dir: String): DataFrame  = t(s, dir, "documents")
  def events(s: SparkSession, dir: String): DataFrame     = t(s, dir, "events")
  def lineitem(s: SparkSession, dir: String): DataFrame   = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame     = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame   = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = t(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame     = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame     = t(s, dir, "region")
}
