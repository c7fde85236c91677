package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the contract between the engine's table readers and the
  * driver-generated testdata's ACTUAL parquet physical types.
  *
  * The round-8 gate regression happened because the generator silently
  * switched events.ts from TIMESTAMP(NANOS) (surfaced as raw long under
  * nanosAsLong) to TIMESTAMP(MICROS) (surfaced as TIMESTAMP_NTZ) and no
  * in-sandbox test read the file the way the driver's oracle (DuckDB)
  * does. These tests compare [[Tables.events]] against constants computed
  * by DuckDB from the same file, so the NEXT silent regeneration fails
  * here instead of at the correctness gate. */
class TablesSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("events.ts normalizes to epoch-micros TIMESTAMP matching DuckDB on the real testdata") {
    val ev = Tables.events(s, TestSpark.sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"normalizer must yield session TIMESTAMP, got ${ev.schema("ts").dataType}")
    val r = ev.agg(
      count(lit(1)).as("n"),
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    // DuckDB: SELECT count(*), min(epoch_us(ts)), max(epoch_us(ts))
    //         FROM '/root/testdata/sf0.001/events.parquet'
    assert(r.getLong(0) == 1000L)
    assert(r.getLong(1) == 1704067798778549L,
      s"min epoch_us drifted: ${r.getLong(1)} — testdata physical type changed?")
    assert(r.getLong(2) == 1706657176220708L,
      s"max epoch_us drifted: ${r.getLong(2)} — testdata physical type changed?")
  }

  test("normalizeTs handles all three physical shapes identically") {
    import s.implicits._
    val us = 1704067798778549L
    // raw long of NANOS (the nanosAsLong surface)
    val fromNanos = Tables.normalizeTs(Seq(us * 1000L).toDF("ts"))
    // TIMESTAMP_NTZ (the micros/isAdjustedToUTC=false surface, UTC session)
    val fromNtz = Tables.normalizeTs(
      Seq(us).toDF("us").select(timestamp_micros($"us").cast(TimestampNTZType).as("ts")))
    // already session TIMESTAMP — passthrough
    val fromTs = Tables.normalizeTs(
      Seq(us).toDF("us").select(timestamp_micros($"us").as("ts")))
    for (df <- Seq(fromNanos, fromNtz, fromTs)) {
      assert(df.schema("ts").dataType == TimestampType)
      assert(df.select(unix_micros($"ts")).head().getLong(0) == us)
    }
  }

  test("streaming events schema is probed from the file, not assumed") {
    val st = graft.streaming.StreamingOps.eventsSchema(s, s"${TestSpark.sf}/events.parquet")
    val batch = s.read.parquet(s"${TestSpark.sf}/events.parquet").schema("ts").dataType
    assert(st("ts").dataType == batch,
      s"stream forced schema (${st("ts").dataType}) diverged from file surface ($batch)")
    assert(batch == LongType || batch == TimestampNTZType || batch == TimestampType)
  }
}
