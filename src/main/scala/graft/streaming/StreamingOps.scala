package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured-streaming variants of the event analytics: the same logical
  * aggregations as [[graft.operators.EventAnalytics]], expressed over
  * `readStream` with watermarks, so the batch and streaming paths share
  * semantics (Spark's unified model). The reference has no streaming
  * surface — this is north-star scope. */
object StreamingOps {

  /** events.parquet stores ts as TIMESTAMP(NANOS) which Spark surfaces as
    * a raw long under spark.sql.legacy.parquet.nanosAsLong — declare it as
    * LONG and convert after read (same ns->us truncation as the batch
    * reader in [[graft.Tables.events]]). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming tumbling-window aggregation with a watermark; late data
    * beyond 1 hour is dropped deterministically. */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Read a parquet directory as a bounded stream (test/local harness). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Run a streaming query to completion against bounded input via the
    * memory sink. `complete` mode surfaces every window on bounded input;
    * `append` (production default) emits only watermark-closed windows. */
  def runToCompletion(df: DataFrame, name: String,
      mode: String = "append"): StreamingQuery = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .start()
    q.processAllAvailable()
    q
  }
}
