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
      // exact integer-cents sum — same semantics as the batch twin
      // EventAnalytics.hourlyAgg (order-independent, bit-reproducible)
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Per-user session state for [[sessionizeStream]]. */
  final case class SessionState(
      sessionSeq: Long, lastUs: Long, n: Long, sum: Double, startUs: Long)

  /** Streaming gap sessionization via flatMapGroupsWithState — the
    * stateful twin of [[graft.operators.EventAnalytics.sessionize]]. One
    * state entry per user. Emits a session row each time the inactivity
    * gap closes a session; with `flushTimeout` a processing-time timeout
    * also flushes (and clears) sessions left open by idle users, so
    * state does not grow without bound. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int,
      flushTimeout: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val typed = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .as[(Long, Long, Double)]
    val timeoutConf =
      if (flushTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, (Long, Long, Long, Long, Long, Double)](
        OutputMode.Append, timeoutConf) {
        case (user: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[SessionState]) =>
          if (!rows.hasNext && state.hasTimedOut) {
            // idle-user flush: emit the open session and clear state
            val out = state.getOption.filter(_.n > 0)
              .map(s => (user, s.sessionSeq, s.startUs, s.lastUs, s.n, s.sum))
            state.remove()
            out.iterator
          } else {
            // within a microbatch rows are not ordered — sort by event time
            val sorted = rows.toSeq.sortBy(_._2)
            var s = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0.0, 0L))
            val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Double)]
            sorted.foreach { case (_, us, v) =>
              if (s.lastUs == Long.MinValue || us - s.lastUs > gapUs) {
                if (s.n > 0) closed += ((user, s.sessionSeq, s.startUs, s.lastUs, s.n, s.sum))
                s = SessionState(s.sessionSeq + 1, us, 1L, v, us)
              } else {
                s = s.copy(lastUs = us, n = s.n + 1, sum = s.sum + v)
              }
            }
            state.update(s)
            flushTimeout.foreach(state.setTimeoutDuration)
            closed.iterator
          }
      }
      .toDF("user_id", "session_seq", "start_us", "end_us", "n_events", "sum_value")
  }

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
