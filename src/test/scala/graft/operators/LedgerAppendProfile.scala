package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profile for the curve's `append_inv_ledger@8M` one-shot
  * oddity (18.4 s ledgered vs 6.1 s raw): holds the suspected variable
  * — touched-directory count — fixed at the 8M point's 707 buckets
  * while shrinking the corpus to 1M docs, and ALTERNATES raw/ledgered
  * 1000-doc appends so a GC/page-cache glitch can't land on one side.
  * If the gap tracks nBuckets it's the per-dir snapshot cost; if it
  * vanishes here, the curve number was one-shot noise at the 8M
  * point's memory pressure. Run:
  *   sbt "Test/runMain graft.operators.LedgerAppendProfile"
  */
object LedgerAppendProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def gen(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").cast("string").as("id"),
      concat_ws(" ", transform(sequence(lit(0), lit(99)),
        i => concat(lit("w"), pmod(hash(col("id"), i), lit(10000)).cast("string"))))
        .as("text"))
    Seq(354, 707).foreach { nBuckets =>
      val base = java.nio.file.Files.createTempDirectory(s"ledgerprof$nBuckets").toString
      val corpus = gen(0L, 1000000L)
      InvertedIndex.build(corpus, "id", "text", s"$base/inv",
        nBuckets = nBuckets, nDocBuckets = 64)
      var next = 1000000L
      var batchId = 0L
      (0 until 3).foreach { rep =>
        val rawBatch = gen(next, next + 1000L); next += 1000L
        val t0 = System.nanoTime()
        InvertedIndex.append(spark, s"$base/inv", rawBatch, "id", "text")
        val tRaw = (System.nanoTime() - t0) / 1e9
        val ledBatch = gen(next, next + 1000L); next += 1000L
        val t1 = System.nanoTime()
        graft.streaming.BatchLedger.runIdempotent(
          spark, s"$base/inv/_ledger", batchId, "prof") {
          val (p, d, dirs) = InvertedIndex.stageAppend(
            spark, s"$base/inv", ledBatch, "id", "text")
          (dirs, () => InvertedIndex.applyStagedAppend(spark, s"$base/inv", p, d))
        }
        val tLed = (System.nanoTime() - t1) / 1e9
        batchId += 1
        println(f"nBuckets=$nBuckets rep=$rep raw=$tRaw%.2f ledgered=$tLed%.2f")
      }
    }
    spark.stop()
  }
}
