package graft.operators

import org.apache.spark.sql.SparkSession

/** Throwaway isolation profile for individual `SparkEntry.queries`
  * keys — the quiet-box re-measure protocol ([[InsertProfile]]
  * pattern): each key runs alone, N isolated repetitions with a GC
  * between, raw times printed, so a per-round drift in the full bench
  * suite can be attributed to code vs the box's documented ±30%
  * run-to-run noise before anyone bisects. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "Test/runMain graft.operators.KeyProfile key1 key2 ..."
  */
object KeyProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("PROFILE_REPS", "5").toInt
    require(args.nonEmpty, "pass the SparkEntry.queries key names to profile")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM/codegen warmup
    args.foreach { key =>
      val q = graft.SparkEntry.queries(key)
      q(spark, sfDir).collect() // warm (plan cache, parquet footers)
      val ts = (0 until reps).map { i =>
        System.gc()
        val t0 = System.nanoTime()
        q(spark, sfDir).collect()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"$key rep $i%2d: $t%.3f s")
        t
      }
      println(f"$key min=${ts.min}%.3f median=${ts.sorted.apply(reps / 2)}%.3f max=${ts.max}%.3f")
    }
    spark.stop()
  }
}
