package graft
import org.apache.spark.sql.SparkSession

/** Scale-curve benchmark: the headline queries timed at every available
  * scale factor in ONE run, so nonlinear plan behavior (a band join
  * whose pair volume curves super-linearly, an agg that stops combining
  * map-side) shows up as a measured curve instead of a guess.
  *
  * Key selection: queries whose INPUT actually scales with sf —
  * lineitem/orders/events grow 10x per step (sf0.001→0.01→0.1);
  * documents/embeddings only grow at sf0.1, so their keys contribute a
  * two-point curve. Per (sf, query): median-of-3 ([[Bench.median3]]),
  * one warmup count per table per sf outside any timed section.
  * Output: BENCH_CURVE.json {"sfs": [...], "queries": {name: {sf: sec}}}.
  * Expected shapes at 10x input: scans/aggs/joins ~linear (sub-linear
  * while fixed per-query overhead dominates at these local sizes);
  * band joins near-linear in pair volume; top-k linear in rows.
  */
object BenchCurve {

  /** Headline keys with genuinely sf-scaling inputs (see Scaladoc).
    * Round-8 additions: pipe_shards (one shuffle over documents),
    * dedup_semantic / dedup_semantic_text (cluster-blocked pair joins
    * whose within-cluster volume is the quantity to watch), and
    * ann_ivf_topk (build + probe over the scaling embeddings). */
  private val keys = Seq(
    "q1_agg", "q5_join_agg", "q6_filter_sum", "q14_promo", "q_window",
    "q_salted_agg", "events_hourly", "events_funnel",
    "text_stats", "text_langid", "dedup_exact", "dedup_simhash",
    "o3_topk", "pipe_e2e",
    "pipe_shards", "dedup_semantic", "dedup_semantic_text", "ann_ivf_topk",
    "ann_opq", "ann_ivfbq", "pipe_upsample", "dedup_neardup_survivor")

  def main(args: Array[String]): Unit = {
    val sfs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM/codegen warmup
    val results = sfs.map { dir =>
      // touch each table once per sf outside the timed sections
      try {
        Tables.lineitem(spark, dir).count(); Tables.events(spark, dir).count()
        Tables.documents(spark, dir).count(); Tables.embeddings(spark, dir).count()
      } catch { case scala.util.control.NonFatal(_) => }
      dir -> keys.map { name =>
        System.gc()
        var failed = false
        val t = Bench.median3 { () =>
          try { SparkEntry.queries(name)(spark, dir).count(); () }
          catch { case scala.util.control.NonFatal(_) => failed = true }
        }
        name -> (if (failed) -1.0 else t)
      }.toMap
    }.toMap
    val sfName = (d: String) => d.substring(d.lastIndexOf('/') + 1)
    val json = {
      val qs = keys.map { k =>
        val per = sfs.map(d => s""""${sfName(d)}":${results(d)(k)}""").mkString(",")
        s""""$k":{$per}"""
      }.mkString(",")
      s"""{"sfs":[${sfs.map(d => s""""${sfName(d)}"""").mkString(",")}],""" +
        s""""queries":{$qs}}"""
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_CURVE.json"), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
