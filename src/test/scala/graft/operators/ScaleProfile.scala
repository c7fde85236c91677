package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Offline decomposition of the large-N batch-probe cost (the
  * BENCH_CURVE scale section's ivf/ivfbq probes) — not a test. Builds
  * (once; reused across runs via /tmp/graft_scaleprof) a 1M×256
  * persisted IVF layout and times each stage of the probe plan
  * separately. Run: `sbt "Test/runMain graft.operators.ScaleProfile"`. */
object ScaleProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val dim = 256
    val nLists = 1000
    val base = s"/tmp/graft_scaleprof_${n}_$dim"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val gen = spark.range(n).select(
      col("id").cast("string").as("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(hash(col("id"), i), lit(1000)).cast("double") / 500.0 - 1.0)
          .cast("float")).as("v"))
    if (!new java.io.File(s"$base/ivf/_centroids.json").exists() &&
        !new java.io.File(s"$base/ivf/centroids").exists() &&
        !new java.io.File(s"$base/ivf").exists()) {
      println(s"[profile] building layout at $base ...")
      val corpus = gen.cache(); corpus.count()
      val t0 = System.nanoTime()
      val ivf = Ann.ivfBuild(corpus, "id", "v", nLists = nLists, maxIter = 2)
      Ann.ivfSave(ivf, s"$base/ivf")
      println(f"[profile] built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      corpus.unpersist()
    }
    val queries = gen.limit(16).cache(); queries.count()
    val ivfL = Ann.ivfLoad(spark, s"$base/ivf")
    import spark.implicits._
    def time(label: String)(body: => Unit): Unit = {
      body // warm
      val ts = (0 until 3).map { _ =>
        val t = System.nanoTime(); body; (System.nanoTime() - t) / 1e9
      }
      println(f"[profile] $label%-34s ${ts.sorted.apply(1)}%.3f s")
    }
    // stage 1: probe selection alone (queries × broadcast centroids)
    val cdf = ivfL.centroids.toDF("cluster", "cvec")
    time("probe-selection collect") {
      val probeW = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("cdist").desc, col("cluster"))
      queries.select(col("id").as("qid"), col("v").as("qv"))
        .crossJoin(broadcast(cdf))
        .withColumn("cdist", graft.functions.VectorFunctions.cosineD(col("qv"), col("cvec")))
        .withColumn("rnk", row_number().over(probeW))
        .filter(col("rnk") <= 8).count()
    }
    // stage 2: static-pruned scan of 128 dirs (file pruning + decode)
    val someClusters = (0 until 128)
    time("static-pruned scan count") {
      ivfL.assigned.filter(col("cluster").isin(someClusters: _*)).count()
    }
    time("static-pruned scan + normalize") {
      ivfL.assigned.filter(col("cluster").isin(someClusters: _*))
        .select(graft.functions.VectorNormalize.normalize(col("v"), outputFloat = false)
          .as("nv")).selectExpr("sum(size(nv))").collect()
    }
    // stage 3: full-table scan for comparison
    time("full scan count") { ivfL.assigned.count() }
    // stage 3b: isolate the join from the scoring/agg
    val probeW2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cdist").desc, col("cluster"))
    val probes2 = queries.select(col("id").as("qid"), col("v").as("qv"))
      .crossJoin(broadcast(cdf))
      .withColumn("cdist", graft.functions.VectorFunctions.cosineD(col("qv"), col("cvec")))
      .withColumn("rnk", row_number().over(probeW2))
      .filter(col("rnk") <= 8)
      .select(col("qid"), col("qv"), col("cluster"))
    time("semi-join on distinct probed clusters") {
      ivfL.assigned.join(broadcast(probes2.select(col("cluster")).distinct()),
        Seq("cluster"), "left_semi").count()
    }
    time("inner join probes (no scoring)") {
      ivfL.assigned.join(broadcast(probes2), Seq("cluster")).count()
    }
    time("probes localCheckpoint + inner join") {
      val p = probes2.localCheckpoint(true)
      ivfL.assigned.join(broadcast(p), Seq("cluster")).count()
    }
    // stage 4: the real probes
    time("ivfTopKBatch (broadcast/DPP)") {
      Ann.ivfTopKBatch(ivfL, queries, "id", "v", k = 10, nProbe = 8).count()
    }
    time("ivfTopKBatch (no broadcast)") {
      Ann.ivfTopKBatch(ivfL, queries, "id", "v", k = 10, nProbe = 8,
        broadcastProbes = false).count()
    }
    time("ivfTopK (collect path)") {
      Ann.ivfTopK(ivfL, queries, "id", "v", k = 10, nProbe = 8).count()
    }
    // what did the DPP plan actually read?
    val df = Ann.ivfTopKBatch(ivfL, queries, "id", "v", k = 10, nProbe = 8)
    df.count()
    val scans = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.linesIterator
      .filter(_.contains("FileScan")).mkString("\n")
    println("[profile] scan lines:\n" + scans)
    def leaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collectLeaves() ++ p.subqueries.flatMap(leaves) ++ (p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => leaves(a.executedPlan)
        case _ => p.children.collect {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => leaves(a.executedPlan)
        }.flatten
      })
    leaves(df.queryExecution.executedPlan).foreach {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        val m = f.metrics
        println("[profile] scan metrics: files=" +
          m.get("numFiles").map(_.value) + " partitions=" +
          m.get("numPartitions").map(_.value) + " pruned=" +
          m.get("pruningTime").map(_.value) + " rows=" +
          m.get("numOutputRows").map(_.value))
      case _ =>
    }
    spark.stop()
  }
}
