package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** THROWAWAY diagnostic driver (not committed): runs one named query
  * with a job listener and prints per-job wall time + description, so
  * a multi-second key's cost can be attributed to its Spark jobs vs
  * driver-side gaps. Usage: runMain graft.Diag <sfDir> <name> */
object Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = js.stageInfos.lastOption.map(si =>
          si.name + " | " + si.details.linesIterator.take(1).mkString)
          .getOrElse("?")
        jobs.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val st = jobs.get(je.jobId)
        if (st != null) done.add((je.jobId, st._1, je.time, st._2))
      }
    })
    // warmup pass (fixtures + JIT), mirrors the bench warmup posture
    try {
      Tables.lineitem(spark, sfDir).count()
      Tables.embeddings(spark, sfDir).count()
      SparkEntry.cachedIvf(spark, sfDir)
      SparkEntry.queries(name)(spark, sfDir).count()
    } catch { case e: Throwable => println(s"warmup failed: $e") }
    done.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    val rows = done.toArray(new Array[(Int, Long, Long, String)](0)).sortBy(_._1)
    var jobTotal = 0L
    rows.foreach { case (id, s, e, d) =>
      jobTotal += (e - s)
      println(f"job $id%4d ${e - s}%6d ms  ${d.take(110)}")
    }
    println(f"== $name: wall ${wall}%.3f s, ${rows.length} jobs, job-time ${jobTotal / 1000.0}%.3f s, driver-gap ${wall - jobTotal / 1000.0}%.3f s")
    spark.stop()
  }
}
