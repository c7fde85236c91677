package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture helper for PLANS.md: prints each named query's executed
  * physical plan (post-AQE initial plan text) between BEGIN/END markers.
  * Usage: runMain graft.PlanDump <sfDir> <name>[,<name>...]
  * With `-f <outDir>` before the names, writes each query's
  * `explain("formatted")` text to <outDir>/<name>.txt instead (the
  * optimization-round plan artifact shape, plans/rNN/). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val (outDir, rest) =
      if (args.length > 2 && args(1) == "-f") (Some(args(2)), args.drop(3))
      else (None, args.drop(1))
    val names = rest.flatMap(_.split(",")).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===BEGIN $n===")
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        outDir match {
          case Some(od) =>
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val p = java.nio.file.Paths.get(od)
            java.nio.file.Files.createDirectories(p)
            java.nio.file.Files.write(p.resolve(s"$n.txt"),
              txt.getBytes("UTF-8"))
            println(s"[plandump] wrote $od/$n.txt (${txt.length} chars)")
          case None =>
            // split off AQE's repeated "== Initial Plan ==" section (NOTES
            // gotcha) so the dump carries one copy of the plan
            val txt = df.queryExecution.executedPlan.toString
              .split("== Initial Plan ==").head
            println(txt)
        }
      } catch {
        case e: Throwable =>
          println(s"[plandump] $n failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
      println(s"===END $n===")
    }
    spark.stop()
  }
}
