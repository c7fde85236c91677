package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling harness for the distributed int8 two-phase tier — times the
  * pieces of [[QuantizedMatrixStore.query]] separately to locate the
  * 481 ms (vs 34 ms f32) reported in BENCH_LOCAL r8. Not a test; run
  * with `sbt "Test/runMain graft.operators.QmxProfile"`. */
object QmxProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 1024
    val n = 100000L
    val gen = spark.range(n).select(
      col("id").cast("string").as("__id__"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(hash(col("id"), i), lit(1000)).cast("double") / 500.0 - 1.0).cast("float"))
        .as("vector"))
    val raw = gen.cache(); raw.count()
    val st0 = VectorStore(VectorStore.withNormalizedVector(raw), dim)
    val cached = st0.copy(df = st0.df.cache())
    cached.df.count()
    val qv = cached.df.filter(col("__id__") === "0")
      .select(col("vector")).head().getSeq[Float](0).toArray

    val qmx = QuantizedMatrixStore.fromStore(cached)
    qmx.query(qv, 10) // warm

    def med(label: String)(body: => Unit): Unit = {
      val ts = (0 until 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-28s median=${ts.sorted.apply(2)}%8.1f ms  all=${ts.map(t => f"$t%.0f").mkString(",")}")
    }

    val blocks = qmx.blocksForProfiling
    med("noop job (sched+iter)") {
      blocks.mapPartitions { it => it.foreach(_ => ()); Iterator.single(0) }.collect()
    }
    med("touch codes (sum bytes)") {
      blocks.mapPartitions { it =>
        var s = 0L
        it.foreach(b => { val c = b.codes; var i = 0; while (i < c.length) { s += c(i); i += 1 } })
        Iterator.single(s)
      }.collect()
    }
    med("phase1 int8 dot only") {
      val d = dim
      val qq = new Array[Byte](d)
      blocks.mapPartitions { it =>
        var s = 0L
        it.foreach { b =>
          val codes = b.codes; val nn = b.ids.length
          var r = 0
          while (r < nn) {
            val off = r * d; var acc = 0; var i = 0
            while (i < d) { acc += codes(off + i) * qq(i); i += 1 }
            s += acc; r += 1
          }
        }
        Iterator.single(s)
      }.collect()
    }
    med("full query") { qmx.query(qv, 10) }
    val loc = qmx.toLocal()
    loc.query(qv, 10)
    med("local twin x10 (per-10)") { var i = 0; while (i < 10) { loc.query(qv, 10); i += 1 } }
    spark.stop()
  }
}
