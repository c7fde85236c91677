package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profile for the ref_insert path (normalize + cache +
  * count over 100k×1024 synthetic vectors): ten isolated repetitions,
  * printed raw, to separate code regressions from the box's documented
  * ±30% run-to-run noise. Run:
  *   sbt "Test/runMain graft.operators.InsertProfile"
  */
object InsertProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        sys.env.getOrElse("PROFILE_CACHE_COMPRESSED", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dim = 1024
    val gen = spark.range(100000L).select(
      col("id").cast("string").as("__id__"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(hash(col("id"), i), lit(1000)).cast("double") / 500.0 - 1.0).cast("float"))
        .as("vector"))
    val raw = gen.cache(); raw.count()
    var cached: VectorStore = null
    val ts = (0 until 10).map { i =>
      if (cached != null) cached.df.unpersist(blocking = true)
      System.gc()
      val t0 = System.nanoTime()
      val st = VectorStore(VectorStore.withNormalizedVector(raw), dim)
      cached = st.copy(df = st.df.cache())
      cached.df.count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"rep $i%2d: $t%.3f s")
      t
    }
    println(f"min=${ts.min}%.3f median=${ts.sorted.apply(5)}%.3f max=${ts.max}%.3f")
    spark.stop()
  }
}
