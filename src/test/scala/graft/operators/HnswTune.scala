package graft.operators

/** Offline tuning harness for [[HnswReplica]] on the reference
  * microbench's hardest case: uniform pseudo-random vectors at dim 1024
  * (pairwise cosines concentrate near 0, so the graph has almost no
  * exploitable structure). Not a test — run with
  * `sbt "Test/runMain graft.operators.HnswTune [n] [dim]"`. */
object HnswTune {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20000
    val dim = if (args.length > 1) args(1).toInt else 1024
    val nq = 20
    val k = 10

    // deterministic per-(row, component) values like the bench's
    // hash-based generator: uniform in [-1, 1), then L2-normalized
    val flat = new Array[Float](n * dim)
    java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
      val r = new java.util.SplittableRandom(0xC0FFEE ^ (i * 0x9E3779B97F4A7C15L))
      var j = 0
      var ss = 0.0
      val off = i * dim
      while (j < dim) {
        val v = (r.nextDouble() * 2 - 1).toFloat
        flat(off + j) = v; ss += v.toDouble * v.toDouble; j += 1
      }
      val inv = (1.0 / math.sqrt(ss))
      j = 0
      while (j < dim) { flat(off + j) = (flat(off + j) * inv).toFloat; j += 1 }
    }
    val ids = Array.tabulate(n)(_.toString)

    // ground truth: brute-force top-k for nq spread queries
    val qIdx = Array.tabulate(nq)(i => (i.toLong * (n - 1) / (nq - 1)).toInt)
    val truth = qIdx.map { qi =>
      val qo = qi * dim
      val scored = new Array[(Double, Int)](n)
      var i = 0
      while (i < n) {
        var s = 0.0; var j = 0; val o = i * dim
        while (j < dim) { s += flat(o + j).toDouble * flat(qo + j).toDouble; j += 1 }
        scored(i) = (s, i); i += 1
      }
      scored.sortBy(t => (-t._1, t._2)).take(k).map(_._2.toString).toSet
    }

    if (args.length > 2 && args(2) == "shards") {
      // sharded mode: args = n dim "shards" nShards m efC
      val (ns, m, efc) = (args(3).toInt, args(4).toInt, args(5).toInt)
      val t0 = System.nanoTime()
      val h = HnswShards.build(ids, flat, dim, ns, m, efc, 42L)
      val tb = (System.nanoTime() - t0) / 1e9
      val line = Seq(32, 64, 128, 256).map { ef =>
        val warm = qIdx.take(3).foreach { qi =>
          h.query(java.util.Arrays.copyOfRange(flat, qi * dim, (qi + 1) * dim), k, ef = ef)
        }
        val t1 = System.nanoTime()
        val rec = qIdx.zipWithIndex.map { case (qi, w) =>
          val q = java.util.Arrays.copyOfRange(flat, qi * dim, (qi + 1) * dim)
          h.query(q, k, ef = ef).count(p => truth(w).contains(p._1)) / k.toDouble
        }.sum / nq
        val tq = (System.nanoTime() - t1) / 1e9 / nq * 1000
        f"ef=$ef%4d r=$rec%.3f ${tq}%.2fms"
      }.mkString("  ")
      println(f"shards=$ns m=$m efC=$efc build=${tb}%.1fs  $line")
      return
    }
    val configs =
      if (args.length > 2) Seq((args(2).toInt, args(3).toInt))
      else Seq((16, 64), (16, 200), (32, 200), (32, 400), (48, 400))
    for ((m, efc) <- configs) {
      val t0 = System.nanoTime()
      val h = HnswReplica.build(ids, flat, dim, m, efc, 42L)
      val tb = (System.nanoTime() - t0) / 1e9
      val efs = Seq(64, 128, 256, 512, 1024)
      val line = efs.map { ef =>
        val t1 = System.nanoTime()
        val rec = qIdx.zipWithIndex.map { case (qi, w) =>
          val q = java.util.Arrays.copyOfRange(flat, qi * dim, (qi + 1) * dim)
          h.query(q, k, ef = ef).count(p => truth(w).contains(p._1)) / k.toDouble
        }.sum / nq
        val tq = (System.nanoTime() - t1) / 1e9 / nq * 1000
        f"ef=$ef%4d r=$rec%.3f ${tq}%.2fms"
      }.mkString("  ")
      println(f"m=$m%2d efC=$efc%3d build=${tb}%.1fs  $line")
    }
  }
}
