package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._
import graft.functions.TopKByScore
import graft.operators.VectorStore

/** Property tests for the kernel functions (F1/F2) and the bounded top-k
  * aggregate (F3) — mirrors /root/reference/tests/unit_tests.rs:145-240
  * and src/lib.rs:427-502. ScalaCheck generators are driven manually
  * (fixed seeds) since the scalatest-scalacheck bridge is not available
  * offline. */
class FunctionsSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecGen: Gen[List[Float]] =
    Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f).suchThat(f => !f.isNaN)))

  test("dot product value table (unit_tests.rs:145-205)") {
    val cases = Seq(
      (Seq(1f, 2f, 3f), Seq(4f, 5f, 6f), 32.0),
      (Seq(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f), // chunks + remainder
        Seq(9f, 8f, 7f, 6f, 5f, 4f, 3f, 2f, 1f), 165.0),
      (Seq.empty[Float], Seq.empty[Float], 0.0),
      (Seq(-1f, 2f), Seq(3f, -4f), -11.0))
    val df = cases.toDF("a", "b", "want")
    val got = df.select(dotD(col("a"), col("b")).as("got"), col("want")).collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("property: normalized vectors have unit norm; dot is symmetric and bounded") {
    val cases = samples(vecGen, 30).filter(_.exists(x => math.abs(x) > 1e-3))
      .map(a => (a, a.reverse.map(x => x + 0.1f)))
    assert(cases.nonEmpty)
    val df = cases.toDF("a", "b")
    val rs = df.select(
      sqrt(dotD(normalizeD(col("a"), l2normD(col("a"))),
        normalizeD(col("a"), l2normD(col("a"))))).as("n"),
      dotD(col("a"), col("b")).as("ab"),
      dotD(col("b"), col("a")).as("ba"),
      cosineD(col("a"), col("b")).as("cos")).collect()
    rs.foreach { r =>
      assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-9)
      assert(r.getDouble(3) >= -1.0 - 1e-9 && r.getDouble(3) <= 1.0 + 1e-9)
    }
  }

  test("maxSimD: hand-checked late-interaction score; reduces to dot on single tokens") {
    val df = Seq((
      Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)),           // query tokens
      Seq(Seq(1.0, 0.0), Seq(0.6, 0.8)))           // doc tokens
    ).toDF("q", "d")
    // token 1: max(1.0, 0.6) = 1.0; token 2: max(0.0, 0.8) = 0.8
    val got = df.select(maxSimD(col("q"), col("d")).as("s")).head().getDouble(0)
    assert(math.abs(got - 1.8) < 1e-12)
    // single-token sets degenerate to the plain dot product
    val one = Seq((Seq(Seq(0.5, 0.5)), Seq(Seq(0.25, 0.75)))).toDF("q", "d")
    val viaMax = one.select(maxSimD(col("q"), col("d"))).head().getDouble(0)
    val viaDot = one.select(dotD(element_at(col("q"), 1), element_at(col("d"), 1)))
      .head().getDouble(0)
    assert(viaMax == viaDot)
  }

  test("codegen VectorDot agrees exactly with the HOF formulation") {
    val cases = samples(vecGen, 40).filter(_.nonEmpty).map(a => (a, a.map(x => x * 0.7f - 1f)))
    val df = cases.toDF("a", "b")
    val rs = df.select(dotD(col("a"), col("b")).as("fast"),
      dotHof(col("a"), col("b")).as("ref")).collect()
    rs.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // bitwise equal
  }

  test("SQL surface: kernel functions usable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT vector_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
        |       vector_normalize(array(3.0D, 4.0D))[0] AS n0,
        |       simhash64(array('a', 'b')) AS sh,
        |       size(word_shingles('a b c d', 2)) AS nsh,
        |       size(minhash_signature(array('a', 'b'), 8)) AS nmh
        |""".stripMargin).head()
    assert(r.getAs[Double]("d") == 11.0)
    assert(math.abs(r.getAs[Double]("n0") - 0.6) < 1e-12)
    assert(r.getAs[Long]("sh") != 0L)
    assert(r.getAs[Int]("nsh") == 3)
    assert(r.getAs[Int]("nmh") == 8)
    val p = spark.sql(
      """SELECT size(portable_minhash(array('a', 'b'), 8)) AS npm,
        |       portable_simhash48(array('a', 'b')) AS ps,
        |       size(winnow_fingerprints('the quick brown fox jumps', 4, 3)) AS nw
        |""".stripMargin).head()
    assert(p.getAs[Int]("npm") == 8)
    assert(p.getAs[Long]("ps") > 0L && p.getAs[Long]("ps") < (1L << 48))
    assert(p.getAs[Int]("nw") > 0)
    val agg = spark.sql(
      """SELECT topk_by_score(s, i, 2) AS top FROM VALUES
        |  (1.0D, 'a'), (3.0D, 'b'), (2.0D, 'c') AS t(s, i)""".stripMargin)
      .selectExpr("transform(top, x -> x.id) AS ids").head().getSeq[String](0)
    assert(agg == Seq("b", "c"))
  }

  test("SQL arity errors name the function instead of an index error") {
    GraftFunctions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vector_dot(array(1.0F))").head()
    }
    assert(e.getMessage.contains("vector_dot"))
  }

  test("normalizeLocal rejects zero vector (lib.rs:352-355)") {
    intercept[IllegalArgumentException] { VectorStore.normalizeLocal(Array(0f, 0f)) }
  }

  test("topk aggregate == orderBy/limit, with deterministic id ties (lib.rs:218-242)") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 500).map(i => (s"id_$i", math.floor(rng.nextDouble() * 20) / 20.0))
    val df = rows.toDF("id", "score").repartition(7) // force partial/merge paths
    val viaAgg = df.agg(TopKByScore.topk(col("score"), col("id"), 25).as("h"))
      .select(explode(col("h")).as("h"))
      .select(col("h.id"), col("h.score"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val viaSort = df.orderBy(col("score").desc, col("id").asc).limit(25)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(viaAgg == viaSort) // same set AND same deterministic order
  }

  test("topk aggregate: k larger than input, NaN excluded") {
    val df = Seq(("a", 1.0), ("b", Double.NaN), ("c", 0.5)).toDF("id", "score")
    val got = df.agg(TopKByScore.topk(col("score"), col("id"), 10).as("h"))
      .select(explode(col("h")).as("h")).select(col("h.id"))
      .as[String].collect().toSeq
    assert(got == Seq("a", "c"))
  }

  test("property: query(k) ids are a prefix of query(k+5) ids") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val st = VectorStore.fromDataFrame(e, "vec_id", "embedding", 64, elemType = DoubleType)
    val q = e.filter(col("vec_id") === 1).select("embedding").head().getSeq[Float](0).toArray
    val k5 = st.query(q, 5).select("__id__").as[String].collect().toSeq
    val k10 = st.query(q, 10).select("__id__").as[String].collect().toSeq
    assert(k10.take(5) == k5)
  }

  test("matvec: value table, float input widening, null-as-zero, length mismatch throws") {
    import graft.functions.MatVec.matvec
    // 2x3 * [1,2,3] = [1*1+2*2+3*3, 4*1+5*2+6*3] = [14, 32]
    val m = Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))
    val got = Seq(Seq(1.0, 2.0, 3.0)).toDF("v")
      .select(matvec(m, col("v")).as("y")).head().getSeq[Double](0)
    assert(got == Seq(14.0, 32.0))
    // float input widens to double before multiply (same as the dot kernel)
    val gotF = Seq(Seq(1f, 2f, 3f)).toDF("v")
      .select(matvec(m, col("v")).as("y")).head().getSeq[Double](0)
    assert(gotF == Seq(14.0, 32.0))
    // null element reads as 0.0, mirroring every other vector kernel
    val gotN = Seq(Seq[java.lang.Double](1.0, null, 3.0)).toDF("v")
      .select(matvec(m, col("v")).as("y")).head().getSeq[Double](0)
    assert(gotN == Seq(1.0 + 9.0, 4.0 + 18.0))
    // wrong dimensionality is corruption, not data
    val ex = intercept[Exception] {
      Seq(Seq(1.0, 2.0)).toDF("v").select(matvec(m, col("v"))).collect()
    }
    assert(ex.getMessage.contains("matvec") || ex.getCause.getMessage.contains("matvec"))
  }

  test("matvec: codegen path agrees with an interpreted HOF formulation on random data") {
    import graft.functions.MatVec.matvec
    val rnd = new scala.util.Random(7)
    val dim = 16
    val m = Seq.fill(dim)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val vecs = Seq.fill(20)(Seq.fill(dim)(rnd.nextDouble() * 2 - 1))
    val df = vecs.toDF("v")
    val viaExpr = df.select(matvec(m, col("v")).as("y")).collect().map(_.getSeq[Double](0))
    // reference fold: same left-to-right double accumulation per row
    val viaLocal = vecs.map(v => m.map(row => row.zip(v).foldLeft(0.0) { case (s, (a, b)) => s + a * b }))
    viaExpr.zip(viaLocal).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) => assert(x == y, s"codegen $x != fold $y") }
    }
  }
}
