package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorStore

/** Model-based lifecycle test: a random sequence of upsert/delete ops is
  * applied both to the Spark store and to a trivial in-memory model with
  * the reference's semantics (normalize-at-ingest, stale-fields-on-update
  * — /root/reference/src/lib.rs:150-185, 273-286). After every few ops the
  * full state and a top-k query must agree. Catches join-semantics bugs
  * that single-case specs miss. */
class StoreModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 6

  private case class ModelRow(vector: Array[Double], tag: String)

  private def normalize(v: Array[Float]): Array[Double] = {
    val ss = v.map(x => x.toDouble * x.toDouble).sum
    val inv = 1.0 / math.sqrt(ss)
    v.map(_.toDouble * inv)
  }

  test("random upsert/delete sequences match the in-memory model") {
    val rng = new Random(1234)
    def randVec(): Array[Float] =
      Array.fill(dim)(rng.nextFloat() * 2f - 1f + 0.01f)

    var model = scala.collection.mutable.LinkedHashMap.empty[String, ModelRow]
    val seedVec = randVec()
    var store = VectorStore.fromDataFrame(
      Seq(("seed", seedVec.toSeq, "t0")).toDF("id", "vec", "tag"),
      "id", "vec", dim)
    model += ("seed" -> ModelRow(normalize(seedVec), "t0"))

    (0 until 8).foreach { step =>
      // build a random batch: mix of updates (existing ids) and inserts
      val existing = model.keys.toVector
      val nUpd = math.min(existing.size, rng.nextInt(3))
      val upd = rng.shuffle(existing).take(nUpd)
      val ins = (0 until (1 + rng.nextInt(3))).map(i => s"id_${step}_$i")
      val batch = (upd ++ ins).map(id => (id, randVec().toSeq, s"tag_$step"))
      val batchDf = batch.toDF("__id__", "vector", "tag")
        .withColumn("vector", col("vector").cast(ArrayType(FloatType)))
      val r = store.upsert(batchDf)
      // model semantics
      batch.foreach { case (id, vec, tag) =>
        val nv = normalize(vec.toArray)
        model.get(id) match {
          case Some(old) => model(id) = ModelRow(nv, old.tag) // stale fields
          case None      => model += (id -> ModelRow(nv, tag))
        }
      }
      // returned id lists
      assert(r.updatedIds.as[String].collect().toSet == upd.toSet, s"step $step updated")
      assert(r.insertedIds.as[String].collect().toSet == ins.toSet, s"step $step inserted")
      store = r.store

      // occasionally delete a couple of random ids
      if (step % 3 == 2 && model.nonEmpty) {
        val dels = rng.shuffle(model.keys.toVector).take(1 + rng.nextInt(2))
        store = store.delete(dels)
        dels.foreach(model -= _)
      }

      // full-state equivalence (vectors are float-stored; compare at 1e-6)
      val got = store.df.collect().map { row =>
        row.getAs[String]("__id__") ->
          (row.getAs[scala.collection.Seq[Float]]("vector").toArray, row.getAs[String]("tag"))
      }.toMap
      assert(got.keySet == model.keySet, s"step $step ids")
      got.foreach { case (id, (vec, tag)) =>
        val m = model(id)
        assert(tag == m.tag, s"step $step fields of $id")
        vec.zip(m.vector).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-6, s"step $step vector of $id")
        }
      }

      // query equivalence: top-3 by cosine against a fresh random query
      val q = randVec()
      val qn = normalize(q)
      val expected = model.toSeq
        .map { case (id, m) => (id, m.vector.zip(qn).map { case (a, b) => a * b }.sum) }
        .sortBy { case (id, s) => (-s, id) }
        .take(3).map(_._1)
      val gotTop = store.query(q, 3).select("__id__").as[String].collect().toSeq
      assert(gotTop == expected, s"step $step query")
    }
  }
}
