package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.{MinHashSignature, PortableMinHash, PortableSimHash48, SimHash64, TopKByScore, VectorDot, VectorNormalize, WinnowFingerprints, WordShingles}

/** SQL registration for graft's kernel expressions, so the engine is
  * usable from plain `spark.sql(...)` as well as the Column API:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT vector_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * `GraftExtensions` does the same through the
  * `spark.sql.extensions=graft.GraftExtensions` config for sessions the
  * library does not construct itself.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, arity, builder) — arity lives next to the builder so the two
    * can't drift apart. */
  private val builders: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("vector_dot", 2, es => VectorDot(es(0), es(1))),
    ("vector_normalize", 1, es => VectorNormalize(es(0), outputFloat = false)),
    ("vector_normalize_f32", 1, es => VectorNormalize(es(0), outputFloat = true)),
    ("word_shingles", 2, es => WordShingles(es(0), intArg(es(1), "shingle size n"))),
    ("minhash_signature", 2, es => MinHashSignature(es(0), intArg(es(1), "numHashes"))),
    ("simhash64", 1, es => SimHash64(es(0))),
    ("portable_minhash", 2, es => PortableMinHash(es(0), intArg(es(1), "numHashes"))),
    ("portable_simhash48", 1, es => PortableSimHash48(es(0))),
    ("winnow_fingerprints", 3, es =>
      WinnowFingerprints(es(0), intArg(es(1), "gram size k"), intArg(es(2), "window w"))),
    ("topk_by_score", 3, es =>
      TopKByScore(es(0), es(1), intArg(es(2), "k")).toAggregateExpression()))

  /** Register all graft functions on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, arity, b) =>
      val checked: Seq[Expression] => Expression = { es =>
        if (es.length != arity) throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> name, "expectedNum" -> arity.toString,
            "actualNum" -> es.length.toString, "docroot" -> "graft"))
        b(es)
      }
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, checked, "scala_udf")
    }
}

/** Session-extensions hook: `--conf spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    Seq[(String, Seq[Expression] => Expression)](
      "vector_dot" -> (es => VectorDot(es(0), es(1))),
      "vector_normalize" -> (es => VectorNormalize(es(0), outputFloat = false)),
      "simhash64" -> (es => SimHash64(es(0)))
    ).foreach { case (name, b) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
          b))
    }
}
