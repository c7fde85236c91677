package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Squared-Euclidean argmin over a centroid table riding as a plan
  * constant: `out = argmin_r Σ_c (C[r][c] - x[c])²`, first minimum wins
  * on ties (strict `<` — the same choice as `array_position(dists,
  * array_min(dists))` and MLlib's findClosest, so every assignment path
  * in the library routes identically).
  *
  * Exists for the fit-free batch-assignment paths
  * ([[graft.operators.Ann.ivfAppendSave]] and friends): the former HOF
  * formulation `transform(cents, c -> aggregate(zip_with(v, c, ...)))`
  * materializes a dim-length array PER CENTROID PER ROW — at the
  * standard nLists ∝ √N geometry that is nLists×dim doubles of garbage
  * per assigned row (1000 × 256 at a 1M-corpus append), and the lambda
  * dispatch runs interpreted. Same medicine as [[MatVecMul]]: the
  * flattened row-major centroid matrix is attached once per generated
  * class via `addReferenceObj`, and the whole argmin is a primitive
  * double[] walk inside whole-stage codegen — zero allocation beyond
  * the one unpacked input vector.
  *
  * The matrix is held as `Seq[Double]` so the case class keeps
  * structural equality (canonicalization / subexpression elimination
  * see through it). Null elements read as 0.0 like every vector kernel
  * here; a vector whose length differs from `dim` throws — assigning a
  * wrong-dimensionality vector is corruption, not data. */
case class NearestCentroid(child: Expression, cents: Seq[Double], k: Int, dim: Int)
  extends UnaryExpression {

  require(k >= 1, s"nearest-centroid: need at least one centroid, got $k")
  require(cents.size == k * dim,
    s"nearest-centroid: matrix size ${cents.size} != k*dim = ${k * dim}")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest-centroid expects ARRAY<FLOAT|DOUBLE>, got $other")
  }

  private def isDouble = child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  @transient private lazy val flat: Array[Double] = cents.toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"nearest-centroid: vector length $n != centroid dim $dim")
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      xs(i) = if (arr.isNullAt(i)) 0.0 else if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
      i += 1
    }
    var best = 0
    var bestD = Double.PositiveInfinity
    var r = 0
    while (r < k) {
      var s = 0.0
      val base = r * dim
      var c = 0
      while (c < dim) { val d = flat(base + c) - xs(c); s += d * d; c += 1 }
      if (s < bestD) { bestD = s; best = r }
      r += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isDouble) "getDouble" else "getFloat"
    val matRef = ctx.addReferenceObj("centroidMatrix", flat, "double[]")
    nullSafeCodeGen(ctx, ev, cIn => {
      val n = ctx.freshName("n")
      val xs = ctx.freshName("xs")
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      val cc = ctx.freshName("c")
      val base = ctx.freshName("base")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $n = $cIn.numElements();
         |if ($n != $dim) throw new IllegalArgumentException(
         |  "nearest-centroid: vector length " + $n + " != centroid dim " + $dim);
         |double[] $xs = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $xs[$i] = $cIn.isNullAt($i) ? 0.0 : (double) $cIn.$get($i);
         |}
         |int $best = 0;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $r = 0; $r < $k; $r++) {
         |  double $s = 0.0;
         |  int $base = $r * $dim;
         |  for (int $cc = 0; $cc < $dim; $cc++) {
         |    double $d = $matRef[$base + $cc] - $xs[$cc];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestD) { $bestD = $s; $best = $r; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {
  /** Centroids as rows (dense 0..k-1 order, uniform length) × vector
    * column → INT index of the nearest (squared-Euclidean, first-min
    * tie-break). */
  def nearest(centroids: Seq[Seq[Double]], v: Column): Column = {
    require(centroids.nonEmpty && centroids.forall(_.size == centroids.head.size),
      "nearest-centroid: centroid rows must be non-empty and uniform length")
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.expression(v),
      centroids.flatten.toVector, centroids.size, centroids.head.size))
  }
}
