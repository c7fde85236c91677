package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dense matrix × vector product with the matrix riding as a plan
  * constant: `out[r] = sum_c M[r][c] * x[c]`, double accumulation
  * left-to-right within each row (the same deterministic fold as the F1
  * dot kernel, reference /root/reference/src/lib.rs:321-344).
  *
  * Exists for the OPQ rotation step ([[graft.operators.Ann.opqBuild]]):
  * rotating a dim-64 corpus is 4096 multiply-adds per row, and the HOF
  * formulation `transform(rows, r -> aggregate(zip_with(r, v, ...)))`
  * runs them through interpreted lambda dispatch — the measured ~25×
  * interpreted-vs-codegen gap on per-element digest work (NOTES.md)
  * applies identically to per-element matmul work. This expression keeps
  * the whole rotation inside whole-stage codegen: the flattened
  * row-major matrix is attached once per generated class via
  * `addReferenceObj` (NOT inlined into the source text, so a 1024×1024
  * rotation — 8 MB of doubles — costs nothing in codegen size), and the
  * inner loop is a primitive double[] walk.
  *
  * The matrix is held as `Seq[Double]` so the case class keeps
  * structural equality (Catalyst canonicalization / subexpression
  * elimination see through it); the primitive array is materialized once
  * lazily per task. Null elements read as 0.0 like every other vector
  * kernel here. A vector whose length differs from `cols` throws — a
  * rotation applied to the wrong dimensionality is corruption, not data.
  */
case class MatVecMul(child: Expression, matrix: Seq[Double], rows: Int, cols: Int)
  extends UnaryExpression {

  require(matrix.size == rows * cols,
    s"matvec: matrix size ${matrix.size} != rows*cols = ${rows * cols}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"matvec expects ARRAY<FLOAT|DOUBLE>, got $other")
  }

  private def isDouble = child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  @transient private lazy val flat: Array[Double] = matrix.toArray

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n != cols) throw new IllegalArgumentException(
      s"matvec: vector length $n != matrix cols $cols")
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      xs(i) = if (arr.isNullAt(i)) 0.0 else if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
      i += 1
    }
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      var s = 0.0
      val base = r * cols
      var c = 0
      while (c < cols) { s += flat(base + c) * xs(c); c += 1 }
      out(r) = s
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isDouble) "getDouble" else "getFloat"
    val matRef = ctx.addReferenceObj("matvecMatrix", flat, "double[]")
    nullSafeCodeGen(ctx, ev, cIn => {
      val n = ctx.freshName("n")
      val xs = ctx.freshName("xs")
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      val cc = ctx.freshName("c")
      val base = ctx.freshName("base")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      s"""
         |int $n = $cIn.numElements();
         |if ($n != $cols) throw new IllegalArgumentException(
         |  "matvec: vector length " + $n + " != matrix cols " + $cols);
         |double[] $xs = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $xs[$i] = $cIn.isNullAt($i) ? 0.0 : (double) $cIn.$get($i);
         |}
         |double[] $out = new double[$rows];
         |for (int $r = 0; $r < $rows; $r++) {
         |  double $s = 0.0;
         |  int $base = $r * $cols;
         |  for (int $cc = 0; $cc < $cols; $cc++) {
         |    $s += $matRef[$base + $cc] * $xs[$cc];
         |  }
         |  $out[$r] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "matvec"
}

object MatVec {
  /** `matrix` as rows (each of equal length) × vector column → ARRAY<DOUBLE>. */
  def matvec(matrix: Seq[Seq[Double]], v: Column): Column = {
    require(matrix.nonEmpty && matrix.forall(_.size == matrix.head.size),
      "matvec: matrix rows must be non-empty and uniform length")
    ColumnBridge.column(MatVecMul(
      ColumnBridge.expression(v),
      matrix.flatten.toVector, matrix.size, matrix.head.size))
  }
}
