package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Single-pass L2 normalize of a float/double array column.
  *
  * The composable formulation `transform(v, x -> x / sqrt(dot(v, v)))`
  * looks O(dim) but is O(dim^2) after Catalyst collapses the norm
  * projection into the per-element lambda (each element re-evaluates the
  * whole-array fold — visible in `.explain` as a nested vector_dot inside
  * the lambdafunction). This expression computes the norm once, then
  * divides: one pass, one primitive-array allocation, and full codegen so
  * the ingest hot loop (normalize every stored vector, reference
  * lib.rs:158,173) stays inside the whole-stage-generated function.
  *
  * Value semantics are identical to the HOF form: double accumulation
  * left-to-right (F2 kernel, /root/reference/src/lib.rs:347-359), per
  * element `(double)x / norm`, cast to float when `outputFloat`. The
  * zero vector divides to +/-Infinity exactly like the HOF form; ingest
  * guards reject it earlier (reference panics, lib.rs:352-355). Null
  * elements are treated as 0.
  */
case class VectorNormalize(child: Expression, outputFloat: Boolean)
  extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(if (outputFloat) FloatType else DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_normalize expects ARRAY<FLOAT|DOUBLE>, got $other")
  }

  private def isDouble = child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val xs = new Array[Double](n)
    var i = 0
    while (i < n) {
      xs(i) = if (arr.isNullAt(i)) 0.0 else if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
      i += 1
    }
    var ss = 0.0
    i = 0
    while (i < n) { ss += xs(i) * xs(i); i += 1 }
    val norm = math.sqrt(ss)
    if (outputFloat) {
      val out = new Array[Float](n)
      i = 0
      while (i < n) { out(i) = (xs(i) / norm).toFloat; i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = xs(i) / norm; i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isDouble) "getDouble" else "getFloat"
    val (arrJava, castOut) = if (outputFloat) ("float[]", "(float)") else ("double[]", "")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ss = ctx.freshName("ss")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      val newArr = if (outputFloat) s"new float[$n]" else s"new double[$n]"
      s"""
         |int $n = $c.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $c.isNullAt($i) ? 0.0 : (double) $c.$get($i);
         |  $ss += $v * $v;
         |}
         |double $norm = java.lang.Math.sqrt($ss);
         |$arrJava $out = $newArr;
         |for (int $j = 0; $j < $n; $j++) {
         |  double $v = $c.isNullAt($j) ? 0.0 : (double) $c.$get($j);
         |  $out[$j] = $castOut($v / $norm);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "vector_normalize"
}

object VectorNormalize {
  def normalize(v: Column, outputFloat: Boolean): Column =
    ColumnBridge.column(VectorNormalize(ColumnBridge.expression(v), outputFloat))
}
