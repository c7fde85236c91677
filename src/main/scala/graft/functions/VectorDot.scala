package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen dot product over two float/double array columns.
  *
  * This is the one genuinely custom physical kernel the engine needs
  * (SURVEY.md §7.3): the reference hand-rolls a SIMD-chunked f32 dot
  * product as its hot loop (/root/reference/src/lib.rs:321-344,
  * docs/src/design_choices.md:5-12). In Spark the equivalent of that
  * hand-tuning is staying inside whole-stage codegen: the higher-order
  * `aggregate(zip_with(...))` formulation is CodegenFallback (interpreted
  * per element, allocating a zipped array per row), while this expression
  * compiles to a tight primitive loop over the columnar ArrayData with a
  * double accumulator — JIT-vectorizable, zero allocation.
  *
  * Semantics match the HOF formulation exactly: sequential left-to-right
  * double accumulation (oracle-deterministic), length = min of the two
  * arrays (zip semantics). Null elements are treated as 0.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot expects ARRAY<FLOAT|DOUBLE> inputs, got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lDouble = elemType(left) == DoubleType
    val rDouble = elemType(right) == DoubleType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0 else if (lDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yi = if (y.isNullAt(i)) 0.0 else if (rDouble) y.getDouble(i) else y.getFloat(i).toDouble
      s += xi * yi
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == DoubleType) "getDouble" else "getFloat"
    val rGet = if (elemType(right) == DoubleType) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val lv = ctx.freshName("lv")
      val rv = ctx.freshName("rv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $lv = $a.isNullAt($i) ? 0.0 : (double) $a.$lGet($i);
         |  double $rv = $b.isNullAt($i) ? 0.0 : (double) $b.$rGet($i);
         |  $s += $lv * $rv;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}
