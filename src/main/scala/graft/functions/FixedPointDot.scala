package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact dot product of two BIGINT fixed-point vectors as a native Catalyst
  * expression with whole-stage codegen.
  *
  * This replaces `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, …)`, whose
  * higher-order-function lambdas evaluate interpreted per element and
  * allocate an intermediate array per row — on a 2M-pair × 64-dim
  * similarity join that interpretation cost dominates the whole query
  * (measured ~25 s → ~2 s at sf0.1). The generated code is a tight long
  * loop over the two `ArrayData` buffers: no allocation, no virtual calls.
  *
  * Null handling: null if either array is null (standard BinaryExpression
  * null-intolerance); elements are assumed non-null (they come from
  * `transform(embedding, …)` quantization).
  */
case class FixedPointDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "fixed_point_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FixedPointDot {
  /** Column-level entry point: `fixed_point_dot(a, b)`. */
  def apply(a: Column, b: Column): Column =
    GraftShims.column(
      FixedPointDot(GraftShims.expression(a), GraftShims.expression(b)))
}
