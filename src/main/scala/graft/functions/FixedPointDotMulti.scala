package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Dot products of one BIGINT fixed-point vector against a whole array of
  * vectors (the trained IVF centroids), in ONE codegen'd pass:
  * `fixed_point_dot_multi(qv, cqvs)[c] == fixed_point_dot(qv, cqvs[c])`.
  *
  * This replaces the crossJoin-explode shape of centroid assignment —
  * 8 joined rows per vector, each evaluating its own [[FixedPointDot]] and
  * then a vec_id-keyed aggregate/window to pick the winner, i.e. a SHUFFLE
  * of 8× the corpus with the 64-wide qv payload per Lloyd step. With all
  * per-centroid dots in one row, nearest-cell selection becomes map-side
  * array arithmetic over k=8 scalars and the assignment stage has no
  * exchange at all. The centroid-array side arrives via a broadcast
  * one-row crossJoin, so at 100 TB this is exactly the "broadcast the
  * codebook, assign map-side" IVF shape.
  */
case class FixedPointDotMulti(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "fixed_point_dot_multi"

  override def nullSafeEval(a: Any, b: Any): Any =
    FixedPointDotMulti.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.FixedPointDotMulti.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FixedPointDotMulti {

  def compute(qv: ArrayData, cents: ArrayData): GenericArrayData = {
    val dim = qv.numElements()
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) { q(i) = qv.getLong(i); i += 1 }
    val k = cents.numElements()
    val out = new Array[Long](k)
    var c = 0
    while (c < k) {
      val w = cents.getArray(c)
      val n = math.min(dim, w.numElements())
      var s = 0L
      var j = 0
      while (j < n) { s += q(j) * w.getLong(j); j += 1 }
      out(c) = s
      c += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point. */
  def apply(qv: Column, cents: Column): Column =
    GraftShims.column(
      FixedPointDotMulti(GraftShims.expression(qv), GraftShims.expression(cents)))
}
