package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native winnowing selector (r15, guide §1.2-2): the distinct
  * (window-min, first-min-position) fingerprints of a rolling-hash array
  * under a width-`w` sliding window — Schleimer/Wilkerson/Aiken winnowing
  * with the robust first-occurrence tie rule.
  *
  * Replaces the interpreted HOF chain
  * `array_distinct(transform(sequence(1, n-w+1), j -> struct(
  *    array_min(slice(ha, j, w)),
  *    j - 1 + array_position(slice(ha, j, w), array_min(slice(ha, j, w))))))`
  * which allocated three w-element slices and ran two interpreted scans
  * PER WINDOW — O(n·w) with boxing; profiled as 48 process-cpu seconds of
  * `text_winnow_fingerprints`' 1.8 s wall at sf0.1 (cpu/wall 27). This
  * kernel is one monotonic-deque pass, O(n) per document.
  *
  * Value-identity argument (oracle-hash-checked end to end): the deque
  * pops strictly-greater values only, so among equal minima the EARLIEST
  * index stays in front — exactly `array_position`'s first-occurrence
  * rule; and the first-min position is non-decreasing as the window
  * slides (a new min enters at the right end; a lost min hands off to a
  * later position), so each distinct (min, pos) pair's occurrence run is
  * contiguous and emit-on-change equals `array_distinct`. `pos` is the
  * 1-based hash-array position, the same `j - 1 + array_position(...)`
  * arithmetic.
  */
case class WinnowFingerprints(ha: Expression, window: Int)
  extends UnaryExpression {

  require(window >= 1, s"winnow window must be >= 1: $window")

  override def child: Expression = ha
  override def prettyName: String = "winnow_fingerprints"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp_hash", LongType, nullable = false),
      StructField("pos", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(h: Any): Any =
    WinnowFingerprints.compute(h.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($h, $window);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(ha = newChild)
}

object WinnowFingerprints {
  def compute(ha: ArrayData, w: Int): GenericArrayData = {
    val n = ha.numElements()
    val m = n - (w - 1) // windows
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    val idx = new Array[Int](n) // monotonic deque of indices (values ascending)
    var head = 0
    var tail = 0
    val out = new java.util.ArrayList[Any](m)
    var lastG = -1
    var i = 0
    while (i < n) {
      val v = ha.getLong(i)
      // strict pop keeps the EARLIEST index among equal minima in front
      while (tail > head && ha.getLong(idx(tail - 1)) > v) tail -= 1
      idx(tail) = i
      tail += 1
      // evict indices left of the window [i-w+1, i]
      if (idx(head) < i - w + 1) head += 1
      if (i >= w - 1) {
        val g = idx(head)
        if (g != lastG) {
          out.add(new GenericInternalRow(
            Array[Any](ha.getLong(g), (g + 1).toLong)))
          lastG = g
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def apply(ha: Column, window: Int): Column =
    GraftShims.column(WinnowFingerprints(GraftShims.expression(ha), window))
}
