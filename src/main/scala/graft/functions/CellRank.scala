package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native replacements for the interpreted higher-order-function chains on
  * the codebook-ranking hot path (r15, guide §1.2-2).
  *
  * `assignRankedPacked` ranked its k cells with
  * `array_sort(zip_with(zip_with(dots, cnorms, cosine), cids, struct))` and
  * `pqAssign` picked its sub-code with the same chain over (cnorm − 2·dot):
  * higher-order functions evaluate their lambdas INTERPRETED per element
  * with boxing, and `array_sort`'s comparator is itself an interpreted
  * expression tree — profiled at ~0.5-1 ms per row on k=32..45 codebooks,
  * which made the ASSIGNMENT (not the dot products) the dominant CPU of
  * every Lloyd iteration, PQ training pass, encode pass, and probe ranking.
  *
  * Both expressions replicate the replaced chains' arithmetic exactly:
  * cosine = (double)dot / (sqrt((double)norm2) * sqrt((double)cnorm)) in
  * that operation order (same doubles bit-for-bit), rank order = ascending
  * (nc, id) with java.lang.Double.compare semantics — precisely Spark's
  * array_sort ordering on struct<double,long> (NaN greatest, -0.0 < 0.0) —
  * and the argmin = ascending (score, id) minimum. Oracle hashes prove the
  * equivalence query by query.
  */

/** `array<struct<nc: double, id: long>>` of a query's cells, ascending by
  * (nc = −cosine, id): element 0 is the assignment, `slice(…, 1, p)` the
  * multi-probe cells. */
case class CosRankCells(
    dots: Expression, cnorms: Expression, cids: Expression, norm2: Expression)
  extends QuaternaryExpression {

  override def first: Expression = dots
  override def second: Expression = cnorms
  override def third: Expression = cids
  override def fourth: Expression = norm2

  override def prettyName: String = "cos_rank_cells"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("nc", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(d: Any, cn: Any, ci: Any, n2: Any): Any =
    CosRankCells.compute(
      d.asInstanceOf[ArrayData], cn.asInstanceOf[ArrayData],
      ci.asInstanceOf[ArrayData], n2.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, cn, ci, n2) =>
      s"${ev.value} = graft.functions.CosRankCells.compute($d, $cn, $ci, $n2);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(dots = newFirst, cnorms = newSecond, cids = newThird, norm2 = newFourth)
}

object CosRankCells {
  def compute(dots: ArrayData, cnorms: ArrayData, cids: ArrayData,
      norm2: Long): GenericArrayData = {
    val k = dots.numElements()
    val sqn = java.lang.Math.sqrt(norm2.toDouble)
    val nc = new Array[Double](k)
    val id = new Array[Long](k)
    val ord = new Array[Integer](k)
    var i = 0
    while (i < k) {
      // exact operation order of the replaced lambda:
      // -(dd / (sqrt(norm2) * sqrt(cn)))
      nc(i) = -(dots.getLong(i).toDouble /
        (sqn * java.lang.Math.sqrt(cnorms.getLong(i).toDouble)))
      id(i) = cids.getLong(i)
      ord(i) = Integer.valueOf(i)
      i += 1
    }
    java.util.Arrays.sort(ord, (a: Integer, b: Integer) => {
      val c = java.lang.Double.compare(nc(a), nc(b))
      if (c != 0) c else java.lang.Long.compare(id(a), id(b))
    })
    val out = new Array[Any](k)
    i = 0
    while (i < k) {
      out(i) = new GenericInternalRow(Array[Any](nc(ord(i)), id(ord(i))))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(dots: Column, cnorms: Column, cids: Column, norm2: Column): Column =
    GraftShims.column(CosRankCells(
      GraftShims.expression(dots), GraftShims.expression(cnorms),
      GraftShims.expression(cids), GraftShims.expression(norm2)))
}

/** `struct<sc: long, id: long>` — the minimum of (sc = cnorm − 2·dot, id):
  * the PQ sub-quantizer assignment under the monotone L2 surrogate, ties
  * to the smallest c_id. */
case class ArgMinScoreId(dots: Expression, cnorms: Expression, cids: Expression)
  extends TernaryExpression {

  override def first: Expression = dots
  override def second: Expression = cnorms
  override def third: Expression = cids

  override def prettyName: String = "argmin_score_id"
  override def dataType: DataType = StructType(Seq(
    StructField("sc", LongType, nullable = false),
    StructField("id", LongType, nullable = false)))

  override protected def nullSafeEval(d: Any, cn: Any, ci: Any): Any =
    ArgMinScoreId.compute(
      d.asInstanceOf[ArrayData], cn.asInstanceOf[ArrayData], ci.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, cn, ci) =>
      s"${ev.value} = graft.functions.ArgMinScoreId.compute($d, $cn, $ci);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(dots = newFirst, cnorms = newSecond, cids = newThird)
}

object ArgMinScoreId {
  def compute(dots: ArrayData, cnorms: ArrayData, cids: ArrayData): InternalRow = {
    val k = dots.numElements()
    var bestSc = Long.MaxValue
    var bestId = Long.MaxValue
    var i = 0
    while (i < k) {
      val sc = cnorms.getLong(i) - 2L * dots.getLong(i)
      val id = cids.getLong(i)
      if (sc < bestSc || (sc == bestSc && id < bestId)) { bestSc = sc; bestId = id }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestSc, bestId))
  }

  def apply(dots: Column, cnorms: Column, cids: Column): Column =
    GraftShims.column(ArgMinScoreId(
      GraftShims.expression(dots), GraftShims.expression(cnorms),
      GraftShims.expression(cids)))
}
