package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** All hyperplane sign bits of a quantized embedding in ONE codegen'd pass:
  * bit p of the result is `dot(qv, plane_p) > 0` over the first `nPlanes`
  * deterministic planes ([[PlaneSignMask.planes24]]).
  *
  * This fuses what used to be `nPlanes` separate [[FixedPointDot]]
  * evaluations per row (24 for the banded embedding dedup, 8 for the ANN
  * bucket): each was individually codegen'd but re-read the 64-wide
  * ArrayData — with its per-element bounds-checked accessors — once per
  * plane, and dominated the dedup_embedding_lsh/ivf profile. Here the
  * vector is copied to a primitive `long[]` once and the planes live in a
  * static `long[][]`, so the 24×64 multiply-adds run as one tight loop
  * nest. Downstream band keys / bucket ids are cheap bit arithmetic on the
  * returned mask (`(mask >> 3t) & 7`, `mask & 0xff`), bit-identical to the
  * per-plane CASE sums they replace.
  */
case class PlaneSignMask(child: Expression, nPlanes: Int) extends UnaryExpression {

  require(nPlanes > 0 && nPlanes <= PlaneSignMask.MaxPlanes)

  override def dataType: DataType = LongType
  override def prettyName: String = "plane_sign_mask"

  override def nullSafeEval(input: Any): Any =
    PlaneSignMask.compute(input.asInstanceOf[ArrayData], nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PlaneSignMask.compute($c, $nPlanes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PlaneSignMask {

  val Dim = 64
  val MaxPlanes = 24

  /** Deterministic hyperplanes (dim [[Dim]], integer weights in
    * [-500, 500)), same Knuth-hash uniform as `graft.meter.MeterGen.u` —
    * literal-embedded into the oracle SQL by the Similarity queries. The
    * first 8 are the ANN-bucket planes; all 24 serve the banded dedup. */
  private def u(x: Long): Double =
    (x % 2147483648L) * 2654435761L % 2147483648L / 2147483648.0

  private def mkPlanes(n: Int): Seq[IndexedSeq[Long]] =
    (0 until n).map(p => (0 until Dim).map(i => Math.round((u(p * 101L + i * 7L + 13L) - 0.5) * 1000)))

  lazy val planes8: Seq[IndexedSeq[Long]] = planes24.take(8)
  lazy val planes24: Seq[IndexedSeq[Long]] = mkPlanes(MaxPlanes)

  private lazy val PLANES: Array[Array[Long]] = planes24.map(_.toArray).toArray

  def compute(qv: ArrayData, nPlanes: Int): Long = {
    val planes = PLANES
    val dim = math.min(qv.numElements(), Dim)
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) { q(i) = qv.getLong(i); i += 1 }
    var mask = 0L
    var p = 0
    while (p < nPlanes) {
      val w = planes(p)
      var s = 0L
      var j = 0
      while (j < dim) { s += q(j) * w(j); j += 1 }
      if (s > 0) mask |= 1L << p
      p += 1
    }
    mask
  }

  /** Column-level entry point. */
  def apply(qv: Column, nPlanes: Int): Column =
    GraftShims.column(PlaneSignMask(GraftShims.expression(qv), nPlanes))
}
