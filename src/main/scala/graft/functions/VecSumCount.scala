package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise sum of BIGINT vectors plus the row count, as ONE native
  * aggregate: returns `[n, s0, …, s(d−1)]` (array<bigint>, length d+1).
  *
  * This replaces the Lloyd-update shape `agg(count(*), sum(qv[0]), …,
  * sum(qv[63]))` — 65 separate aggregate expressions whose combined
  * field count pushes the generated aggregate past the codegen fast path
  * and pays 64 per-column buffer updates per row. Here the per-row work
  * is one tight `long[]` loop (the [[FixedPointDot]] doctrine applied to
  * the aggregation side); partial aggregation still happens map-side
  * (ObjectHashAggregate), and long addition is associative, so the sums
  * are bit-identical to the 64-column form under any partitioning or
  * merge order.
  *
  * The vector width is taken from the first non-null input; inputs of
  * mixed width would be a caller bug and throw loudly rather than
  * truncate silently.
  */
case class VecSumCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "vec_sum_count"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def children: Seq[Expression] = Seq(child)

  // empty sentinel until the first input fixes the width; slot 0 = count
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[ArrayData]
    val d = a.numElements()
    val b = if (buf.isEmpty) new Array[Long](d + 1) else buf
    require(b.length == d + 1,
      s"vec_sum_count: input width $d != buffer width ${b.length - 1}")
    b(0) += 1L
    var i = 0
    while (i < d) { b(i + 1) += a.getLong(i); i += 1 }
    b
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    require(buf.length == other.length,
      s"vec_sum_count: merging widths ${buf.length - 1} != ${other.length - 1}")
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(if (buf.isEmpty) Array(0L) else buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object VecSumCount {
  /** `[count, sum0, …, sum(d−1)]` of an array<bigint> column. */
  def apply(c: Column): Column =
    GraftShims.column(VecSumCount(GraftShims.expression(c)).toAggregateExpression())
}
