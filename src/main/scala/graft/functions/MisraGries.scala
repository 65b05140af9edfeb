package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra–Gries heavy-hitters sketch as a native `TypedImperativeAggregate`:
  * at most `k − 1` (key, count) counters per partial buffer, merged with the
  * Agarwal et al. (Mergeable Summaries, PODS 2012) offset rule. Returns the
  * surviving candidate keys, sorted.
  *
  * Guarantee (the reason this is safe at 100 TB): every key whose true
  * frequency exceeds n/k is present in the output, regardless of
  * partitioning, merge order, or data order — eviction subtracts the same
  * amount from every counter, and a key with count > n/k can never be
  * driven to zero by at most n/k total subtraction. The output may contain
  * false positives; callers that need exactness re-count ONLY the ≤ k−1
  * candidates in a second pass (see `text_heavy_hitters`), which turns an
  * unbounded-vocabulary aggregation into a fixed-size-state sketch plus a
  * broadcast-filtered exact count.
  *
  * State is O(k) per partial aggregate, independent of cardinality — the
  * property an exact groupBy over a hot high-cardinality column lacks.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 2, "MisraGries needs k >= 2")

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy out of Spark's reused row buffer before storing
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k - 1 => buf.update(key, 1L)
        case None =>
          // full and unseen: decrement every counter (amortized O(1) —
          // each eviction round burns k previously-charged increments)
          val dead = List.newBuilder[String]
          buf.foreach { case (ky, c) =>
            if (c == 1L) dead += ky else buf.update(ky, c - 1)
          }
          dead.result().foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (ky, c) => buf.update(ky, buf.getOrElse(ky, 0L) + c) }
    if (buf.size > k - 1) {
      // keep the k−1 largest after subtracting the k-th largest count from
      // every counter — the mergeable-summaries rule; errors add, keeping
      // total undercount ≤ n/k across any merge tree
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - k + 1) // k-th largest (1-indexed)
      val dead = List.newBuilder[String]
      buf.foreach { case (ky, c) =>
        if (c <= sub) dead += ky else buf.update(ky, c - sub)
      }
      dead.result().foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted.map(UTF8String.fromString(_)): Array[Any])

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (ky, c) => out.writeUTF(ky); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGries {
  /** Candidate heavy hitters of `c` with sketch width `k` (array<string>,
    * sorted): complete for every key with frequency > n/k. */
  def apply(c: Column, k: Int): Column =
    GraftShims.column(MisraGries(GraftShims.expression(c), k).toAggregateExpression())
}
