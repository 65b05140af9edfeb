package graft.functions

import graft.llm.TextHash
import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import java.security.MessageDigest

/** The distinct [[TextHash.ShingleLen]]-char shingle-hash set of a text, in
  * ONE codegen'd pass — value-identical (incl. first-occurrence order) to
  * the composed form
  * `array_distinct(transform(sequence(1, greatest(len-13,1)),
  * i -> md5_prefix64(substring(text, i, 14))))`.
  *
  * Why it exists: higher-order functions (`transform`) evaluate their
  * lambda INTERPRETED per element — on ~300-shingle documents that's the
  * hot path of every dedup/fingerprint/decontamination query. This
  * expression slides one window over the text's code-point boundaries,
  * hashes each window's UTF-8 bytes straight into the digest (no substring
  * materialization), and dedups into the output array as it goes.
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val nChars = s.numChars()
    // code-point start offsets (substring counts characters, not bytes)
    val offsets = new Array[Int](nChars + 1)
    var i = 0
    var off = 0
    while (i < nChars) {
      offsets(i) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      i += 1
    }
    offsets(nChars) = bytes.length
    val L = TextHash.ShingleLen
    // greatest(len - (L-1), 1): texts shorter than one shingle yield one
    // (short) shingle — the whole text
    val count = math.max(nChars - L + 1, 1)
    val md = digests.get()
    // first-occurrence-order dedup, exactly array_distinct's semantics
    val seen = new java.util.LinkedHashSet[java.lang.Long](count * 2)
    var k = 0
    while (k < count) {
      val from = if (k <= nChars) offsets(math.min(k, nChars)) else bytes.length
      val to = if (k + L <= nChars) offsets(k + L) else bytes.length
      md.reset()
      md.update(bytes, from, to - from)
      val d = md.digest()
      val hi =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
          ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      seen.add(hi >>> 4)
      k += 1
    }
    val out = new Array[Long](seen.size)
    var j = 0
    val it = seen.iterator()
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column =
    GraftShims.column(ShingleHashes(GraftShims.expression(c)))
}
