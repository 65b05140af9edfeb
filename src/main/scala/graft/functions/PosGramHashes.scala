package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import java.security.MessageDigest

/** All positional `n`-gram hashes of a word array in ONE pass:
  * element `p` (0-based) = `md5_prefix64(array_join(slice(ws, p+1, n), ' '))`
  * — value-identical to the composed per-position form the span-dedup
  * operators used, which re-evaluated `slice` + `array_join` (two array/
  * string materializations) per exploded position row (r15, guide §1.2-2).
  * Here each word's UTF-8 bytes are extracted once and streamed into the
  * digest with the 0x20 separator — the md5 itself (the oracle-shared
  * contract) is the only remaining per-gram cost.
  *
  * Texts with fewer than `n` words yield an empty array (callers filter
  * `size(ws) >= n` first, matching the former explode bounds).
  */
case class PosGramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "PosGramHashes needs n >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pos_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    PosGramHashes.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PosGramHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PosGramHashes {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(ws: ArrayData, n: Int): GenericArrayData = {
    val len = ws.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val wb = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) { wb(i) = ws.getUTF8String(i).getBytes; i += 1 }
    val md = digests.get()
    val out = new Array[Long](len - n + 1)
    var p = 0
    while (p <= len - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(wb(p + j))
        j += 1
      }
      val d = md.digest()
      val hi =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
          ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      out(p) = hi >>> 4
      p += 1
    }
    new GenericArrayData(out)
  }

  def apply(words: Column, n: Int): Column =
    GraftShims.column(PosGramHashes(GraftShims.expression(words), n))
}
