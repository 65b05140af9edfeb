package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import java.security.MessageDigest

/** The 60-bit md5-prefix hash (`CAST('0x' || substr(md5(s),1,15) AS BIGINT)`)
  * computed directly from digest bytes — no hex-string materialization.
  *
  * The composed form `conv(substring(md5(s),1,15),16,10)` allocates three
  * intermediate strings per row (hex, substring, decimal) and parses the
  * decimal back to long; on shingle tables (~300 hashes/document) that
  * string churn is the dominant cost of every sketch operator. Here:
  * digest → big-endian first 8 bytes → logical shift right 4 = the same
  * first-15-hex-chars value, allocation-free (thread-local digest reuse).
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_prefix64"

  override def nullSafeEval(input: Any): Any =
    Md5Prefix64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix64 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s), big-endian — equals the first 15 hex chars
    * of the canonical digest string read as a base-16 number. */
  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val hi =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> 4
  }

  def apply(c: Column): Column =
    GraftShims.column(Md5Prefix64(GraftShims.expression(c)))
}
