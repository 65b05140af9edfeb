package graft.functions

import graft.llm.TextHash
import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-document sketch expressions over a shingle-hash array — the
  * shuffle-free formulation of MinHash and SimHash.
  *
  * Architecture note (100 TB design): a document's sketch depends only on
  * its own shingle set, so it should be a narrow map-side expression, not
  * an aggregation. Computing `array<long>` shingle hashes per row
  * ([[TextHash.shingleHashArray]]) and sketching with these expressions
  * keeps the whole dedup pipeline exchange-free until the band-bucket /
  * candidate joins that are semantically unavoidable. The equivalent
  * explode→groupBy formulation shuffles |docs|·|shingles| rows first
  * (measured 5-11 s per sketch query at sf0.1 → ~1 s this way).
  *
  * The composed-builtin alternative, `transform` + `array_min` per hash
  * function, evaluates interpreted lambdas per element ×32 hash functions;
  * these expressions make one codegen'd pass per document.
  */
case class MinHashSigs(child: Expression) extends UnaryExpression {
  import TextHash.{NumHashes, P}

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashSigs.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.MinHashSigs.compute($c))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {
  import TextHash.{A, B, NumHashes, P}
  private val As = A.toArray
  private val Bs = B.toArray

  /** sig_j = min over hashes h of ((h mod P)·a_j + b_j) mod P — identical
    * to the per-hash-function aggregate form. */
  def compute(hs: ArrayData): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val hp = hs.getLong(i) % P
      var j = 0
      while (j < NumHashes) {
        val x = (hp * As(j) + Bs(j)) % P
        if (x < sig(j)) sig(j) = x
        j += 1
      }
      i += 1
    }
    sig
  }

  def apply(c: Column): Column =
    GraftShims.column(MinHashSigs(GraftShims.expression(c)))
}

/** 32-bit SimHash from a shingle-hash array: bit t set iff the ±1 votes of
  * the shingle hashes' bit t sum positive. Identical to the 32-column
  * `sum(case when ((h >> t) & 1) = 1 then 1 else -1 end)` aggregate form. */
case class SimHashBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(input: Any): Any =
    SimHashBits.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashBits.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashBits {
  def compute(hs: ArrayData): Long = {
    val votes = new Array[Int](32)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var t = 0
      while (t < 32) {
        if (((h >> t) & 1L) == 1L) votes(t) += 1 else votes(t) -= 1
        t += 1
      }
      i += 1
    }
    var sig = 0L
    var t = 0
    while (t < 32) { if (votes(t) > 0) sig |= (1L << t); t += 1 }
    sig
  }

  def apply(c: Column): Column =
    GraftShims.column(SimHashBits(GraftShims.expression(c)))
}
