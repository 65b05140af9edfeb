package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) physical layout: interleave the bits of two
  * scan dimensions so ONE sort key clusters the data in BOTH — file-level
  * min/max statistics then prune box predicates on either (or both)
  * dimensions, where a linear sort clusters only its leading column and a
  * trailing-dimension predicate touches every file.
  *
  * This is the multi-dimensional data-skipping layout production lakes
  * use (Delta OPTIMIZE ZORDER BY, Iceberg sort orders); here it is pure
  * Spark: the Morton code is a handful of codegen'd shift/mask built-ins
  * (no UDF), `repartitionByRange` on the code assigns contiguous curve
  * segments to files, and the writer never funnels data through one task.
  *
  * Scale note: the curve key is computed map-side; the only exchange is
  * the range shuffle any clustered rewrite needs. Works on any pair of
  * dimensions reducible to bounded non-negative ints (bucketize first —
  * the caller owns the value→bucket mapping and its domain bounds).
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions (0b1011 →
    * 0b1000101): the standard mask-and-shift bit-interleave, all
    * whole-stage-codegen'd long arithmetic. */
  private def spread16(c: Column): Column = {
    val m = c.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit non-negative dimensions. */
  def morton2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Rewrite `df` into `nFiles` files clustered along the Z-curve of
    * (dimA, dimB). Both dims must already be bucketized to [0, 65536). */
  def writeZOrdered(
      df: DataFrame, dir: String, dimA: Column, dimB: Column,
      nFiles: Int): Unit =
    df.withColumn("__z", morton2(dimA, dimB))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
}
