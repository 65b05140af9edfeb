package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ catalyst-Expression converters —
  * the standard extension-library shim (public Spark extension projects use
  * the same package-placement technique, e.g. Qbeast's DatasetFactory).
  * Spark 4 removed the public `new Column(expr)` constructor; this restores
  * that capability for graft's custom expressions.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (possibly custom) logical plan — `Dataset.ofRows` is
    * private[sql] in Spark 4. */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
