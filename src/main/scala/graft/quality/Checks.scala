package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the reference's dbt test surface
  * (`models/staging/sources.yml`: not_null, unique, accepted_values;
  * CHECK-constraint parity from `01_create_schema.sql:84-93`; FK orphan
  * checks) as runtime library operators (SURVEY.md §5).
  *
  * Every check returns a one-row DataFrame (check_name, col_name,
  * violations, total) and stays fully distributed — a suite is a `union` of checks,
  * evaluated in one job. Nothing collects on the driver; at 100 TB each
  * check is a scan-light aggregate (conditional count or two-level
  * distinct), and suites over the same table share the scan through
  * Catalyst's common-subexpression reuse when unioned.
  */
object Checks {

  private def result(check: String, column: String, df: DataFrame,
      violation: Column): DataFrame =
    df.agg(
      count(lit(1)).as("total"),
      sum(when(violation, 1L).otherwise(0L)).as("violations"))
      .select(lit(check).as("check_name"), lit(column).as("col_name"),
        coalesce(col("violations"), lit(0L)).as("violations"), col("total"))

  /** dbt `not_null` (sources.yml:14-19). */
  def notNull(df: DataFrame, column: String): DataFrame =
    result("not_null", column, df, col(column).isNull)

  /** dbt `accepted_values` (sources.yml:26-28). */
  def acceptedValues(df: DataFrame, column: String, values: Seq[String]): DataFrame =
    result("accepted_values", column, df, !col(column).isin(values: _*))

  /** CHECK (col >= 0) parity (01_create_schema.sql:84-85); NULLs pass. */
  def nonNegative(df: DataFrame, column: String): DataFrame =
    result("non_negative", column, df, col(column) < 0)

  /** at-least-one-of CHECK (01_create_schema.sql:90-93). */
  def atLeastOnePresent(df: DataFrame, columns: Seq[String]): DataFrame =
    result("at_least_one_present", columns.mkString("|"), df,
      columns.map(col(_).isNull).reduce(_ && _))

  /** dbt `unique` (sources.yml:37-39): rows beyond the first per key. */
  def unique(df: DataFrame, columns: Seq[String]): DataFrame = {
    val keyCols = columns.map(col)
    df.groupBy(keyCols: _*).agg(count(lit(1)).as("n"))
      .agg(
        coalesce(sum(col("n") - 1), lit(0L)).as("violations"),
        coalesce(sum(col("n")), lit(0L)).as("total"))
      .select(lit("unique").as("check_name"), lit(columns.mkString("|")).as("col_name"),
        col("violations"), col("total"))
  }

  /** FK orphan check via left-anti join (SURVEY.md §2.3 J4). */
  def referentialIntegrity(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.join(parent, child(childKey) === parent(parentKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val total = child.agg(count(lit(1)).as("total"))
    orphans.crossJoin(total)
      .select(lit("referential_integrity").as("check_name"),
        lit(s"$childKey->$parentKey").as("col_name"),
        col("violations"), col("total"))
  }

  /** A suite = one unioned DataFrame of check rows. */
  def suite(checks: Seq[DataFrame]): DataFrame = checks.reduce(_ union _)
}
