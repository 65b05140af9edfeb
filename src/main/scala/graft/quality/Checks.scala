package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the reference's dbt test surface
  * (`models/staging/sources.yml`: not_null, unique, accepted_values;
  * CHECK-constraint parity from `01_create_schema.sql:84-93`; FK orphan
  * checks) as runtime library operators (SURVEY.md §5).
  *
  * Every check produces rows of (check_name, col_name, violations, total)
  * and stays fully distributed — nothing collects on the driver.
  *
  * Scale design: all conditional-count checks over the SAME table compile
  * into ONE aggregate via [[singlePass]] — a 6-check suite on a 100 TB
  * table costs one scan, not six (Spark does not dedupe scans across union
  * branches, so the naive per-check union re-reads the table per check).
  * Only `unique` (needs a groupBy) and `referentialIntegrity` (needs an
  * anti-join) keep their own plan shapes.
  */
object Checks {

  /** A conditional-count check: dbt-style name, subject column(s), and the
    * row-level violation predicate. Checks of this shape are fused by
    * [[singlePass]] into one aggregate over the table. */
  final case class AggCheck(checkName: String, colName: String, violation: Column)

  /** dbt `not_null` (sources.yml:14-19). */
  def notNullCheck(column: String): AggCheck =
    AggCheck("not_null", column, col(column).isNull)

  /** dbt `accepted_values` (sources.yml:26-28; 01_create_schema.sql:86). */
  def acceptedValuesCheck(column: String, values: Seq[String]): AggCheck =
    AggCheck("accepted_values", column, !col(column).isin(values: _*))

  /** CHECK (col >= 0) parity (01_create_schema.sql:84-85); NULLs pass. */
  def nonNegativeCheck(column: String): AggCheck =
    AggCheck("non_negative", column, col(column) < 0)

  /** at-least-one-of CHECK (01_create_schema.sql:90-93). */
  def atLeastOnePresentCheck(columns: Seq[String]): AggCheck =
    AggCheck("at_least_one_present", columns.mkString("|"),
      columns.map(col(_).isNull).reduce(_ && _))

  /** Fuse conditional-count checks over one table into a single aggregate
    * pass (one scan), then unpivot the wide result to the
    * (check_name, col_name, violations, total) suite shape. */
  def singlePass(df: DataFrame, checks: Seq[AggCheck]): DataFrame = {
    require(checks.nonEmpty, "singlePass needs at least one check")
    val aggs = count(lit(1)).as("total") +: checks.zipWithIndex.map { case (c, i) =>
      sum(when(c.violation, 1L).otherwise(0L)).as(s"v$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.checkName).as("check_name"), lit(c.colName).as("col_name"),
        coalesce(col(s"v$i"), lit(0L)).as("violations"))
    }
    wide.select(explode(array(rows: _*)).as("r"), col("total"))
      .select(col("r.check_name").as("check_name"), col("r.col_name").as("col_name"),
        col("r.violations").as("violations"), col("total"))
  }

  // single-check conveniences (each is a 1-element fused pass)
  def notNull(df: DataFrame, column: String): DataFrame =
    singlePass(df, Seq(notNullCheck(column)))
  def acceptedValues(df: DataFrame, column: String, values: Seq[String]): DataFrame =
    singlePass(df, Seq(acceptedValuesCheck(column, values)))
  def nonNegative(df: DataFrame, column: String): DataFrame =
    singlePass(df, Seq(nonNegativeCheck(column)))
  def atLeastOnePresent(df: DataFrame, columns: Seq[String]): DataFrame =
    singlePass(df, Seq(atLeastOnePresentCheck(columns)))

  /** dbt `unique` (sources.yml:37-39): rows beyond the first per key.
    * Needs its own groupBy shape — not fusable into [[singlePass]]. */
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
    orphans.crossJoin(org.apache.spark.sql.functions.broadcast(total))
      .select(lit("referential_integrity").as("check_name"),
        lit(s"$childKey->$parentKey").as("col_name"),
        col("violations"), col("total"))
  }

  /** A suite = one unioned DataFrame of check rows. Fuse same-table
    * conditional checks with [[singlePass]] BEFORE unioning — each union
    * branch is a separate scan of its input. */
  def suite(checks: Seq[DataFrame]): DataFrame = checks.reduce(_ union _)
}
