package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One harness-facing query: a Spark implementation over the driver corpus at
  * `dir` (= /root/testdata/sfX) plus, when SQL-expressible, an equivalent
  * ANSI SQL text the driver runs in DuckDB over the same parquet tables.
  *
  * Contract (see SURVEY.md §5, builder prompt): column names must match
  * between `run`'s result and the oracle's result — the driver sorts columns
  * by name and hashes values.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object GraftQuery {
  /** Registry helper: modules expose `def all: Seq[GraftQuery]`. */
  def q(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, Some(oracle))

  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  def qNoOracle(name: String)(run: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, run, None)
}
