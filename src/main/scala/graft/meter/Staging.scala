package graft.meter

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The staging layer: cumulative counters → per-interval deltas via LAG,
  * exact reference semantics and column set
  * (`dbt_transform/models/staging/stg_meter_readings.sql:1-87`; SURVEY.md
  * §2.5 W1/W2, §7.4.1).
  *
  * Kept as a pure DataFrame → DataFrame function — the Spark analogue of the
  * reference's VIEW materialization (`dbt_project.yml:25-26`): nothing is
  * materialized, Catalyst sees through it, and the single window
  * shuffle+sort on (meter_id, reading_timestamp) is shared by both marts
  * when they build in one plan.
  *
  * Semantics traps replicated exactly (SURVEY.md §7.4.1):
  *  - first reading's delta = its cumulative value (`coalesce(cur−prev, cur)`,
  *    stg_meter_readings.sql:46-54)
  *  - a non-solar meter's production delta stays NULL in `production_kwh`
  *    but becomes 0 inside `net_consumption_kwh` (nested coalesce,
  *    stg_meter_readings.sql:68-74)
  */
object Staging {

  def stgMeterReadings(raw: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("meter_id")).orderBy(col("reading_timestamp"))
    val prevCons = lag(col("reading_consumption_milliwatts"), 1).over(w)
    val prevProd = lag(col("reading_production_milliwatts"), 1).over(w)
    val consDelta = coalesce(
      col("cumulative_consumption_mwh") - col("prev_cumulative_consumption_mwh"),
      col("cumulative_consumption_mwh"))
    val prodDelta = coalesce(
      col("cumulative_production_mwh") - col("prev_cumulative_production_mwh"),
      col("cumulative_production_mwh"))

    raw
      .select(
        col("reading_timestamp"),
        col("meter_id"),
        col("reading_consumption_milliwatts").as("cumulative_consumption_mwh"),
        col("reading_production_milliwatts").as("cumulative_production_mwh"),
        col("status"),
        prevCons.as("prev_cumulative_consumption_mwh"),
        prevProd.as("prev_cumulative_production_mwh"))
      .select(
        col("reading_timestamp"),
        col("meter_id"),
        col("cumulative_consumption_mwh"),
        col("cumulative_production_mwh"),
        col("status"),
        consDelta.as("consumption_delta_mwh"),
        prodDelta.as("production_delta_mwh"),
        (consDelta / 1000000.0).as("consumption_kwh"),
        (prodDelta / 1000000.0).as("production_kwh"),
        ((consDelta - coalesce(prodDelta, lit(0))) / 1000000.0).as("net_consumption_kwh"),
        (col("status") === "V").as("is_valid"),
        (col("status") === "E").as("is_estimated"),
        (col("status") === "R").as("is_error"),
        col("cumulative_production_mwh").isNotNull.as("has_solar"))
  }
}
