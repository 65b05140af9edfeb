package graft.meter

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The two analytics marts, exact reference column sets
  * (`fact_customer_billing_daily.sql`, `fact_grid_load_hourly.sql`;
  * SURVEY.md §2.4 A1-A7, §2.3 J1-J3, §2.6 E10-E13).
  *
  * Scale-driven deviation from the reference (values unchanged): the
  * reference sums the per-interval kWh *doubles*; we sum the underlying
  * integer mWh deltas and convert once after aggregation. Integer sums are
  * exact and associative, so results are independent of partitioning /
  * shuffle order — mandatory for reproducibility on a 1000-executor
  * cluster, and bit-identical to the DuckDB oracle.
  *
  * Join strategy (SURVEY.md §4): the per-meter pre-aggregation shrinks the
  * fact before any join; dimension joins are broadcast (dims are ≤1M rows
  * ≈ tens of MB — beyond that Spark falls back to shuffled hash join via
  * AQE). The tariff is a real broadcast join against the 1-row
  * dim_tariff_rates instead of the reference's hard-coded 0.28 literal
  * (fact_customer_billing_daily.sql:90-96 — same value, proper lineage).
  */
object Marts {

  /** Daily customer billing (fact_customer_billing_daily.sql:12-120). */
  def factCustomerBillingDaily(
      stg: DataFrame, meters: DataFrame, customers: DataFrame,
      tariff: DataFrame): DataFrame = {
    val dailyMeter = stg
      .groupBy(
        to_date(date_trunc("day", col("reading_timestamp"))).as("billing_date"),
        col("meter_id"))
      .agg(
        sum(col("consumption_delta_mwh")).as("cons_mwh"),
        sum(col("production_delta_mwh")).as("prod_mwh"),
        sum(col("consumption_delta_mwh") - coalesce(col("production_delta_mwh"), lit(0)))
          .as("net_mwh"),
        count(lit(1)).as("reading_count"),
        sum(when(col("is_valid"), 1).otherwise(0)).as("valid_reading_count"),
        sum(when(col("is_estimated"), 1).otherwise(0)).as("estimated_reading_count"),
        sum(when(col("is_error"), 1).otherwise(0)).as("error_reading_count"),
        max(col("has_solar").cast("int")).cast("boolean").as("has_solar"))

    val perCustomer = dailyMeter
      .join(broadcast(meters.select(col("meter_id"), col("customer_id"))), Seq("meter_id"))
      .join(broadcast(customers.select(col("customer_id"), col("customer_name"))), Seq("customer_id"))
      .groupBy(col("billing_date"), col("customer_id"), col("customer_name"))
      .agg(
        (sum(col("cons_mwh")) / 1000000.0).as("total_consumption_kwh"),
        (sum(col("prod_mwh")) / 1000000.0).as("total_production_kwh"),
        (sum(col("net_mwh")) / 1000000.0).as("total_net_consumption_kwh"),
        countDistinct(col("meter_id")).as("meter_count"),
        sum(col("reading_count")).as("total_reading_count"),
        sum(col("valid_reading_count")).as("valid_reading_count"),
        sum(col("estimated_reading_count")).as("estimated_reading_count"),
        sum(col("error_reading_count")).as("error_reading_count"),
        max(col("has_solar").cast("int")).cast("boolean").as("has_solar"))

    val rate = col("base_rate_per_kwh").cast("double")
    perCustomer
      .join(broadcast(tariff.select(col("base_rate_per_kwh"))))
      .select(
        col("billing_date"), col("customer_id"), col("customer_name"),
        col("total_consumption_kwh"), col("total_production_kwh"),
        col("total_net_consumption_kwh"),
        (col("total_consumption_kwh") * rate).as("consumption_charge"),
        (col("total_production_kwh") * rate).as("production_credit"),
        (col("total_net_consumption_kwh") * rate).as("net_charge"),
        col("meter_count"), col("total_reading_count"), col("valid_reading_count"),
        col("estimated_reading_count"), col("error_reading_count"), col("has_solar"),
        when(col("total_reading_count") > 0,
          col("valid_reading_count").cast("double")
            / col("total_reading_count").cast("double") * 100)
          .otherwise(0.0).as("data_quality_pct"))
  }

  /** Hourly grid-zone load (fact_grid_load_hourly.sql:12-122). */
  def factGridLoadHourly(
      stg: DataFrame, meters: DataFrame, gridZones: DataFrame): DataFrame = {
    val hourlyMeter = stg
      .groupBy(date_trunc("hour", col("reading_timestamp")).as("load_hour"), col("meter_id"))
      .agg(
        sum(col("consumption_delta_mwh")).as("cons_mwh"),
        sum(col("production_delta_mwh")).as("prod_mwh"),
        sum(col("consumption_delta_mwh") - coalesce(col("production_delta_mwh"), lit(0)))
          .as("net_mwh"),
        count(lit(1)).as("reading_count"),
        sum(when(col("is_valid"), 1).otherwise(0)).as("valid_reading_count"))

    val perZone = hourlyMeter
      .join(broadcast(meters.select(col("meter_id"), col("grid_zone_id"))), Seq("meter_id"))
      .join(broadcast(gridZones.select(
        col("grid_zone_id"), col("zone_name"), col("zone_type"),
        col("max_capacity_megawatts"))), Seq("grid_zone_id"))
      .groupBy(col("load_hour"), col("grid_zone_id"), col("zone_name"),
        col("zone_type"), col("max_capacity_megawatts"))
      .agg(
        (sum(col("cons_mwh")) / 1000000.0).as("total_consumption_kwh"),
        (sum(col("prod_mwh")) / 1000000.0).as("total_production_kwh"),
        (sum(col("net_mwh")) / 1000000.0).as("total_net_consumption_kwh"),
        countDistinct(col("meter_id")).as("active_meter_count"),
        sum(col("reading_count")).as("total_reading_count"),
        sum(col("valid_reading_count")).as("valid_reading_count"))

    val netMwh = col("total_net_consumption_kwh") / 1000.0
    val util = netMwh / col("max_capacity_megawatts")
    perZone.select(
      col("load_hour"), col("grid_zone_id"), col("zone_name"), col("zone_type"),
      col("max_capacity_megawatts"),
      col("total_consumption_kwh"), col("total_production_kwh"),
      col("total_net_consumption_kwh"),
      netMwh.as("total_net_consumption_mwh"),
      when(col("max_capacity_megawatts") > 0, util * 100).otherwise(0.0)
        .as("capacity_utilization_pct"),
      (col("max_capacity_megawatts") > 0 && util > 0.8).as("is_peak_load"),
      (col("max_capacity_megawatts") > 0 && util > 0.95).as("is_critical_load"),
      col("active_meter_count"), col("total_reading_count"), col("valid_reading_count"),
      when(col("total_reading_count") > 0,
        col("valid_reading_count").cast("double")
          / col("total_reading_count").cast("double") * 100)
        .otherwise(0.0).as("data_quality_pct"))
  }

  /** Daily per-meter TIME-OF-USE billing: interval deltas priced by the
    * hour-of-day rate schedule ([[MeterGen.touRates]], broadcast — 24
    * rows at any corpus size), next to the flat 28¢ charge for
    * comparison. Charges accumulate as exact BIGINT mwh·cents and divide
    * once at the end, so the mart is bit-stable under any partitioning —
    * same doctrine as the flat-rate mart. */
  def factBillingTouDaily(stg: DataFrame, rates: DataFrame): DataFrame =
    stg
      .join(broadcast(rates), hour(col("reading_timestamp")) === col("hour_of_day"))
      .groupBy(to_date(col("reading_timestamp")).as("billing_date"), col("meter_id"))
      .agg(
        (sum(when(col("rate_c") === 35, col("consumption_delta_mwh")).otherwise(0L))
          / 1000000.0).as("peak_kwh"),
        (sum(when(col("rate_c") === 28, col("consumption_delta_mwh")).otherwise(0L))
          / 1000000.0).as("shoulder_kwh"),
        (sum(when(col("rate_c") === 18, col("consumption_delta_mwh")).otherwise(0L))
          / 1000000.0).as("offpeak_kwh"),
        (sum(col("consumption_delta_mwh") * col("rate_c")) / 100000000.0).as("tou_charge"),
        (sum(col("consumption_delta_mwh")) * 28 / 100000000.0).as("flat_charge"))
}
