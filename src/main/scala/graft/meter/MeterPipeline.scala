package graft.meter

import graft.GraftQuery
import graft.GraftQuery.q

/** Harness registration of the full smart-meter pipeline — generators,
  * staging, marts — every stage DuckDB-oracle-checked end-to-end
  * (SURVEY.md §7.2: this is the "minimum end-to-end slice" and then some).
  *
  * Sizes are fixed (not scaled by sfDir) because the pipeline generates its
  * own data deterministically; the driver corpus tables are not inputs here.
  */
object MeterPipeline {

  private val NMeters = 200L
  private val NIntervals = 192L // 2 days on the 15-min grid (day-boundary coverage)
  private val NDim = 1000L

  val all: Seq[GraftQuery] = Seq(
    q("meter_gen_zones", s"WITH ${MeterSql.zonesCte} SELECT * FROM zones") {
      (s, _) => MeterGen.gridZones(s)
    },

    q("meter_gen_customers",
      s"WITH ${MeterSql.customersCte(NDim)} SELECT * FROM customers") {
      (s, _) => MeterGen.customers(s, NDim)
    },

    q("meter_gen_meters",
      s"WITH ${MeterSql.metersCte(NDim)} SELECT * FROM meters") {
      (s, _) => MeterGen.metersDim(s, NDim)
    },

    q("meter_gen_readings",
      s"WITH ${MeterSql.readingsCtes(NMeters, NIntervals)} SELECT * FROM readings") {
      (s, _) => MeterGen.readings(s, NMeters, NIntervals)
    },

    q("meter_stg_readings",
      s"WITH ${MeterSql.stagingCtes(NMeters, NIntervals)} SELECT * FROM stg") {
      (s, _) => Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervals))
    },

    q("meter_billing_daily", MeterSql.billingSql(NMeters, NIntervals)) { (s, _) =>
      Marts.factCustomerBillingDaily(
        Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervals)),
        MeterGen.metersDim(s, NMeters),
        MeterGen.customers(s, NMeters),
        MeterGen.tariffRates(s))
    },

    // the typed Dataset/Aggregator twin shares the untyped mart's oracle:
    // one SQL text, two independent Spark formulations, both bit-exact
    q("meter_billing_daily_typed", MeterSql.billingSql(NMeters, NIntervals)) { (s, _) =>
      TypedMarts.factCustomerBillingDailyTyped(
        Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervals)),
        MeterGen.metersDim(s, NMeters),
        MeterGen.customers(s, NMeters),
        MeterGen.tariffRates(s))
    },

    // time-of-use twin of the billing mart: rates join in as a broadcast
    // 24-row schedule table instead of a constant — see Marts.factBillingTouDaily
    q("meter_billing_tou", MeterSql.billingTouSql(NMeters, NIntervals)) { (s, _) =>
      Marts.factBillingTouDaily(
        Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervals)),
        MeterGen.touRates(s))
    },

    q("meter_grid_hourly", MeterSql.gridSql(NMeters, NIntervals)) { (s, _) =>
      Marts.factGridLoadHourly(
        Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervals)),
        MeterGen.metersDim(s, NMeters),
        MeterGen.gridZones(s))
    }
  )
}
