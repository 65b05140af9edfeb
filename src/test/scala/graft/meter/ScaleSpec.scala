package graft.meter

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Design-scale smoke (BASELINE.md: 1M meters): the generator + LAG staging
  * + billing mart pipeline at the reference's meter cardinality (4
  * intervals to keep test runtime bounded — the per-meter interval count
  * scales linearly and independently). Guards against overflow/cliff
  * regressions that sf0.01 correctness runs can't see. */
class ScaleSpec extends SparkSpec {

  test("1M meters flow through generation -> staging -> billing mart") {
    val nMeters = 1000000L
    val raw = MeterGen.readings(spark, nMeters, 4)
    val stg = Staging.stgMeterReadings(raw)
    val mart = Marts.factCustomerBillingDaily(
      stg, MeterGen.metersDim(spark, nMeters), MeterGen.customers(spark, nMeters),
      MeterGen.tariffRates(spark))
    // one row per customer-day; all meters present exactly once
    assert(mart.count() == nMeters)
    val agg = mart.agg(
      sum(col("total_reading_count")).as("readings"),
      min(col("total_consumption_kwh")).as("min_kwh"),
      max(col("data_quality_pct")).as("max_q")).head()
    assert(agg.getAs[Long]("readings") == nMeters * 4)
    assert(agg.getAs[Double]("min_kwh") > 0)
    assert(agg.getAs[Double]("max_q") <= 100.0)
  }
}
