package graft.meter

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Reference-contract tests: the dbt data tests ported to assertions
  * (SURVEY.md §5, models/staging/sources.yml), CHECK-constraint parity
  * (01_create_schema.sql:84-93), and the hand-computed staging/mart golden
  * fixture (FIXTURES.md §A4).
  */
class MeterDomainSpec extends SparkSpec {
  import spark.implicits._

  private lazy val readings = MeterGen.readings(spark, 20, 96).cache()
  private lazy val stg = Staging.stgMeterReadings(readings)

  test("integer division semantics: Spark div TRUNCATES toward zero on negatives (= DuckDB //)") {
    // Pins the cross-engine claim every kilo-scaled oracle twin rests on
    // (meter_zone_profile_corr, meter_weather_normalize, peak ppm shares):
    // DuckDB's integer `//` truncates toward zero (-7 // 2 = -3, verified
    // against DuckDB 1.0.0 in the r8 advisory), and Spark's `div` must
    // match on ALL integers — a floor-division formulation would differ
    // by 1 on every negative numerator. pmod stays nonneg by contrast.
    val r = spark.sql(
      """SELECT -7L div 2L AS a, 7L div -2L AS b, -7L div -2L AS c,
        |  7L div 2L AS d, pmod(-7L, 2L) AS p, -1L div 1000L AS k""".stripMargin).head()
    assert(r.getAs[Long]("a") == -3L) // truncation; floor would be -4
    assert(r.getAs[Long]("b") == -3L)
    assert(r.getAs[Long]("c") == 3L)
    assert(r.getAs[Long]("d") == 3L)
    assert(r.getAs[Long]("p") == 1L) // pmod is the nonneg remainder
    assert(r.getAs[Long]("k") == 0L) // kilo-scaling: -1 div 1000 = 0, not -1
  }

  test("dims: row counts, PK uniqueness, accepted values (dbt test parity)") {
    val zones = MeterGen.gridZones(spark)
    assert(zones.count() == 20)
    assert(zones.select("grid_zone_id").distinct().count() == 20)
    assert(zones.filter(!col("zone_type").isin("urban", "suburban", "rural")).count() == 0)

    val cust = MeterGen.customers(spark, 1000)
    assert(cust.count() == 1000)
    assert(cust.select("customer_id").distinct().count() == 1000)
    assert(cust.filter(!col("account_status").isin("active", "inactive", "suspended")).count() == 0)
    // modulo tiers: 1000%200==0 -> inactive wins over suspended
    assert(cust.filter(col("customer_id") === 1000).select("account_status").head().getString(0) == "inactive")

    val meters = MeterGen.metersDim(spark, 1000)
    assert(meters.count() == 1000)
    assert(meters.select("meter_id").distinct().count() == 1000)
    // 50% solar via even ids (02_populate_dimensions.sql:83-86)
    assert(meters.filter(col("malo_prod").isNotNull).count() == 500)
    // zones 5..20 only (02_populate_dimensions.sql:88)
    assert(meters.filter(col("grid_zone_id") < 5 || col("grid_zone_id") > 20).count() == 0)
    // FK integrity: every meter's zone exists (J4 orphan check via anti-join)
    assert(meters.join(MeterGen.gridZones(spark), Seq("grid_zone_id"), "left_anti").count() == 0)
  }

  test("readings: CHECK parity — non-negative, status domain, solar nullability, monotone cumulative") {
    assert(readings.count() == 20 * 96)
    assert(readings.filter(col("reading_consumption_milliwatts") < 0).count() == 0)
    assert(readings.filter(!col("status").isin("V", "E", "R")).count() == 0)
    // production NULL <=> odd meter (01_create_schema.sql:90-93, simulator :207)
    assert(readings.filter(col("meter_id") % 2 === 1 && col("reading_production_milliwatts").isNotNull).count() == 0)
    assert(readings.filter(col("meter_id") % 2 === 0 && col("reading_production_milliwatts").isNull).count() == 0)
    // cumulative counters are monotone non-decreasing per meter
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("meter_id").orderBy("reading_timestamp")
    val viol = readings
      .withColumn("prev", lag(col("reading_consumption_milliwatts"), 1).over(w))
      .filter(col("prev").isNotNull && col("reading_consumption_milliwatts") < col("prev"))
    assert(viol.count() == 0)
    // status distribution roughly 98/1.5/0.5
    val vShare = readings.filter(col("status") === "V").count().toDouble / (20 * 96)
    assert(vShare > 0.95 && vShare < 1.0, s"valid share $vShare")
  }

  test("staging golden fixture: first-reading delta and NULL-production semantics (W2, §7.4.1)") {
    // 2 meters: 1 = no solar (prod NULL), 2 = solar; hand-computed deltas
    val raw = Seq(
      ("2026-01-01 00:00:00", 1, 1000L, None: Option[Long], "V"),
      ("2026-01-01 00:15:00", 1, 2500L, None: Option[Long], "E"),
      ("2026-01-01 00:30:00", 1, 2500L, None: Option[Long], "R"),
      ("2026-01-01 00:00:00", 2, 2000L, Some(0L), "V"),
      ("2026-01-01 00:15:00", 2, 5000L, Some(700L), "V"))
      .toDF("ts", "meter_id", "reading_consumption_milliwatts",
        "reading_production_milliwatts", "status")
      .withColumn("reading_timestamp", to_timestamp(col("ts")))
      .drop("ts")
    val out = Staging.stgMeterReadings(raw)
      .orderBy("meter_id", "reading_timestamp")
      .collect()

    def row(i: Int) = out(i)
    // meter 1, first reading: delta == cumulative (coalesce fallback)
    assert(row(0).getAs[Long]("consumption_delta_mwh") == 1000L)
    assert(row(1).getAs[Long]("consumption_delta_mwh") == 1500L)
    assert(row(2).getAs[Long]("consumption_delta_mwh") == 0L)
    // meter 1 production: NULL stays NULL in production_kwh…
    assert(row(0).isNullAt(row(0).fieldIndex("production_kwh")))
    // …but becomes 0 inside net (nested coalesce, stg_meter_readings.sql:68-74)
    assert(row(0).getAs[Double]("net_consumption_kwh") == 1000 / 1000000.0)
    // meter 2: prod delta first = cumulative (0), then 700
    assert(row(3).getAs[Long]("production_delta_mwh") == 0L)
    assert(row(4).getAs[Long]("production_delta_mwh") == 700L)
    assert(row(4).getAs[Double]("net_consumption_kwh") == (3000 - 700) / 1000000.0)
    // quality flags
    assert(row(0).getAs[Boolean]("is_valid") && !row(0).getAs[Boolean]("is_error"))
    assert(row(1).getAs[Boolean]("is_estimated"))
    assert(row(2).getAs[Boolean]("is_error"))
    assert(!row(0).getAs[Boolean]("has_solar") && row(3).getAs[Boolean]("has_solar"))
  }

  test("billing mart invariants: net = consumption − production, ×0.28 tariff, quality pct") {
    val n = 20L
    val mart = Marts.factCustomerBillingDaily(
      stg, MeterGen.metersDim(spark, n), MeterGen.customers(spark, n),
      MeterGen.tariffRates(spark)).cache()
    assert(mart.count() == n) // 1 day × 20 customers (1:1 meters)
    val bad = mart.filter(
      abs(col("net_charge") - (col("consumption_charge") - coalesce(col("production_credit"), lit(0.0)))) > 1e-9)
    assert(bad.count() == 0)
    val badRate = mart.filter(
      abs(col("consumption_charge") - col("total_consumption_kwh") * 0.28) > 1e-12)
    assert(badRate.count() == 0)
    assert(mart.filter(col("data_quality_pct") < 0 || col("data_quality_pct") > 100).count() == 0)
    assert(mart.filter(col("meter_count") =!= 1).count() == 0) // 1:1 model
    // Σ deltas == last cumulative per meter ⇒ total kwh matches final counter
    val lastCum = readings.groupBy("meter_id")
      .agg(max(col("reading_consumption_milliwatts")).as("final_mwh"))
    val totals = mart.join(lastCum, mart("customer_id") === lastCum("meter_id"))
      .filter(abs(col("total_consumption_kwh") * 1000000.0 - col("final_mwh")) > 1e-6)
    assert(totals.count() == 0)
  }

  test("grid mart invariants: utilization formula and flags") {
    val mart = Marts.factGridLoadHourly(
      stg, MeterGen.metersDim(spark, 20), MeterGen.gridZones(spark)).cache()
    assert(mart.count() > 0)
    val bad = mart.filter(col("max_capacity_megawatts") > 0 &&
      abs(col("capacity_utilization_pct") -
        col("total_net_consumption_mwh") / col("max_capacity_megawatts") * 100) > 1e-9)
    assert(bad.count() == 0)
    assert(mart.filter(col("is_critical_load") && !col("is_peak_load")).count() == 0)
    // zone attrs consistent with the dim
    val zones = MeterGen.gridZones(spark).select(
      col("grid_zone_id"), col("zone_name").as("zn"))
    assert(mart.join(zones, Seq("grid_zone_id"))
      .filter(col("zone_name") =!= col("zn")).count() == 0)
  }
}
