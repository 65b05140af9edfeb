package graft.meter

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic, seedless-random generators for the smart-meter star schema
  * (SURVEY.md §1, §2.1 S9/S10; reference
  * `database/init_scripts/02_populate_dimensions.sql:12-91` and
  * `producer/meter_simulator.py:133-252`).
  *
  * The reference uses wall-clock `now()` and unseeded `random()`; we replace
  * both with a fixed epoch and an arithmetic hash (Knuth multiplicative) so
  * the exact same rows are reproducible in any engine — that is what makes
  * the whole pipeline DuckDB-oracle-checkable (SURVEY.md §7.4.5).
  *
  * Value model (meter_simulator.py:168-241, constants :36-75):
  *  - peak hours 06-09 & 17-22: base U(2000,5000) W; night 22-06: U(500,1500);
  *    day: U(1000,3000); ×U(0.8,1.2) noise
  *  - energy per 15-min interval = watts × 250 mWh, rounded to integer mWh
  *    (integral increments keep cumulative sums exact under any summation
  *    order — the reference accumulates floats and truncates at emission,
  *    a ≤1 mWh/interval difference on ~500k mWh values)
  *  - even meter_id ⇒ solar: peak U(3000,6000) W × (1−|hour−12|/6) within
  *    06-18h, else 0; odd ⇒ production NULL (01_create_schema.sql:90-93)
  *  - status: 98% 'V', 1.5% 'E', 0.5% 'R' (meter_simulator.py:70-81)
  *
  * Scale note: generation is a single `spark.range(n*t)` — embarrassingly
  * parallel, no joins; the only shuffle is the cumulative-sum window on
  * meter_id, which is also the layout the downstream LAG staging wants
  * (pre-partitioned by meter, ordered by time — SURVEY.md §4 O2).
  */
object MeterGen {

  val Epoch = "2026-01-01 00:00:00"
  private val TWO31 = 2147483648L
  private val KNUTH = 2654435761L

  /** Deterministic uniform in [0,1): same arithmetic in Spark and DuckDB. */
  def u(x: Column): Column =
    (x % TWO31) * KNUTH % TWO31 / lit(TWO31.toDouble)

  /** SQL text of [[u]] for the DuckDB oracle. */
  def uSql(x: String): String =
    s"(((($x) % 2147483648) * 2654435761) % 2147483648) / 2147483648.0"

  /** dim_grid_zones — the exact 20-row list (02_populate_dimensions.sql:12-41). */
  def gridZones(spark: SparkSession): DataFrame = {
    import spark.implicits._
    MeterSql.zoneRows.toDF("grid_zone_id", "zone_name", "region", "zone_type", "max_capacity_megawatts")
  }

  /** dim_tariff_rates — single flat rate 0.2800 $/kWh (01_create_schema.sql:10-18). */
  def tariffRates(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1, "0.2800")).toDF("tariff_id", "rate_str")
      .select(col("tariff_id"), col("rate_str").cast("decimal(6,4)").as("base_rate_per_kwh"))
  }

  /** Time-of-use rate schedule as DATA (one row per hour-of-day, cents
    * per kWh): peak 07-09 & 17-22 = 35¢, off-peak 22-06 = 18¢, shoulder
    * else = 28¢ — the flat reference tariff bracketed ±25%. A schedule
    * table (not a CASE in the mart) is the shape that lets ops change
    * rates without a deploy; it broadcasts everywhere. */
  def touRates(spark: SparkSession): DataFrame =
    spark.range(0, 24).select(
      col("id").cast("int").as("hour_of_day"),
      when((col("id") >= 7 && col("id") < 9) || (col("id") >= 17 && col("id") < 22), 35)
        .when(col("id") >= 22 || col("id") < 6, 18)
        .otherwise(28).as("rate_c"))

  /** dim_customers (02_populate_dimensions.sql:48-58). */
  def customers(spark: SparkSession, n: Long): DataFrame =
    spark.range(1, n + 1).select(
      col("id").cast("int").as("customer_id"),
      concat(lit("Customer-"), lpad(col("id").cast("string"), 7, "0")).as("customer_name"),
      when(col("id") % 200 === 0, "inactive")
        .when(col("id") % 500 === 0, "suspended")
        .otherwise("active").as("account_status"))

  /** dim_meters (02_populate_dimensions.sql:66-91); installation_date made
    * deterministic: epoch − ⌊u·3650⌋ days instead of now()−random()·10y. */
  def metersDim(spark: SparkSession, n: Long): DataFrame =
    spark.range(1, n + 1)
      .withColumn("inst_days", floor(u(col("id") * 11 + 7) * 3650).cast("int"))
      .select(
        col("id").cast("int").as("meter_id"),
        concat(lit("MTR-"), lpad(col("id").cast("string"), 10, "0")).as("meter_idn"),
        col("id").cast("int").as("customer_id"),
        concat(lit("MELO-"), lpad(col("id").cast("string"), 10, "0")).as("melo"),
        (col("id") + 10000000L).as("malo_cons"),
        when(col("id") % 2 === 0, col("id") + 20000000L).as("malo_prod"),
        concat(lit("GW-"), lpad((col("id") % 5000 + 1).cast("string"), 6, "0")).as("gateway_idn"),
        (col("id") % 16 + 5).cast("int").as("grid_zone_id"),
        expr(s"timestamp '$Epoch' - make_interval(0, 0, 0, inst_days, 0, 0, 0)")
          .as("installation_date"))

  /** raw_meter_readings: nMeters × nIntervals cumulative readings on the
    * 15-min grid starting at [[Epoch]] (midnight ⇒ interval index i maps to
    * hour = (i mod 96) div 4). One `spark.range` — no generation join. */
  def readings(spark: SparkSession, nMeters: Long, nIntervals: Long): DataFrame = {
    val w = Window.partitionBy(col("meter_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spark.range(0, nMeters * nIntervals)
      .select(
        expr(s"id div $nIntervals + 1").as("meter_id"),
        (col("id") % nIntervals).as("i"))
      .withColumn("k", col("meter_id") * 100000L + col("i"))
      .withColumn("h", expr("(i % 96) div 4"))
      .withColumn("ub", u(col("k") * 3 + 1))
      .withColumn("uv", u(col("k") * 3 + 2))
      .withColumn("us", u(col("k") * 3 + 3))
      .withColumn("up", u(col("k") * 5 + 1))
      .withColumn("uw", u(col("k") * 5 + 2))
      .withColumn("cons_watts",
        when((col("h") >= 6 && col("h") < 9) || (col("h") >= 17 && col("h") < 22),
          lit(2000) + lit(3000) * col("ub"))
          .when(col("h") >= 22 || col("h") < 6, lit(500) + lit(1000) * col("ub"))
          .otherwise(lit(1000) + lit(2000) * col("ub")) * (lit(0.8) + lit(0.4) * col("uv")))
      .withColumn("prod_watts",
        when(col("meter_id") % 2 === 0,
          when(col("h") >= 6 && col("h") < 18,
            (lit(3000) + lit(3000) * col("up")) * (lit(1) - abs(col("h") - 12) / 6.0)
              * (lit(0.8) + lit(0.4) * col("uw")))
            .otherwise(lit(0.0))))
      .withColumn("cons_inc", round(col("cons_watts") * 250).cast("long"))
      .withColumn("prod_inc", round(col("prod_watts") * 250).cast("long"))
      .select(
        expr(s"timestamp '$Epoch' + make_interval(0, 0, 0, 0, 0, cast(i * 15 as int), 0)")
          .as("reading_timestamp"),
        col("meter_id").cast("int").as("meter_id"),
        sum(col("cons_inc")).over(w).as("reading_consumption_milliwatts"),
        sum(col("prod_inc")).over(w).as("reading_production_milliwatts"),
        when(col("us") * 100 < 98.0, "V")
          .when(col("us") * 100 < 99.5, "E")
          .otherwise("R").as("status"))
  }
}
