package graft.meter

/** DuckDB-oracle SQL equivalents of [[MeterGen]]/[[Staging]]/[[Marts]] —
  * the same deterministic arithmetic (Knuth-hash uniforms, integer mWh
  * increments, window cumulative sums) expressed as chained CTEs over
  * `generate_series`, so the driver can verify the entire meter pipeline
  * end-to-end without access to Spark (SURVEY.md §5).
  */
object MeterSql {
  import MeterGen.uSql

  val zoneRows: Seq[(Int, String, String, String, Int)] = Seq(
    (1, "Downtown Core", "Central", "urban", 500),
    (2, "North Business District", "Central", "urban", 450),
    (3, "South Commercial Hub", "Central", "urban", 480),
    (4, "East Financial District", "East", "urban", 420),
    (5, "North Residential Area", "North", "suburban", 300),
    (6, "Northeast Suburbs", "North", "suburban", 280),
    (7, "Northwest Suburbs", "North", "suburban", 290),
    (8, "South Residential Area", "South", "suburban", 320),
    (9, "Southeast Suburbs", "South", "suburban", 310),
    (10, "Southwest Suburbs", "South", "suburban", 300),
    (11, "West Residential Area", "West", "suburban", 340),
    (12, "East Residential Area", "East", "suburban", 330),
    (13, "North Rural District", "North", "rural", 150),
    (14, "South Rural District", "South", "rural", 140),
    (15, "East Rural District", "East", "rural", 160),
    (16, "West Rural District", "West", "rural", 155),
    (17, "Industrial Park North", "North", "urban", 600),
    (18, "Industrial Park South", "South", "urban", 580),
    (19, "Port Industrial Zone", "East", "urban", 550),
    (20, "Airport Industrial Zone", "West", "urban", 520))

  def zonesCte: String = {
    val rows = zoneRows
      .map { case (id, n, r, t, c) => s"($id, '$n', '$r', '$t', $c)" }
      .mkString(", ")
    s"""zones AS (SELECT * FROM (VALUES $rows)
       | AS z(grid_zone_id, zone_name, region, zone_type, max_capacity_megawatts))""".stripMargin
  }

  def customersCte(n: Long): String =
    s"""customers AS (
       |  SELECT CAST(gs AS INTEGER) AS customer_id,
       |    'Customer-' || lpad(CAST(gs AS VARCHAR), 7, '0') AS customer_name,
       |    CASE WHEN gs % 200 = 0 THEN 'inactive'
       |         WHEN gs % 500 = 0 THEN 'suspended'
       |         ELSE 'active' END AS account_status
       |  FROM generate_series(1, $n) AS tc(gs))""".stripMargin

  def metersCte(n: Long): String =
    s"""meters AS (
       |  SELECT CAST(gs AS INTEGER) AS meter_id,
       |    'MTR-' || lpad(CAST(gs AS VARCHAR), 10, '0') AS meter_idn,
       |    CAST(gs AS INTEGER) AS customer_id,
       |    'MELO-' || lpad(CAST(gs AS VARCHAR), 10, '0') AS melo,
       |    gs + 10000000 AS malo_cons,
       |    CASE WHEN gs % 2 = 0 THEN gs + 20000000 END AS malo_prod,
       |    'GW-' || lpad(CAST(gs % 5000 + 1 AS VARCHAR), 6, '0') AS gateway_idn,
       |    CAST(gs % 16 + 5 AS INTEGER) AS grid_zone_id,
       |    TIMESTAMP '${MeterGen.Epoch}'
       |      - CAST(floor(${uSql("gs * 11 + 7")} * 3650) AS INTEGER) * INTERVAL 1 DAY
       |      AS installation_date
       |  FROM generate_series(1, $n) AS tm(gs))""".stripMargin

  /** raw_meter_readings as CTE chain (mirrors [[MeterGen.readings]]). */
  def readingsCtes(nMeters: Long, nIntervals: Long): String = {
    val k = "(meter_id * 100000 + i)"
    s"""gen AS (
       |  SELECT (gs // $nIntervals) + 1 AS meter_id, gs % $nIntervals AS i
       |  FROM generate_series(0, ${nMeters * nIntervals - 1} ) AS tg(gs)),
       |drawn AS (
       |  SELECT meter_id, i, (i % 96) // 4 AS h,
       |    ${uSql(s"$k * 3 + 1")} AS ub,
       |    ${uSql(s"$k * 3 + 2")} AS uv,
       |    ${uSql(s"$k * 3 + 3")} AS us,
       |    ${uSql(s"$k * 5 + 1")} AS up,
       |    ${uSql(s"$k * 5 + 2")} AS uw
       |  FROM gen),
       |incs AS (
       |  SELECT meter_id, i, us,
       |    CAST(round(
       |      (CASE WHEN (h >= 6 AND h < 9) OR (h >= 17 AND h < 22) THEN 2000 + 3000 * ub
       |            WHEN h >= 22 OR h < 6 THEN 500 + 1000 * ub
       |            ELSE 1000 + 2000 * ub END * (0.8 + 0.4 * uv)) * 250) AS BIGINT) AS cons_inc,
       |    CASE WHEN meter_id % 2 = 0 THEN
       |      CAST(round((CASE WHEN h >= 6 AND h < 18
       |                       THEN (3000 + 3000 * up) * (1 - abs(h - 12) / 6.0) * (0.8 + 0.4 * uw)
       |                       ELSE 0 END) * 250) AS BIGINT)
       |    END AS prod_inc
       |  FROM drawn),
       |readings AS (
       |  SELECT TIMESTAMP '${MeterGen.Epoch}' + CAST(i * 15 AS INTEGER) * INTERVAL 1 MINUTE
       |      AS reading_timestamp,
       |    CAST(meter_id AS INTEGER) AS meter_id,
       |    CAST(SUM(cons_inc) OVER w AS BIGINT) AS reading_consumption_milliwatts,
       |    CAST(SUM(prod_inc) OVER w AS BIGINT) AS reading_production_milliwatts,
       |    CASE WHEN us * 100 < 98.0 THEN 'V'
       |         WHEN us * 100 < 99.5 THEN 'E'
       |         ELSE 'R' END AS status
       |  FROM incs
       |  WINDOW w AS (PARTITION BY meter_id ORDER BY i
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))""".stripMargin
  }

  /** stg_meter_readings as CTEs on top of [[readingsCtes]]
    * (stg_meter_readings.sql:22-87 semantics, exact column set). */
  def stagingCtes(nMeters: Long, nIntervals: Long): String =
    s"""${readingsCtes(nMeters, nIntervals)},
       |with_prev AS (
       |  SELECT reading_timestamp, meter_id,
       |    reading_consumption_milliwatts AS cumulative_consumption_mwh,
       |    reading_production_milliwatts AS cumulative_production_mwh,
       |    status,
       |    lag(reading_consumption_milliwatts) OVER (PARTITION BY meter_id ORDER BY reading_timestamp) AS prev_c,
       |    lag(reading_production_milliwatts) OVER (PARTITION BY meter_id ORDER BY reading_timestamp) AS prev_p
       |  FROM readings),
       |stg AS (
       |  SELECT reading_timestamp, meter_id,
       |    cumulative_consumption_mwh, cumulative_production_mwh, status,
       |    coalesce(cumulative_consumption_mwh - prev_c, cumulative_consumption_mwh) AS consumption_delta_mwh,
       |    coalesce(cumulative_production_mwh - prev_p, cumulative_production_mwh) AS production_delta_mwh,
       |    coalesce(cumulative_consumption_mwh - prev_c, cumulative_consumption_mwh) / 1000000.0 AS consumption_kwh,
       |    coalesce(cumulative_production_mwh - prev_p, cumulative_production_mwh) / 1000000.0 AS production_kwh,
       |    (coalesce(cumulative_consumption_mwh - prev_c, cumulative_consumption_mwh)
       |      - coalesce(coalesce(cumulative_production_mwh - prev_p, cumulative_production_mwh), 0)
       |    ) / 1000000.0 AS net_consumption_kwh,
       |    status = 'V' AS is_valid,
       |    status = 'E' AS is_estimated,
       |    status = 'R' AS is_error,
       |    cumulative_production_mwh IS NOT NULL AS has_solar
       |  FROM with_prev)""".stripMargin

  /** fact_customer_billing_daily, full chain (billing mart over nMeters
    * meters × nIntervals intervals, dims sized to match). */
  def billingSql(nMeters: Long, nIntervals: Long): String =
    s"""WITH ${stagingCtes(nMeters, nIntervals)},
       |${customersCte(nMeters)},
       |${metersCte(nMeters)},
       |daily AS (
       |  SELECT CAST(date_trunc('day', reading_timestamp) AS DATE) AS billing_date,
       |    meter_id,
       |    SUM(consumption_delta_mwh) AS cons_mwh,
       |    SUM(production_delta_mwh) AS prod_mwh,
       |    SUM(consumption_delta_mwh - coalesce(production_delta_mwh, 0)) AS net_mwh,
       |    COUNT(*) AS reading_count,
       |    SUM(CASE WHEN is_valid THEN 1 ELSE 0 END) AS valid_reading_count,
       |    SUM(CASE WHEN is_estimated THEN 1 ELSE 0 END) AS estimated_reading_count,
       |    SUM(CASE WHEN is_error THEN 1 ELSE 0 END) AS error_reading_count,
       |    CAST(MAX(CAST(has_solar AS INTEGER)) AS BOOLEAN) AS has_solar
       |  FROM stg GROUP BY 1, 2),
       |cust AS (
       |  SELECT daily.billing_date, m.customer_id, c.customer_name,
       |    CAST(SUM(daily.cons_mwh) AS BIGINT) / 1000000.0 AS total_consumption_kwh,
       |    CAST(SUM(daily.prod_mwh) AS BIGINT) / 1000000.0 AS total_production_kwh,
       |    CAST(SUM(daily.net_mwh) AS BIGINT) / 1000000.0 AS total_net_consumption_kwh,
       |    COUNT(DISTINCT daily.meter_id) AS meter_count,
       |    CAST(SUM(daily.reading_count) AS BIGINT) AS total_reading_count,
       |    CAST(SUM(daily.valid_reading_count) AS BIGINT) AS valid_reading_count,
       |    CAST(SUM(daily.estimated_reading_count) AS BIGINT) AS estimated_reading_count,
       |    CAST(SUM(daily.error_reading_count) AS BIGINT) AS error_reading_count,
       |    CAST(MAX(CAST(daily.has_solar AS INTEGER)) AS BOOLEAN) AS has_solar
       |  FROM daily
       |  JOIN meters m ON daily.meter_id = m.meter_id
       |  JOIN customers c ON m.customer_id = c.customer_id
       |  GROUP BY daily.billing_date, m.customer_id, c.customer_name)
       |SELECT billing_date, customer_id, customer_name,
       |  total_consumption_kwh, total_production_kwh, total_net_consumption_kwh,
       |  total_consumption_kwh * 0.28 AS consumption_charge,
       |  total_production_kwh * 0.28 AS production_credit,
       |  total_net_consumption_kwh * 0.28 AS net_charge,
       |  meter_count, total_reading_count, valid_reading_count,
       |  estimated_reading_count, error_reading_count, has_solar,
       |  CASE WHEN total_reading_count > 0
       |       THEN CAST(valid_reading_count AS DOUBLE) / CAST(total_reading_count AS DOUBLE) * 100
       |       ELSE 0 END AS data_quality_pct
       |FROM cust""".stripMargin

  /** fact_grid_load_hourly, full chain. */
  def gridSql(nMeters: Long, nIntervals: Long): String =
    s"""WITH ${stagingCtes(nMeters, nIntervals)},
       |${metersCte(nMeters)},
       |${zonesCte},
       |hourly AS (
       |  SELECT date_trunc('hour', reading_timestamp) AS load_hour,
       |    meter_id,
       |    SUM(consumption_delta_mwh) AS cons_mwh,
       |    SUM(production_delta_mwh) AS prod_mwh,
       |    SUM(consumption_delta_mwh - coalesce(production_delta_mwh, 0)) AS net_mwh,
       |    COUNT(*) AS reading_count,
       |    SUM(CASE WHEN is_valid THEN 1 ELSE 0 END) AS valid_reading_count
       |  FROM stg GROUP BY 1, 2),
       |zone AS (
       |  SELECT hourly.load_hour, m.grid_zone_id, z.zone_name, z.zone_type,
       |    z.max_capacity_megawatts,
       |    CAST(SUM(hourly.cons_mwh) AS BIGINT) / 1000000.0 AS total_consumption_kwh,
       |    CAST(SUM(hourly.prod_mwh) AS BIGINT) / 1000000.0 AS total_production_kwh,
       |    CAST(SUM(hourly.net_mwh) AS BIGINT) / 1000000.0 AS total_net_consumption_kwh,
       |    COUNT(DISTINCT hourly.meter_id) AS active_meter_count,
       |    CAST(SUM(hourly.reading_count) AS BIGINT) AS total_reading_count,
       |    CAST(SUM(hourly.valid_reading_count) AS BIGINT) AS valid_reading_count
       |  FROM hourly
       |  JOIN meters m ON hourly.meter_id = m.meter_id
       |  JOIN zones z ON m.grid_zone_id = z.grid_zone_id
       |  GROUP BY hourly.load_hour, m.grid_zone_id, z.zone_name, z.zone_type, z.max_capacity_megawatts)
       |SELECT load_hour, grid_zone_id, zone_name, zone_type, max_capacity_megawatts,
       |  total_consumption_kwh, total_production_kwh, total_net_consumption_kwh,
       |  total_net_consumption_kwh / 1000.0 AS total_net_consumption_mwh,
       |  CASE WHEN max_capacity_megawatts > 0
       |       THEN (total_net_consumption_kwh / 1000.0) / max_capacity_megawatts * 100
       |       ELSE 0 END AS capacity_utilization_pct,
       |  max_capacity_megawatts > 0
       |    AND (total_net_consumption_kwh / 1000.0) / max_capacity_megawatts > 0.8 AS is_peak_load,
       |  max_capacity_megawatts > 0
       |    AND (total_net_consumption_kwh / 1000.0) / max_capacity_megawatts > 0.95 AS is_critical_load,
       |  active_meter_count, total_reading_count, valid_reading_count,
       |  CASE WHEN total_reading_count > 0
       |       THEN CAST(valid_reading_count AS DOUBLE) / CAST(total_reading_count AS DOUBLE) * 100
       |       ELSE 0 END AS data_quality_pct
       |FROM zone""".stripMargin

  /** fact_billing_tou_daily: the TOU twin of [[billingSql]]. */
  def billingTouSql(nMeters: Long, nIntervals: Long): String =
    s"""WITH ${stagingCtes(nMeters, nIntervals)},
       |rates AS (
       |  SELECT h AS hour_of_day,
       |    CASE WHEN (h >= 7 AND h < 9) OR (h >= 17 AND h < 22) THEN 35
       |         WHEN h >= 22 OR h < 6 THEN 18 ELSE 28 END AS rate_c
       |  FROM generate_series(0, 23) AS tg(h))
       |SELECT CAST(date_trunc('day', reading_timestamp) AS DATE) AS billing_date,
       |  meter_id,
       |  CAST(SUM(CASE WHEN r.rate_c = 35 THEN consumption_delta_mwh ELSE 0 END) AS BIGINT)
       |    / 1000000.0 AS peak_kwh,
       |  CAST(SUM(CASE WHEN r.rate_c = 28 THEN consumption_delta_mwh ELSE 0 END) AS BIGINT)
       |    / 1000000.0 AS shoulder_kwh,
       |  CAST(SUM(CASE WHEN r.rate_c = 18 THEN consumption_delta_mwh ELSE 0 END) AS BIGINT)
       |    / 1000000.0 AS offpeak_kwh,
       |  CAST(SUM(consumption_delta_mwh * r.rate_c) AS BIGINT) / 100000000.0 AS tou_charge,
       |  CAST(SUM(consumption_delta_mwh) * 28 AS BIGINT) / 100000000.0 AS flat_charge
       |FROM stg JOIN rates r ON date_part('hour', stg.reading_timestamp) = r.hour_of_day
       |GROUP BY 1, 2""".stripMargin
}
