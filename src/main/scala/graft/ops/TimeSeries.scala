package graft.ops

import graft.GraftQuery
import graft.GraftQuery.{q, qNoOracle}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series operator coverage over `events` (ts/user_id/value ≈ the
  * reference's reading_timestamp/meter_id/reading — SURVEY.md §2.5, §2.6,
  * FIXTURES.md §B): the LAG delta spine (W1), first-reading coalesce
  * semantics (W2, `stg_meter_readings.sql:46-54`), running cumulative
  * totals (A9), tumbling day/hour aggregates (A1/A3/E1), conditional
  * aggregation (A5), bool-or (A6), JSON wire decode (E14/S4), validation
  * filters (P3/P4), string/modulo expressions (E5/E6), tier CASE (E7),
  * guarded ratios + threshold flags (E12/E13).
  *
  * Determinism notes (oracle is DuckDB over the same parquet):
  * - `ts` has ns precision that Spark truncates to µs → never emitted raw;
  *   window orderings tie-break on unique `event_id`.
  * - `value` carries 2 decimals → summed as exact BIGINT cents
  *   ([[Tables.cents]]); running sums stay exact under DuckDB's
  *   segment-tree window aggregation vs Spark's sequential fold.
  */
object TimeSeries {
  import Tables.cents

  private def wUser = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))

  val all: Seq[GraftQuery] = Seq(
    // ---- W1: lag-based per-key delta (stg_meter_readings.sql:22-30)
    q("w1_lag_delta",
      """SELECT event_id, user_id, value,
        |  lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
        |  value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(wUser).as("prev_value"),
        (col("value") - lag(col("value"), 1).over(wUser)).as("delta"))
    },

    // ---- W2: first-row coalesce semantics — first delta = the raw value
    // (stg_meter_readings.sql:46-54; meters start at 0)
    q("w2_first_reading_delta",
      """SELECT event_id, user_id,
        |  coalesce(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), value) AS delta
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        coalesce(col("value") - lag(col("value"), 1).over(wUser), col("value")).as("delta"))
    },

    // ---- A9: running cumulative total per key (producer-side state,
    // meter_simulator.py:143-144,203) — exact via BIGINT cents
    q("a9_running_total",
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)/100.0 AS running_value
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        (sum(cents(col("value"))).over(
          wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)) / 100.0)
          .as("running_value"))
    },

    // ---- A3/E1: tumbling hourly aggregate (fact_grid_load_hourly.sql:25-41)
    q("a3_hourly_agg",
      """SELECT date_trunc('hour', ts) AS load_hour, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)/100.0 AS total_value
        |FROM events GROUP BY date_trunc('hour', ts)""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("load_hour"))
        .agg(count(lit(1)).as("n_events"), (sum(cents(col("value"))) / 100.0).as("total_value"))
    },

    // ---- A1/A5/A6: daily per-key aggregate with conditional sums and
    // bool-or-via-max (fact_customer_billing_daily.sql:25-46)
    q("a1_daily_user_agg",
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)/100.0 AS total_value,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BOOLEAN) AS any_purchase
        |FROM events GROUP BY CAST(date_trunc('day', ts) AS DATE), user_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(date_trunc("day", col("ts"))).as("day"), col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          (sum(cents(col("value"))) / 100.0).as("total_value"),
          sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchase"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).cast("boolean").as("any_purchase"))
    },

    // ---- A4/A7/E12/E13: two-level hour->zone rollup with guarded
    // utilization ratio and peak/critical flags (fact_grid_load_hourly.sql:44-116)
    q("a4_hourly_zone_load",
      """WITH l1 AS (
        |  SELECT date_trunc('hour', ts) AS load_hour, user_id,
        |         COUNT(*) AS n_events,
        |         SUM(CAST(round(value*100) AS BIGINT)) AS cents
        |  FROM events GROUP BY date_trunc('hour', ts), user_id)
        |SELECT load_hour, user_id % 10 AS zone_id,
        |  CAST(SUM(n_events) AS BIGINT) AS n_events,
        |  COUNT(DISTINCT user_id) AS active_users,
        |  CAST(SUM(cents) AS BIGINT)/100.0 AS total_value,
        |  CASE WHEN SUM(n_events) > 0
        |       THEN (CAST(SUM(cents) AS BIGINT)/100.0) / ((user_id % 10 + 1) * 1000)
        |       ELSE 0 END AS utilization,
        |  CASE WHEN SUM(n_events) > 0
        |       THEN (CAST(SUM(cents) AS BIGINT)/100.0) / ((user_id % 10 + 1) * 1000)
        |       ELSE 0 END > 0.8 AS is_peak,
        |  CASE WHEN SUM(n_events) > 0
        |       THEN (CAST(SUM(cents) AS BIGINT)/100.0) / ((user_id % 10 + 1) * 1000)
        |       ELSE 0 END > 0.95 AS is_critical
        |FROM l1 GROUP BY load_hour, user_id % 10""".stripMargin) { (s, d) =>
      val l1 = Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("load_hour"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), sum(cents(col("value"))).as("cents_"))
      val util = when(sum(col("n_events")) > 0,
        (sum(col("cents_")) / 100.0) / ((col("zone_id") + 1) * 1000)).otherwise(0)
      l1.groupBy(col("load_hour"), (col("user_id") % 10).as("zone_id"))
        .agg(
          sum(col("n_events")).as("n_events"),
          countDistinct(col("user_id")).as("active_users"),
          (sum(col("cents_")) / 100.0).as("total_value"),
          util.as("utilization"),
          (util > 0.8).as("is_peak"),
          (util > 0.95).as("is_critical"))
    },

    // ---- E14/S4: JSON wire-format decode + aggregate
    // (producer/meter_simulator.py:244-250, consumer/meter_consumer.py:208-217)
    q("e14_json_decode",
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)/COUNT(*) AS avg_k,
        |  CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_k_over_50
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      val k = get_json_object(col("props"), "$.k").cast("long")
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(k).as("sum_k"),
          (sum(k) / count(lit(1))).as("avg_k"),
          sum(when(k > 50, 1).otherwise(0)).as("n_k_over_50"))
    },

    // ---- P3/P4/S4: required-field + domain validation with drop accounting
    // (consumer/meter_consumer.py:213-224, 01_create_schema.sql:84-93)
    q("p3_validation_counts",
      """SELECT COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN user_id IS NOT NULL AND ts IS NOT NULL
        |       AND value >= 1.0
        |       AND event_type IN ('click','view','purchase','signup','error')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        |  CAST(SUM(CASE WHEN user_id IS NOT NULL AND ts IS NOT NULL
        |       AND value >= 1.0
        |       AND event_type IN ('click','view','purchase','signup','error')
        |       THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
        |FROM events""".stripMargin) { (s, d) =>
      val valid = col("user_id").isNotNull && col("ts").isNotNull &&
        col("value") >= 1.0 &&
        col("event_type").isin("click", "view", "purchase", "signup", "error")
      Tables.events(s, d).agg(
        count(lit(1)).as("n_total"),
        sum(when(valid, 1).otherwise(0)).as("n_valid"),
        sum(when(valid, 0).otherwise(1)).as("n_invalid"))
    },

    // ---- E5/E6: identifier synthesis (concat+lpad) and modulo bucketing
    // (02_populate_dimensions.sql:51,79-88)
    q("e5_identifier_synthesis",
      """SELECT 'USR-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS user_idn,
        |  user_id % 10 AS bucket, COUNT(*) AS n_events
        |FROM events
        |GROUP BY 'USR-' || lpad(CAST(user_id AS VARCHAR), 6, '0'), user_id % 10""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(
          concat(lit("USR-"), lpad(col("user_id").cast("string"), 6, "0")).as("user_idn"),
          (col("user_id") % 10).as("bucket"))
        .agg(count(lit(1)).as("n_events"))
    },

    // ---- §2.4 extension: ROLLUP grouping sets (absent in the reference,
    // exposed as a built-in capability of the engine)
    q("a_rollup_day_type",
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)/100.0 AS total_value
        |FROM events
        |GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS DATE), event_type)""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .rollup(to_date(date_trunc("day", col("ts"))).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 100.0).as("total_value"))
    },

    // ---- A7 at-scale variant: HLL++ approximate distinct. The sketch
    // estimate is engine-specific (DuckDB has no HLL++ twin), so the
    // hashed output carries only oracle-reproducible columns: the exact
    // distinct plus a BOUNDED-ASSERTION verdict — Spark genuinely checks
    // |approx − exact| ≤ 15%·exact (3σ of HLL++'s default rsd 0.05) while
    // the oracle asserts TRUE; a sketch regression outside the bound
    // flips the verdict and fails the hash. The exact twin is
    // a7_count_distinct; the opt-in plan rewrite is
    // graft.plans.ApproxCountDistinctRule.
    q("a7_approx_count_distinct",
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS within_bound
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id")).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) * 100
            <= col("exact_users") * 15).as("within_bound"))
    },

    // ---- S1/E14 encode side: to_json(struct(...)) wire format, then
    // decode back and aggregate — the producer->consumer JSON round trip
    // (producer/meter_simulator.py:285, consumer/meter_consumer.py:210)
    q("e14_json_roundtrip",
      """SELECT event_type, COUNT(*) AS n, CAST(SUM(user_id) AS BIGINT) AS sum_users
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      val wire = Tables.events(s, d)
        .select(to_json(struct(col("event_id"), col("user_id"), col("event_type"))).as("value"))
      val schema = org.apache.spark.sql.types.StructType
        .fromDDL("event_id BIGINT, user_id BIGINT, event_type STRING")
      wire.select(from_json(col("value"), schema).as("r"))
        .select(col("r.*"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("user_id")).as("sum_users"))
    },

    // ---- S7/§3.3: view registration + ad-hoc SQL entry point — the
    // psql-over-marts access path, via spark.sql over a temp view
    q("s7_sql_over_view",
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)/100.0 AS total_value
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("events_v")
      // Spark SQL parses the bare literal 100.0 as DECIMAL(4,1) (the
      // DataFrame twin and the DuckDB oracle divide by a DOUBLE), so the
      // divisor must be cast explicitly for a DOUBLE result type
      s.sql(
        """SELECT event_type, COUNT(*) AS n,
          |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)/CAST(100.0 AS DOUBLE) AS total_value
          |FROM events_v GROUP BY event_type""".stripMargin)
    },

    // ---- E7: CASE tiering (02_populate_dimensions.sql:52-56 pattern)
    q("e7_case_tiering",
      """SELECT event_type,
        |  CASE WHEN value >= 400 THEN 'high'
        |       WHEN value >= 100 THEN 'mid'
        |       ELSE 'low' END AS tier,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)/100.0 AS total_value
        |FROM events GROUP BY event_type,
        |  CASE WHEN value >= 400 THEN 'high' WHEN value >= 100 THEN 'mid' ELSE 'low' END""".stripMargin) { (s, d) =>
      val tier = when(col("value") >= 400, "high")
        .when(col("value") >= 100, "mid").otherwise("low")
      Tables.events(s, d)
        .groupBy(col("event_type"), tier.as("tier"))
        .agg(count(lit(1)).as("n"), (sum(cents(col("value"))) / 100.0).as("total_value"))
    }
  )
}
