package graft.ops

import graft.GraftQuery
import graft.GraftQuery.q
import graft.meter.{MeterGen, MeterSql}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series "toolkit" hyperfunctions — the analytics layer a
  * TimescaleDB deployment gets from the timescaledb_toolkit extension,
  * re-expressed as Spark plans over the same hypertable-shaped data the
  * reference stores (`database/init_scripts/01_create_schema.sql:98`
  * creates the `raw_meter_readings` hypertable these operators would run
  * on; the reference itself stops at plain aggregates, so this file is
  * engine capability beyond it, in the reference's own domain):
  *
  *   - `time_weight('LOCF')`  → [[ts_time_weighted_avg]]
  *   - `counter_agg` deltas   → [[ts_counter_resets]]
  *   - M4 / `lttb`-class downsampling → [[ts_downsample_m4]]
  *   - hopping (sliding) time windows → [[w15_hopping_windows]]
  *   - `stats_agg` per-key linear regression → [[a_trend_slope_per_meter]]
  *
  * Arithmetic doctrine (repo-wide): every accumulation is exact BIGINT —
  * milliwatt·millisecond products, cross-multiplied regression moments —
  * and any division either has provably non-negative operands (so DuckDB's
  * floor `//` and Spark's truncating `div` agree) or is deferred to one
  * final IEEE-double divide of exactly-equal integer operands. Every
  * window is keyed by meter_id; every aggregate is map-side combinable.
  * At 100 TB each operator is one keyed sort (already the layout the
  * hypertable's segmentby=meter_id/orderby=timestamp compression implies)
  * plus one combinable aggregate — no global windows, no driver state.
  */
object TimeSeriesTk {

  /** Counter wrap modulus for [[ts_counter_resets]]: small enough that the
    * 50×96 generated day wraps several times per meter, large enough that
    * one 15-min increment (≤ ~1.6e6 mW) can never wrap twice. */
  private val WrapM = 20000000L

  /** Thinned (gappy) readings: the ts_gapfill thinning — deterministic
    * ~10% drops keyed on (meter, interval) — reused here to make the
    * spacing irregular, which is the regime time-weighted averaging
    * exists for (on a perfect grid TWA degenerates to the plain mean). */
  private def thinnedSql(nMeters: Long, nIntervals: Long): String =
    s"""${MeterSql.readingsCtes(nMeters, nIntervals)},
       |thinned AS (
       |  SELECT * FROM readings
       |  WHERE ${MeterGen.uSql(
      "(meter_id * 131 + CAST(epoch_ms(reading_timestamp) / 900000 AS BIGINT))")} < 0.9)""".stripMargin

  private def thinned(s: org.apache.spark.sql.SparkSession,
                      nMeters: Long, nIntervals: Long): DataFrame = {
    val slot = (unix_millis(col("reading_timestamp")) / 900000L).cast("long")
    MeterGen.readings(s, nMeters, nIntervals)
      .filter(MeterGen.u(col("meter_id") * 131 + slot) < 0.9)
  }

  val all: Seq[GraftQuery] = Seq(

    // ---- LOCF time-weighted average (timescaledb_toolkit
    // `average(time_weight('LOCF', ts, value))`): each observation holds
    // until the next one, so its weight is the gap it covers — the honest
    // mean of an irregularly-sampled gauge (the plain AVG over-weights
    // densely-sampled stretches). Exact form: Σ v·Δt_ms and ΣΔt_ms as
    // BIGNTs (v ≤ ~1.5e8 mW, Δt ≤ a day in ms ⇒ products ≤ ~1e16, sums
    // well inside int64), one floor division of non-negative operands at
    // the end. The last point per meter has no successor and carries no
    // weight (the toolkit's LOCF integral stops at the last sample).
    // Shape: one per-meter lead() window + one combinable aggregate.
    q("ts_time_weighted_avg",
      s"""WITH ${thinnedSql(50, 96)},
         |spans AS (
         |  SELECT meter_id, reading_consumption_milliwatts AS v,
         |    epoch_ms(lead(reading_timestamp) OVER (
         |        PARTITION BY meter_id ORDER BY reading_timestamp))
         |      - epoch_ms(reading_timestamp) AS dur_ms
         |  FROM thinned)
         |SELECT CAST(meter_id AS BIGINT) AS meter_id,
         |  CAST(SUM(v * dur_ms) AS BIGINT) AS twa_num,
         |  CAST(SUM(dur_ms) AS BIGINT) AS total_dur_ms,
         |  CAST(SUM(v * dur_ms) // SUM(dur_ms) AS BIGINT) AS twa_milliwatts
         |FROM spans WHERE dur_ms IS NOT NULL
         |GROUP BY 1""".stripMargin) { (s, _) =>
      val byMeter = Window.partitionBy(col("meter_id")).orderBy(col("reading_timestamp"))
      thinned(s, 50, 96)
        .select(col("meter_id"), col("reading_timestamp"),
          col("reading_consumption_milliwatts").as("v"))
        .withColumn("dur_ms",
          unix_millis(lead(col("reading_timestamp"), 1).over(byMeter))
            - unix_millis(col("reading_timestamp")))
        .filter(col("dur_ms").isNotNull)
        .groupBy(col("meter_id").cast("long").as("meter_id"))
        .agg(sum(col("v") * col("dur_ms")).as("twa_num"),
          sum(col("dur_ms")).as("total_dur_ms"))
        .select(col("meter_id"), col("twa_num"), col("total_dur_ms"),
          expr("twa_num div total_dur_ms").as("twa_milliwatts"))
    },

    // ---- counter-reset accounting (timescaledb_toolkit `counter_agg` →
    // `delta`/`num_resets`): meters report a bounded register that wraps —
    // here the true cumulative counter observed modulo WrapM, so resets
    // are DERIVED, deterministic, and oracle-checkable. counter_agg
    // semantics: a negative step means the counter restarted, and the
    // post-reset observation itself is the delta (the energy between the
    // pre-wrap residue and the restart is unknowable to the operator —
    // the deliberate, documented undercount counter_agg also accepts).
    // One increment can never span two wraps (max step ~1.6e6 << WrapM),
    // so wrap==reset detection is exact. Shape: one per-meter lag()
    // window + one combinable aggregate.
    q("ts_counter_resets",
      s"""WITH ${MeterSql.readingsCtes(50, 96)},
         |wrapped AS (
         |  SELECT meter_id, reading_timestamp,
         |    reading_consumption_milliwatts % $WrapM AS w
         |  FROM readings),
         |steps AS (
         |  SELECT meter_id,
         |    w - lag(w) OVER (PARTITION BY meter_id ORDER BY reading_timestamp) AS d,
         |    w FROM wrapped)
         |SELECT CAST(meter_id AS BIGINT) AS meter_id,
         |  CAST(SUM(CASE WHEN d < 0 THEN w ELSE d END) AS BIGINT) AS total_delta,
         |  CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_resets
         |FROM steps WHERE d IS NOT NULL
         |GROUP BY 1""".stripMargin) { (s, _) =>
      val byMeter = Window.partitionBy(col("meter_id")).orderBy(col("reading_timestamp"))
      MeterGen.readings(s, 50, 96)
        .select(col("meter_id"),
          (col("reading_consumption_milliwatts") % WrapM).as("w"),
          col("reading_timestamp"))
        .withColumn("d", col("w") - lag(col("w"), 1).over(byMeter))
        .filter(col("d").isNotNull)
        .groupBy(col("meter_id").cast("long").as("meter_id"))
        .agg(sum(when(col("d") < 0, col("w")).otherwise(col("d"))).as("total_delta"),
          sum(when(col("d") < 0, 1L).otherwise(0L)).as("n_resets"))
    },

    // ---- M4 downsampling (Jugel et al., VLDB 2014): per (meter, hour)
    // bucket keep min, max, first (open) and last (close) of the interval
    // delta — the four points that make a downsampled line chart
    // pixel-exact, and the bucket summary TimescaleDB ships as
    // `candlestick_agg`/OHLC. open/close are argmin/argmax over the
    // in-bucket timestamp (unique per meter ⇒ deterministic), via native
    // min_by/max_by — ONE map-side-combinable aggregate, no window
    // beyond the delta staging the pipeline already pays.
    q("ts_downsample_m4",
      s"""WITH ${MeterSql.readingsCtes(50, 96)},
         |deltas AS (
         |  SELECT meter_id, reading_timestamp,
         |    reading_consumption_milliwatts - lag(reading_consumption_milliwatts)
         |      OVER (PARTITION BY meter_id ORDER BY reading_timestamp) AS d
         |  FROM readings)
         |SELECT CAST(meter_id AS BIGINT) AS meter_id,
         |  CAST(epoch_ms(date_trunc('hour', reading_timestamp)) AS BIGINT) AS bucket_ms,
         |  CAST(arg_min(d, reading_timestamp) AS BIGINT) AS v_open,
         |  CAST(arg_max(d, reading_timestamp) AS BIGINT) AS v_close,
         |  CAST(MIN(d) AS BIGINT) AS v_min,
         |  CAST(MAX(d) AS BIGINT) AS v_max,
         |  COUNT(*) AS n
         |FROM deltas WHERE d IS NOT NULL
         |GROUP BY 1, 2""".stripMargin) { (s, _) =>
      val byMeter = Window.partitionBy(col("meter_id")).orderBy(col("reading_timestamp"))
      MeterGen.readings(s, 50, 96)
        .select(col("meter_id"), col("reading_timestamp"),
          (col("reading_consumption_milliwatts")
            - lag(col("reading_consumption_milliwatts"), 1).over(byMeter)).as("d"))
        .filter(col("d").isNotNull)
        .groupBy(col("meter_id").cast("long").as("meter_id"),
          unix_millis(date_trunc("hour", col("reading_timestamp"))).as("bucket_ms"))
        .agg(min_by(col("d"), col("reading_timestamp")).as("v_open"),
          max_by(col("d"), col("reading_timestamp")).as("v_close"),
          min(col("d")).as("v_min"),
          max(col("d")).as("v_max"),
          count(lit(1)).as("n"))
    },

    // ---- hopping (sliding) windows over the event stream: 1-hour
    // windows advancing every 15 minutes, via Spark's NATIVE sliding
    // `window()` — the TimeWindow Expand operator emits each row into
    // exactly size/slide = 4 windows map-side, then one combinable
    // aggregate; no self-join, no per-window rescan (the naive form joins
    // the stream against a window table — size/slide × corpus). The
    // oracle states the portable equivalent: explode k = 0..3 window
    // memberships arithmetically (start = (⌊t/slide⌋ − k)·slide, all in
    // exact epoch µs). Batch twin of the streaming hopping aggregation;
    // same plan shape at any scale — windows are (start)-keyed.
    q("w15_hopping_windows",
      """WITH hops AS (
        |  SELECT ((epoch_us(ts) // 900000000) - k) * 900000 AS window_start_ms,
        |    value
        |  FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k))
        |SELECT CAST(window_start_ms AS BIGINT) AS window_start_ms,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM hops GROUP BY 1""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          sum(Tables.cents(col("value"))).as("sum_cents"))
        .select(unix_millis(col("w.start")).as("window_start_ms"),
          col("n_events"), col("sum_cents"))
    },

    // ---- per-meter trend fitting (timescaledb_toolkit `stats_agg` →
    // `slope`/`intercept`): ordinary least squares of daily consumption
    // against day index, entirely inside ONE combinable aggregate per
    // meter — the grouped-model-fitting shape (n·Σxy − Σx·Σy over
    // n·Σx² − (Σx)²) that fits a model per key in a single pass at any
    // scale. The numerator can be negative, so NO integer division
    // happens: the exact BIGINT numerator/denominator are emitted, plus
    // one IEEE divide of bit-equal operands (both < 2^53 ⇒ the int→double
    // conversions are exact on both engines). Daily consumption is
    // max−min of the monotone counter — no window at all.
    q("a_trend_slope_per_meter", {
      s"""WITH ${MeterSql.readingsCtes(50, 480)},
         |daily AS (
         |  SELECT meter_id,
         |    (epoch_ms(reading_timestamp)
         |      - epoch_ms(TIMESTAMP '${MeterGen.Epoch}')) // 86400000 AS x,
         |    MAX(reading_consumption_milliwatts)
         |      - MIN(reading_consumption_milliwatts) AS y
         |  FROM readings GROUP BY 1, 2),
         |moments AS (
         |  SELECT meter_id, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         |    SUM(x * y) AS sxy, SUM(x * x) AS sxx
         |  FROM daily GROUP BY 1)
         |SELECT CAST(meter_id AS BIGINT) AS meter_id,
         |  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
         |  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
         |  CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)
         |    AS slope_mw_per_day
         |FROM moments""".stripMargin
    }) { (s, _) =>
      val daily = MeterGen.readings(s, 50, 480)
        .withColumn("x", expr(
          s"(unix_millis(reading_timestamp) - unix_millis(timestamp '${MeterGen.Epoch}'))" +
            " div 86400000"))
        .groupBy(col("meter_id"), col("x"))
        .agg((max(col("reading_consumption_milliwatts"))
          - min(col("reading_consumption_milliwatts"))).as("y"))
      daily
        .groupBy(col("meter_id").cast("long").as("meter_id"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .select(col("meter_id"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
          (col("n") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
        .withColumn("slope_mw_per_day",
          col("slope_num").cast("double") / col("slope_den"))
    },

    // ---- CUSUM change-point detection (Page 1954; the toolkit-class
    // drift monitor): per meter, the one-sided upper CUSUM over interval
    // deltas — S_i = max(0, S_{i-1} + (d_i − k)) — flags sustained
    // excursions above the meter's own mean draw k. The recursion LOOKS
    // sequential, but the zero-clamped CUSUM has a closed relational
    // form: with prefix sums P_i of y = d − k (and P_0 = 0),
    // S_i = P_i − min_{0≤j≤i} P_j — i.e. prefix-sum MINUS running-min,
    // two stacked window layers sharing ONE per-meter sort (the second
    // window consumes the first's order; no re-sort, no recursion, no
    // driver loop). Reference k is the meter's exact floor-mean delta
    // (nonneg ⇒ DuckDB // ≡ Spark div); the alarm threshold is 4k — four
    // mean-intervals' worth of cumulative excess, the scale-free h·σ
    // convention with the mean as the scale. Exact BIGINT end-to-end.
    // At 100 TB: one meter-keyed exchange+sort and one combinable
    // aggregate — the same layout the LAG staging already pays.
    q("ts_cusum_changepoints",
      s"""WITH ${MeterSql.readingsCtes(50, 96)},
         |deltas AS (
         |  SELECT meter_id, reading_timestamp,
         |    reading_consumption_milliwatts - lag(reading_consumption_milliwatts)
         |      OVER (PARTITION BY meter_id ORDER BY reading_timestamp) AS d
         |  FROM readings),
         |known AS (SELECT * FROM deltas WHERE d IS NOT NULL),
         |km AS (SELECT meter_id, CAST(SUM(d) // COUNT(*) AS BIGINT) AS k
         |       FROM known GROUP BY 1),
         |pre AS (
         |  SELECT kn.meter_id, kn.reading_timestamp, km.k,
         |    SUM(kn.d - km.k) OVER (PARTITION BY kn.meter_id
         |      ORDER BY kn.reading_timestamp
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
         |  FROM known kn JOIN km ON km.meter_id = kn.meter_id),
         |cus AS (
         |  SELECT meter_id, reading_timestamp, k,
         |    p - LEAST(0, MIN(p) OVER (PARTITION BY meter_id
         |      ORDER BY reading_timestamp
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
         |  FROM pre)
         |SELECT CAST(meter_id AS BIGINT) AS meter_id,
         |  CAST(epoch_ms(reading_timestamp) AS BIGINT) AS alarm_ms,
         |  CAST(s AS BIGINT) AS cusum,
         |  CAST(4 * k AS BIGINT) AS threshold
         |FROM cus WHERE s > 4 * k""".stripMargin) { (s, _) =>
      val byMeter = Window.partitionBy(col("meter_id")).orderBy(col("reading_timestamp"))
      val cum = byMeter.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val known = MeterGen.readings(s, 50, 96)
        .select(col("meter_id"), col("reading_timestamp"),
          (col("reading_consumption_milliwatts")
            - lag(col("reading_consumption_milliwatts"), 1).over(byMeter)).as("d"))
        .filter(col("d").isNotNull)
        // one staging pass feeds both the reference-mean aggregate and
        // the window chain (the VEE doctrine — never rescan the source)
        .localCheckpoint(eager = false)
      val km = known.groupBy(col("meter_id"))
        .agg(expr("sum(d) div count(1)").as("k"))
      known.join(km, "meter_id")
        .withColumn("p", sum(col("d") - col("k")).over(cum))
        .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(cum)))
        .filter(col("s") > col("k") * 4)
        .select(col("meter_id").cast("long").as("meter_id"),
          unix_millis(col("reading_timestamp")).as("alarm_ms"),
          col("s").cast("long").as("cusum"),
          (col("k") * 4).cast("long").as("threshold"))
    },

    // ---- sequence pattern matching (the MATCH_RECOGNIZE
    // `PATTERN (DOWN+ UP+)` shape, which Spark has no native operator
    // for): variable-length V-dips in each meter's delta series — a
    // strictly-decreasing run immediately followed by a strictly-
    // increasing run, with per-match MEASURES (trough time, run lengths,
    // depth from the pre-run peak to the trough). Compiled to relational
    // algebra as: step signs (lag) → gaps-and-islands run ids (the
    // meter_rle_status discipline) → per-run combinable aggregate →
    // run-sequence lag/lead on the runs frame. Every window is keyed by
    // meter_id; the runs frame is strictly smaller than the corpus. A
    // flat step (exact repeat) breaks strictness and ends the pattern —
    // the documented strict-V semantics. `peak` falls back to the run's
    // own first value when the down-run opens the series.
    q("seq_match_vshape",
      s"""WITH ${MeterSql.readingsCtes(50, 96)},
         |deltas AS (
         |  SELECT meter_id, reading_timestamp,
         |    reading_consumption_milliwatts - lag(reading_consumption_milliwatts)
         |      OVER (PARTITION BY meter_id ORDER BY reading_timestamp) AS d
         |  FROM readings),
         |known AS (SELECT * FROM deltas WHERE d IS NOT NULL),
         |steps AS (
         |  SELECT meter_id, reading_timestamp, d,
         |    lag(d) OVER (PARTITION BY meter_id ORDER BY reading_timestamp) AS pd
         |  FROM known),
         |stepped AS (
         |  SELECT meter_id, reading_timestamp, d,
         |    CASE WHEN d > pd THEN 1 WHEN d < pd THEN -1 ELSE 0 END AS s
         |  FROM steps WHERE pd IS NOT NULL),
         |flagged AS (
         |  SELECT meter_id, reading_timestamp, d, s,
         |    CASE WHEN s = lag(s) OVER (PARTITION BY meter_id
         |      ORDER BY reading_timestamp) THEN 0 ELSE 1 END AS chg
         |  FROM stepped),
         |runs AS (
         |  SELECT meter_id, reading_timestamp, d, s,
         |    SUM(chg) OVER (PARTITION BY meter_id ORDER BY reading_timestamp
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
         |  FROM flagged),
         |runagg AS (
         |  SELECT meter_id, run_id, MIN(s) AS sign,
         |    COUNT(*) AS len,
         |    arg_min(d, reading_timestamp) AS first_d,
         |    arg_max(d, reading_timestamp) AS last_d,
         |    CAST(epoch_ms(MAX(reading_timestamp)) AS BIGINT) AS end_ms
         |  FROM runs GROUP BY 1, 2),
         |seq AS (
         |  SELECT meter_id, run_id, sign, len, first_d, last_d, end_ms,
         |    lag(last_d) OVER w2 AS prev_last_d,
         |    lead(sign) OVER w2 AS next_sign,
         |    lead(len) OVER w2 AS next_len
         |  FROM runagg
         |  WINDOW w2 AS (PARTITION BY meter_id ORDER BY run_id))
         |SELECT CAST(meter_id AS BIGINT) AS meter_id,
         |  end_ms AS trough_ms,
         |  CAST(len AS BIGINT) AS down_len,
         |  CAST(next_len AS BIGINT) AS up_len,
         |  CAST(COALESCE(prev_last_d, first_d) - last_d AS BIGINT) AS depth
         |FROM seq WHERE sign = -1 AND next_sign = 1""".stripMargin) { (s, _) =>
      val byMeter = Window.partitionBy(col("meter_id")).orderBy(col("reading_timestamp"))
      val cum = byMeter.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val known = MeterGen.readings(s, 50, 96)
        .select(col("meter_id"), col("reading_timestamp"),
          (col("reading_consumption_milliwatts")
            - lag(col("reading_consumption_milliwatts"), 1).over(byMeter)).as("d"))
        .filter(col("d").isNotNull)
      val stepped = known
        .withColumn("pd", lag(col("d"), 1).over(byMeter))
        // the first row of each meter has no step into it — drop it, as
        // the oracle's `WHERE pd IS NOT NULL` does
        .filter(col("pd").isNotNull)
        .withColumn("s",
          when(col("d") > col("pd"), 1)
            .when(col("d") < col("pd"), -1)
            .otherwise(0))
      val flagged = stepped.withColumn("chg",
        when(col("s") === lag(col("s"), 1).over(byMeter), 0).otherwise(1))
      val runs = flagged.withColumn("run_id", sum(col("chg")).over(cum))
      val runagg = runs.groupBy(col("meter_id"), col("run_id"))
        .agg(min(col("s")).as("sign"), count(lit(1)).as("len"),
          min_by(col("d"), col("reading_timestamp")).as("first_d"),
          max_by(col("d"), col("reading_timestamp")).as("last_d"),
          unix_millis(max(col("reading_timestamp"))).as("end_ms"))
      val byRun = Window.partitionBy(col("meter_id")).orderBy(col("run_id"))
      runagg
        .withColumn("prev_last_d", lag(col("last_d"), 1).over(byRun))
        .withColumn("next_sign", lead(col("sign"), 1).over(byRun))
        .withColumn("next_len", lead(col("len"), 1).over(byRun))
        .filter(col("sign") === -1 && col("next_sign") === 1)
        .select(col("meter_id").cast("long").as("meter_id"),
          col("end_ms").as("trough_ms"),
          col("len").as("down_len"), col("next_len").as("up_len"),
          (coalesce(col("prev_last_d"), col("first_d")) - col("last_d"))
            .cast("long").as("depth"))
    },

    // ---- SURVIVAL ANALYSIS: Nelson-Aalen cumulative hazard of
    // time-to-convert (each signup event is a subject; its duration is
    // the hours to the user's NEXT purchase, right-censored at the
    // corpus end when no purchase follows). H(t) = Σ_{t_i ≤ t} d_i/n_i —
    // the large-sample sibling of Kaplan-Meier (S ≈ exp(−H)) chosen
    // because a cumulative SUM of per-step rationals stays exact in
    // floored ppm where KM's cumulative PRODUCT cannot (no exact integer
    // form survives many steps, and float products drift per engine).
    // Censoring is handled exactly as the estimator requires: censored
    // subjects leave the risk set at their censoring time but contribute
    // no event. Shape: the next-purchase lookup is ONE per-user window
    // (bounded by per-user activity), the risk set n(t) = total −
    // exclusive-cumsum over the duration-grouped frame (≤ observation
    // span in hours, domain-bounded), and the final cumulative hazard
    // runs on the ≤|distinct durations| hazard frame — the pmod(…,1)
    // key marks the window bounded-by-construction. The hazard table is
    // what a conversion-SLA dashboard plots; the reference's own churn /
    // time-to-event questions over `dim_customers.account_status` are
    // this operator at meter scale.
    q("survival_nelson_aalen",
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_ns(ts) AS tns
        |  FROM events WHERE event_type IN ('signup', 'purchase')),
        |nx AS (
        |  SELECT event_id, event_type, tns,
        |    MIN(CASE WHEN event_type = 'purchase' THEN tns END) OVER (
        |      PARTITION BY user_id ORDER BY tns, event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_p
        |  FROM e),
        |mx AS (SELECT MAX(epoch_ns(ts)) AS m FROM events),
        |subj AS (
        |  SELECT (COALESCE(next_p, m) - tns) // 3600000000000 AS t,
        |    CASE WHEN next_p IS NOT NULL THEN 1 ELSE 0 END AS churned
        |  FROM nx CROSS JOIN mx WHERE event_type = 'signup'),
        |g AS (SELECT t, COUNT(*) AS c_all, SUM(churned) AS d FROM subj GROUP BY 1),
        |r AS (
        |  SELECT t, d,
        |    (SELECT COUNT(*) FROM subj) - COALESCE(SUM(c_all) OVER (
        |      ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
        |  FROM g)
        |SELECT CAST(t AS BIGINT) AS t_hours, CAST(n AS BIGINT) AS n_at_risk,
        |  CAST(d AS BIGINT) AS d_events,
        |  CAST(d * 1000000 // n AS BIGINT) AS hazard_ppm,
        |  CAST(SUM(d * 1000000 // n) OVER (ORDER BY t) AS BIGINT) AS cumhaz_ppm
        |FROM r WHERE d > 0""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
        .filter(col("event_type").isin("signup", "purchase"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ns"))
      val wNext = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      val nx = e.withColumn("next_p",
        min(when(col("event_type") === "purchase", col("ts_ns"))).over(wNext))
      val mx = Tables.events(s, d).agg(max(col("ts_ns")).as("m"))
      val subj = nx.filter(col("event_type") === "signup")
        .crossJoin(broadcast(mx))
        .select(expr("(coalesce(next_p, m) - ts_ns) div 3600000000000L").as("t"),
          when(col("next_p").isNotNull, 1L).otherwise(0L).as("churned"))
        .localCheckpoint(eager = false) // feeds g and the total count
      val g = subj.groupBy(col("t"))
        .agg(count(lit(1)).as("c_all"), sum(col("churned")).as("d"))
      val tot = subj.agg(count(lit(1)).as("n_subj"))
      // exclusive cumulative count over the ≤|span-hours| duration frame
      val wCum = Window.partitionBy(pmod(col("t"), lit(1L))).orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val r = g.crossJoin(broadcast(tot))
        .withColumn("n", col("n_subj") - coalesce(sum(col("c_all")).over(wCum), lit(0L)))
        .filter(col("d") > 0)
        .withColumn("hazard_ppm", expr("d * 1000000L div n"))
      val wHaz = Window.partitionBy(pmod(col("t"), lit(1L))).orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
      r.select(col("t").as("t_hours"), col("n").as("n_at_risk"),
        col("d").as("d_events"), col("hazard_ppm"),
        sum(col("hazard_ppm")).over(wHaz).as("cumhaz_ppm"))
    })
}
