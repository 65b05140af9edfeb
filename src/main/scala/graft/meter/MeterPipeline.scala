package graft.meter

import graft.GraftQuery
import graft.GraftQuery.q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  private val NIntervalsCbl = 480L // 5 days: 4 baseline days + 1 event day
  private val NIntervalsWx = 2880L // 30 days: a degree-day regression month

  private def billingMartOf(s: SparkSession, stgSlice: DataFrame): DataFrame =
    Marts.factCustomerBillingDaily(stgSlice,
      MeterGen.metersDim(s, NMeters), MeterGen.customers(s, NMeters),
      MeterGen.tariffRates(s))

  /** The staged readings and the day-2 predicate shared by both incremental
    * steps. Staging runs over the FULL reading history (it is itself an
    * incrementally-maintained silver table in a real pipeline), so the
    * day-2 slice's first-interval LAG delta correctly sees day 1's last
    * reading; the mart aggregation then only ever scans the slice. */
  private def stgAndDay2(s: SparkSession): (DataFrame, org.apache.spark.sql.Column) = {
    val stg = Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervals))
    (stg, to_date(col("reading_timestamp")) === date_add(to_date(lit(MeterGen.Epoch)), 1))
  }

  /** Step 1 — the STALE state: a full refresh as of end of day 1 (day-1
    * rows of the mart are identical to the full-history mart's day-1
    * partition because the mart aggregates within billing_date). */
  private[meter] def billingIncrementalInit(s: SparkSession, dir: String): Unit = {
    val (stg, day2) = stgAndDay2(s)
    graft.sources.Store.writeMart(billingMartOf(s, stg.filter(!day2)), dir, "billing_date")
  }

  /** Step 2 — day 2 arrives: rebuild ONLY the touched billing_date
    * partition from the delta slice and dynamically overwrite exactly that
    * directory ([[graft.sources.Store.refreshMartPartitions]]); day-1
    * files are untouched (PipelineSpec asserts byte-level). */
  private[meter] def billingIncrementalDelta(s: SparkSession, dir: String): Unit = {
    val (stg, day2) = stgAndDay2(s)
    graft.sources.Store.refreshMartPartitions(
      billingMartOf(s, stg.filter(day2)), dir, "billing_date")
  }

  /** LATE-DATA INVALIDATION for the incremental mart — the TimescaleDB
    * continuous-aggregate invalidation-log analogue the reference's
    * full-refresh dbt marts sidestep (README.md:137-138): a late-arriving
    * reading marks its mart partitions stale, and ONLY those partitions
    * re-materialize.
    *
    * The invalidation set is DERIVED FROM THE DATA, not a constant
    * closure: a late row stales (a) its OWN day's aggregate, and (b) the
    * day of its SUCCESSOR reading — the one whose LAG delta previously
    * spanned the gap the late row fills. The successor is found by
    * lead() over the touched meters' readings, so when a meter was
    * silent for N days (outage, dead-lettered shard) the successor's day
    * D+N lands in the set exactly because it IS stale — where a constant
    * {day, day+1} rule (correct only under a dense "readings ≤ 1 day
    * apart" cadence) would silently leave D+N's partition wrong.
    * LateDataSpec proves the successor day is NECESSARY (rebuilding the
    * touched day alone leaves it stale — including a multi-day-outage
    * case where the constant day+1 rule provably fails) and SUFFICIENT
    * (post-refresh mart ≡ full recompute, byte-identical untouched
    * partitions).
    *
    * Scale shape: the successor scan is bounded on BOTH axes — a
    * partition-prunable date filter at the batch's min date (pushes to
    * the bronze parquet scan) and a broadcast semi-join on the batch's
    * meter keys — so its cost is O(touched meters' tail), not O(table).
    * Invalidated days come from a |batch|-bounded distinct (driver-side,
    * the invalidation LOG itself); the rebuild aggregates only the
    * invalidated days' staging slice — the LAG staging runs over
    * per-meter windows exactly as the silver table a real pipeline
    * maintains incrementally — and dynamic partition overwrite rewrites
    * exactly |invalidated| directories of a years-deep mart. */
  private[meter] def refreshForLateBatch(s: SparkSession, dir: String,
      fullReadings: DataFrame, lateBatch: DataFrame): Seq[java.sql.Date] = {
    val invalidated = invalidatedDates(s, fullReadings, lateBatch)
    val stg = Staging.stgMeterReadings(fullReadings)
    val slice = stg.filter(
      to_date(col("reading_timestamp")).isin(invalidated.map(_.toString): _*))
    graft.sources.Store.refreshMartPartitions(
      billingMartOf(s, slice), dir, "billing_date")
    invalidated
  }

  /** The invalidation-set DERIVATION shared by the batch repair above and
    * the streaming gold loop's late path
    * ([[graft.streaming.StreamingMarts.startIngestWithMartRefresh]]): a
    * late row stales its own day plus its SUCCESSOR reading's day, found
    * by lead() over `readings` — so multi-day silences put the real
    * successor day (D+N) in the set, where a constant day+1 rule would
    * miss it. The scan is bounded on both axes: a min-date filter
    * (partition-prunable when `readings` carries the bronze
    * `reading_date` column) and a broadcast semi-join on the batch's
    * meter keys. Returns the |batch|-bounded distinct day list,
    * driver-side — the invalidation log itself. */
  private[graft] def invalidatedDates(s: SparkSession, readings: DataFrame,
      lateBatch: DataFrame): Seq[java.sql.Date] = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // only each meter's LAST late row per day can have a successor
    // OUTSIDE its own day: any earlier late row r has a later same-day
    // late row r', so successor(r) is at or before r' in time — same
    // day, already in the touched set. That shrinks the successor
    // lookup from |batch| keys to one per (late meter, day), and lifts
    // the scan's lower bound from the batch's first timestamp to the
    // MINIMUM of those per-meter-day maxima — a forward-moving backfill
    // shard re-windows only the sliver beyond its own batch, not
    // everything it already landed that day.
    val lastPerDay = lateBatch
      .groupBy(col("meter_id"), to_date(col("reading_timestamp")).as("d"))
      .agg(max(col("reading_timestamp")).as("reading_timestamp"))
      .localCheckpoint(eager = false)
    val loRow = lastPerDay.agg(min(col("reading_timestamp")).as("lo")).first()
    if (loRow.isNullAt(0)) return Nil // empty late batch: nothing stale
    val lo = loRow.getTimestamp(0)
    // the date bound is derived IN-QUERY under the session timezone
    // (to_date over the timestamp literal), never via java.sql.Date on the
    // driver: the driver conversion goes through the JVM default timezone,
    // which ahead of UTC rounds the bound UP a day and prunes away the
    // very partition holding the last late row — the successor lookup then
    // finds no match and a stale successor-day partition is silently kept
    val loDate = to_date(lit(lo))
    val dateBound =
      if (readings.columns.contains("reading_date"))
        col("reading_date") >= loDate
      else to_date(col("reading_timestamp")) >= loDate
    val scoped = readings
      .filter(dateBound && col("reading_timestamp") >= lit(lo))
      .join(broadcast(lastPerDay.select("meter_id").distinct()),
        Seq("meter_id"), "left_semi")
      .select(col("meter_id"), col("reading_timestamp"))
    val w = Window.partitionBy(col("meter_id")).orderBy(col("reading_timestamp"))
    val successorDates = scoped
      .withColumn("next_ts", lead(col("reading_timestamp"), 1).over(w))
      .join(lastPerDay.select(col("meter_id"), col("reading_timestamp")),
        Seq("meter_id", "reading_timestamp"))
      .filter(col("next_ts").isNotNull)
      .select(to_date(col("next_ts")).as("d"))
    lateBatch.select(to_date(col("reading_timestamp")).as("d"))
      .unionByName(successorDates)
      .distinct()
      .as[java.sql.Date].collect().toSeq.sortBy(_.toString)
  }

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

    // ---- S1/E14 BINARY twin: the Avro wire round trip — encode through
    // the per-partition avro-core writer, decode + validate through
    // parseAndValidateAvro (same validation filter as the JSON wire),
    // aggregate, and hash against the generator's declarative truth.
    // Oracle-gates the codec the way e14_json_roundtrip gates from_json;
    // STREAMING_LATENCY.md's ingest-avro rows measure the same codec at
    // rate (the deployment lever where JSON rows are parse-bound).
    q("meter_avro_roundtrip",
      s"""WITH ${MeterSql.readingsCtes(NMeters, NIntervals)}
         |SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
         |  CAST(SUM(reading_consumption_milliwatts) AS BIGINT) AS sum_cons
         |FROM readings GROUP BY status""".stripMargin) { (s, _) =>
      val wire = graft.streaming.Ingest.toAvroWire(
        MeterGen.readings(s, NMeters, NIntervals))
      graft.streaming.Ingest.parseAndValidateAvro(wire.select(col("value")))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n"),
          sum(col("reading_consumption_milliwatts")).as("sum_cons"))
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
    },

    // incremental mart maintenance driven END-TO-END through the disk
    // layout — the operator a 100 TB daily pipeline actually runs (the
    // reference full-refreshes both marts on every dbt run): materialize
    // the mart as of day 1, apply day 2 as a partition-scoped rebuild
    // (dynamic overwrite of exactly one billing_date directory), read the
    // mart back. The oracle is the FULL recompute — incremental ≡ full is
    // the hash gate itself.
    q("meter_billing_daily_incremental", MeterSql.billingSql(NMeters, NIntervals)) { (s, _) =>
      val dir = s"${sys.props("java.io.tmpdir")}/graft_mart_inc/${java.util.UUID.randomUUID()}"
      val path = new org.apache.hadoop.fs.Path(dir)
      path.getFileSystem(s.sparkContext.hadoopConfiguration).deleteOnExit(path)
      billingIncrementalInit(s, dir)
      billingIncrementalDelta(s, dir)
      s.read.parquet(dir)
    },

    // late-data invalidation driven END-TO-END: materialize the mart with
    // an afternoon of day-2 readings still in flight (the stale state a
    // full-refresh pipeline would silently serve until its next run),
    // then let the late batch arrive and re-materialize ONLY its
    // invalidated partitions (see refreshForLateBatch — the TimescaleDB
    // invalidation-log analogue). The oracle is the FULL recompute over
    // ALL readings: hash equality proves the invalidation closure healed
    // every stale aggregate — including the LAG deltas the late rows
    // changed for their successors — without a full refresh.
    q("meter_billing_late_refresh", MeterSql.billingSql(NMeters, NIntervals)) { (s, _) =>
      val dir = s"${sys.props("java.io.tmpdir")}/graft_mart_late/${java.util.UUID.randomUUID()}"
      val path = new org.apache.hadoop.fs.Path(dir)
      path.getFileSystem(s.sparkContext.hadoopConfiguration).deleteOnExit(path)
      // one generator pass shared by all four consumers (r15, guide
      // §5-caching): the stale write, the invalidation scan, the rebuild
      // staging, and the late slice each re-ran the generator chain
      val full = MeterGen.readings(s, NMeters, NIntervals)
        .localCheckpoint(eager = false)
      val late = col("meter_id") % 10 === 7 &&
        to_date(col("reading_timestamp")) ===
          date_add(to_date(lit(MeterGen.Epoch)), 1) &&
        hour(col("reading_timestamp")).between(12, 17)
      graft.sources.Store.writeMart(
        billingMartOf(s, Staging.stgMeterReadings(full.filter(!late))),
        dir, "billing_date")
      refreshForLateBatch(s, dir, full, full.filter(late))
      s.read.parquet(dir)
    },

    // ---- run-length encoding of the per-meter status channel — the
    // query-level form of the reference's native columnar compression
    // (SURVEY §2.1 S12 segmentby/orderby: runs only exist because rows are
    // clustered by meter and ordered by time, which is exactly the layout
    // Store.writeChunks enforces on disk). Classic gaps-and-islands: a
    // null-safe change flag (first row of a meter opens run 1), a keyed
    // running sum to number runs, one aggregate to emit (run_start, value,
    // length) triples — the lossless encoded form a telemetry archiver
    // ships. Every window is PARTITION BY meter_id: state per task is one
    // meter's history, nothing global, so the plan is unchanged at 100 TB
    // over meter-bucketed input.
    q("meter_rle_status", {
      s"""WITH ${MeterSql.readingsCtes(NMeters, NIntervals)},
         |flag AS (
         |  SELECT meter_id, reading_timestamp, status,
         |    CASE WHEN lag(status) OVER (PARTITION BY meter_id
         |        ORDER BY reading_timestamp) IS DISTINCT FROM status
         |      THEN 1 ELSE 0 END AS brk
         |  FROM readings),
         |runs AS (
         |  SELECT meter_id, reading_timestamp, status,
         |    SUM(brk) OVER (PARTITION BY meter_id ORDER BY reading_timestamp
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
         |  FROM flag)
         |SELECT meter_id, CAST(run_id AS BIGINT) AS run_id,
         |  MIN(reading_timestamp) AS run_start,
         |  MIN(status) AS status,
         |  CAST(COUNT(*) AS BIGINT) AS run_len
         |FROM runs GROUP BY meter_id, run_id""".stripMargin
    }) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("meter_id")).orderBy(col("reading_timestamp"))
      MeterGen.readings(s, NMeters, NIntervals)
        .select(col("meter_id"), col("reading_timestamp"), col("status"))
        // null-safe change test: the first row's lag is NULL, which must
        // open a run (NULL <=> x is false), hence <=> not =!=
        .withColumn("brk",
          when(lag(col("status"), 1).over(w) <=> col("status"), 0L).otherwise(1L))
        .withColumn("run_id",
          sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("meter_id"), col("run_id"))
        .agg(min(col("reading_timestamp")).as("run_start"),
          min(col("status")).as("status"),
          count(lit(1)).as("run_len"))
    },

    // ---- PEAK COINCIDENCE analysis — the demand-side question utilities
    // actually bill on (capacity charges key on each customer's load AT
    // the system peak, not their own peak): find the system peak hour,
    // attribute it, and report each meter's share of the peak plus its
    // coincidence factor (load-at-system-peak / own-peak — a meter whose
    // habits avoid the system peak has a low factor even with high own
    // load; demand-response targets the high ones). Shape: ONE staged
    // pass → (meter, hour) agg; the system rollup re-aggregates that
    // frame (≪ readings); the peak hour is a 1-row
    // TakeOrderedAndProject broadcast joined back on the hour key; the
    // own-peak max reuses the same (meter, hour) frame. Exact integer
    // milliwatts end-to-end, ppm shares by integer division; DuckDB's
    // `//` truncates toward zero exactly like Spark div on all integers
    // (MeterDomainSpec pins -7 div 2 = -3 on both engines), and the
    // GREATEST clamps additionally keep every operand nonnegative as a
    // domain guard (shares are defined on nonnegative loads), with
    // denominators floored at 1.
    q("meter_peak_coincidence", {
      s"""WITH ${MeterSql.stagingCtes(NMeters, NIntervals)},
         |mh AS (
         |  SELECT meter_id, date_trunc('hour', reading_timestamp) AS h,
         |    CAST(SUM(consumption_delta_mwh) AS BIGINT) AS load
         |  FROM stg GROUP BY 1, 2),
         |sys AS (SELECT h, CAST(SUM(load) AS BIGINT) AS sys_load FROM mh GROUP BY 1),
         |peak AS (SELECT h, sys_load FROM sys ORDER BY sys_load DESC, h LIMIT 1),
         |own AS (SELECT meter_id, CAST(MAX(load) AS BIGINT) AS own_peak
         |        FROM mh GROUP BY 1)
         |SELECT mh.meter_id, mh.load AS peak_hour_load, o.own_peak,
         |  CAST(GREATEST(mh.load, 0) * 1000000 // GREATEST(p.sys_load, 1) AS BIGINT) AS share_ppm,
         |  CAST(GREATEST(mh.load, 0) * 1000000 // GREATEST(o.own_peak, 1) AS BIGINT) AS coincidence_ppm
         |FROM mh JOIN peak p ON mh.h = p.h
         |JOIN own o ON o.meter_id = mh.meter_id
         |ORDER BY share_ppm DESC, mh.meter_id LIMIT 20""".stripMargin
    }) { (s, _) =>
      val stg = Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervals))
      val mh = stg
        .groupBy(col("meter_id"),
          date_trunc("hour", col("reading_timestamp")).as("h"))
        .agg(sum(col("consumption_delta_mwh")).as("load"))
        // reused by the system rollup, the peak probe, and the own-peak max
        .localCheckpoint(eager = false)
      val peak = broadcast(
        mh.groupBy(col("h")).agg(sum(col("load")).as("sys_load"))
          .orderBy(col("sys_load").desc, col("h"))
          .limit(1))
      val own = mh.groupBy(col("meter_id")).agg(max(col("load")).as("own_peak"))
      mh.join(peak, "h")
        .join(own, "meter_id")
        .select(col("meter_id"), col("load").as("peak_hour_load"), col("own_peak"),
          expr("greatest(load, 0L) * 1000000L div greatest(sys_load, 1L)").as("share_ppm"),
          expr("greatest(load, 0L) * 1000000L div greatest(own_peak, 1L)").as("coincidence_ppm"))
        .orderBy(col("share_ppm").desc, col("meter_id"))
        .limit(20)
    },

    // ---- VEE (Validation-Estimation-Editing) — the regulatory meter-data
    // workflow every utility MDM runs before billing (the reference stops
    // at is_error flags; VEE is what consumes them): VALIDATE each
    // interval (error status or a negative delta = counter reset),
    // ESTIMATE flagged intervals from the meter's own valid same-hour
    // profile (the standard "like-day" substitution, here the integer
    // floor-mean over valid deltas in the same hour-of-day slot), and
    // EDIT with an audit trail — per meter: how many intervals were
    // estimated and the exact billing impact (raw vs VEE'd totals).
    // Shape: the LAG staging pass (meter-keyed window), ONE (meter, slot)
    // aggregate joined back on its own key (the seasonal-baseline
    // doctrine — never a second scan), map-side CASE substitution, one
    // final per-meter rollup. Slots with no valid reading fall back to 0
    // (E12 guard on the data-derived mean, identical in both twins).
    q("meter_vee_estimates", {
      s"""WITH ${MeterSql.stagingCtes(NMeters, NIntervals)},
         |flagged AS (
         |  SELECT meter_id, reading_timestamp,
         |    CAST(extract(hour FROM reading_timestamp) AS BIGINT) AS h,
         |    consumption_delta_mwh AS d,
         |    (status = 'R' OR consumption_delta_mwh < 0) AS invalid
         |  FROM stg),
         |slot AS (
         |  SELECT meter_id, h,
         |    CAST(SUM(d) // COUNT(*) AS BIGINT) AS slot_mean
         |  FROM flagged WHERE NOT invalid GROUP BY 1, 2),
         |vee AS (
         |  SELECT f.meter_id, f.invalid, f.d,
         |    CASE WHEN f.invalid THEN COALESCE(s.slot_mean, 0) ELSE f.d END AS d_est
         |  FROM flagged f LEFT JOIN slot s
         |    ON s.meter_id = f.meter_id AND s.h = f.h)
         |SELECT meter_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_intervals,
         |  CAST(SUM(CASE WHEN invalid THEN 1 ELSE 0 END) AS BIGINT) AS n_estimated,
         |  CAST(SUM(d) AS BIGINT) AS raw_mwh,
         |  CAST(SUM(d_est) AS BIGINT) AS vee_mwh
         |FROM vee GROUP BY 1""".stripMargin
    }) { (s, _) =>
      val flagged = Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervals))
        .select(col("meter_id"), col("reading_timestamp"),
          hour(col("reading_timestamp")).cast("long").as("h"),
          col("consumption_delta_mwh").as("d"),
          (col("status") === "R" || col("consumption_delta_mwh") < 0).as("invalid"))
        // feeds both the valid-profile aggregate and the substitution pass
        .localCheckpoint(eager = false)
      val slot = flagged.filter(!col("invalid"))
        .groupBy(col("meter_id"), col("h"))
        .agg(expr("sum(d) div count(1)").as("slot_mean"))
      flagged
        .join(slot, Seq("meter_id", "h"), "left")
        .select(col("meter_id"), col("invalid"), col("d"),
          when(col("invalid"), coalesce(col("slot_mean"), lit(0L)))
            .otherwise(col("d")).as("d_est"))
        .groupBy(col("meter_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(when(col("invalid"), 1L).otherwise(0L)).as("n_estimated"),
          sum(col("d")).as("raw_mwh"),
          sum(col("d_est")).as("vee_mwh"))
    },

    // ---- DEMAND CHARGE — the other half of a utility bill: commercial
    // tariffs bill the PEAK interval (billing demand), not just energy.
    // Per (meter, billing day): the max 15-min delta, WHICH interval it
    // was (argmax, deterministically tie-broken by timestamp), and the
    // charge in exact cents (1.2¢ per 1000 mwh of peak; negative deltas
    // — counter resets — are not billable demand, hence the greatest()
    // clamp, which also keeps the floor division on nonnegative ground
    // where DuckDB `//` ≡ Spark `div`). Shape: ONE row_number window
    // whose partition is a meter-day (≤96 rows — bounded state however
    // large the fleet); no global window, no second scan.
    q("meter_demand_charge", {
      s"""WITH ${MeterSql.stagingCtes(NMeters, NIntervals)},
         |iv AS (
         |  SELECT meter_id, CAST(reading_timestamp AS DATE) AS billing_date,
         |    reading_timestamp AS ts, CAST(consumption_delta_mwh AS BIGINT) AS d
         |  FROM stg),
         |rk AS (
         |  SELECT meter_id, billing_date, ts, d,
         |    row_number() OVER (PARTITION BY meter_id, billing_date
         |                       ORDER BY d DESC, ts) AS rn
         |  FROM iv)
         |SELECT meter_id, billing_date, d AS max_interval_mwh,
         |  ts AS peak_interval_ts,
         |  CAST(GREATEST(d, 0) * 12 // 1000 AS BIGINT) AS demand_charge_c
         |FROM rk WHERE rn = 1""".stripMargin
    }) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("meter_id"), col("billing_date"))
        .orderBy(col("d").desc, col("ts"))
      Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervals))
        .select(col("meter_id"), to_date(col("reading_timestamp")).as("billing_date"),
          col("reading_timestamp").as("ts"),
          col("consumption_delta_mwh").cast("long").as("d"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("meter_id"), col("billing_date"),
          col("d").as("max_interval_mwh"), col("ts").as("peak_interval_ts"),
          expr("greatest(d, 0L) * 12L div 1000L").as("demand_charge_c"))
    },

    // ---- LOAD DURATION CURVE — capacity planning's standard artifact:
    // system hourly load ranked descending, with exceedance probability
    // (what fraction of hours load is at least this high) and cumulative
    // energy share. The windows here ARE global — but over the HOURLY
    // frame the readings already collapsed into (48 rows at test size,
    // 8,760/year at any fleet size): the corpus pays one map-side-
    // combinable aggregate, and only the tiny hour frame is sorted —
    // the a_exact_median_banded doctrine applied to capacity analytics.
    q("meter_load_duration", {
      s"""WITH ${MeterSql.stagingCtes(NMeters, NIntervals)},
         |hr AS (
         |  SELECT date_trunc('hour', reading_timestamp) AS h,
         |    CAST(SUM(consumption_delta_mwh) AS BIGINT) AS sys_load
         |  FROM stg GROUP BY 1),
         |tot AS (SELECT CAST(SUM(sys_load) AS BIGINT) AS total,
         |               CAST(COUNT(*) AS BIGINT) AS n FROM hr),
         |rk AS (
         |  SELECT h, sys_load,
         |    CAST(row_number() OVER (ORDER BY sys_load DESC, h) AS BIGINT) AS rank,
         |    CAST(SUM(sys_load) OVER (ORDER BY sys_load DESC, h
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_load
         |  FROM hr)
         |SELECT rank, h, sys_load,
         |  CAST(rank * 1000000 // t.n AS BIGINT) AS exceedance_ppm,
         |  CAST(cum_load * 1000000 // t.total AS BIGINT) AS cum_share_ppm
         |FROM rk, tot t""".stripMargin
    }) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val hr = Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervals))
        .groupBy(date_trunc("hour", col("reading_timestamp")).as("h"))
        .agg(sum(col("consumption_delta_mwh")).cast("long").as("sys_load"))
        .localCheckpoint(eager = false) // feeds the rank window and the 1-row total
      // single-task BY DESIGN on the collapsed hourly frame; pmod(…,1) is
      // the repo's non-foldable constant key so the bare-global-window
      // warning tripwire stays reserved for real regressions
      val w = Window.partitionBy(pmod(col("sys_load"), lit(1L)))
        .orderBy(col("sys_load").desc, col("h"))
      val tot = broadcast(hr.agg(sum(col("sys_load")).as("total"),
        count(lit(1)).as("n")))
      hr.withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("cum_load",
          sum(col("sys_load")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(tot)
        .select(col("rank"), col("h"), col("sys_load"),
          expr("rank * 1000000L div n").as("exceedance_ppm"),
          expr("cum_load * 1000000L div total").as("cum_share_ppm"))
    },

    // ---- CBL (customer baseline load) — demand-response settlement:
    // on the event day, each meter's counterfactual is the mean of its
    // own same-quarter-hour load over the prior baseline days (the
    // CAISO/PJM "X-of-Y like-day" method, here 4-of-4 over valid
    // intervals only, so every division stays on nonnegative integers).
    // Shape: the staged/validated frame is computed ONCE and feeds both
    // the baseline aggregate and the event-day slice; the event day is a
    // 1-row broadcast (scalar-subquery idiom); the baseline joins back
    // on its own (meter, slot) key; usage-vs-baseline in exact ppm.
    q("meter_baseline_cbl", {
      s"""WITH ${MeterSql.stagingCtes(NMeters, NIntervalsCbl)},
         |iv AS (
         |  SELECT meter_id, CAST(reading_timestamp AS DATE) AS d,
         |    CAST(extract(hour FROM reading_timestamp) * 4
         |       + extract(minute FROM reading_timestamp) // 15 AS BIGINT) AS slot,
         |    CAST(consumption_delta_mwh AS BIGINT) AS load
         |  FROM stg
         |  WHERE NOT (status = 'R' OR consumption_delta_mwh < 0)),
         |ev_day AS (SELECT MAX(d) AS event_day FROM iv),
         |base AS (
         |  SELECT meter_id, slot,
         |    CAST(SUM(load) // COUNT(*) AS BIGINT) AS cbl
         |  FROM iv, ev_day WHERE d < event_day GROUP BY 1, 2),
         |ev AS (SELECT meter_id, slot, load FROM iv, ev_day WHERE d = event_day)
         |SELECT e.meter_id,
         |  CAST(SUM(e.load) AS BIGINT) AS actual_mwh,
         |  CAST(SUM(COALESCE(b.cbl, 0)) AS BIGINT) AS baseline_mwh,
         |  CAST(SUM(e.load) * 1000000 // GREATEST(SUM(COALESCE(b.cbl, 0)), 1) AS BIGINT)
         |    AS usage_vs_baseline_ppm
         |FROM ev e LEFT JOIN base b ON b.meter_id = e.meter_id AND b.slot = e.slot
         |GROUP BY 1""".stripMargin
    }) { (s, _) =>
      val iv = Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervalsCbl))
        .filter(!(col("status") === "R" || col("consumption_delta_mwh") < 0))
        .select(col("meter_id"), to_date(col("reading_timestamp")).as("d"),
          (hour(col("reading_timestamp")) * 4
            + expr("minute(reading_timestamp) div 15")).cast("long").as("slot"),
          col("consumption_delta_mwh").cast("long").as("load"))
        .localCheckpoint(eager = false) // feeds both the baseline agg and the event slice
      val evDay = broadcast(iv.agg(max(col("d")).as("event_day")))
      val base = iv.crossJoin(evDay).filter(col("d") < col("event_day"))
        .groupBy(col("meter_id"), col("slot"))
        .agg(expr("sum(load) div count(1)").as("cbl"))
      iv.crossJoin(evDay).filter(col("d") === col("event_day"))
        .join(base, Seq("meter_id", "slot"), "left")
        .groupBy(col("meter_id"))
        .agg(sum(col("load")).as("actual_mwh"),
          sum(coalesce(col("cbl"), lit(0L))).as("baseline_mwh"))
        .select(col("meter_id"), col("actual_mwh"), col("baseline_mwh"),
          expr("actual_mwh * 1000000L div greatest(baseline_mwh, 1L)")
            .as("usage_vs_baseline_ppm"))
    },

    // ---- PEER PERCENTILE — the home-energy-report comparison (the
    // Opower product shape): each meter's daily usage ranked within its
    // own grid zone's peer group, as an exact percent-rank in ppm
    // ((rank−1)·1e6 // (n−1): 0 = lightest user among peers, 1e6 =
    // heaviest; deterministic meter_id tie-break). Shape: one
    // (meter, day) aggregate, the zone broadcast dim join, then rank +
    // count windows partitioned by (zone, day) — state bounded by
    // meters-per-zone at any fleet size; no global window. The E12
    // greatest() guard covers a one-meter zone.
    q("meter_peer_percentile", {
      s"""WITH ${MeterSql.stagingCtes(NMeters, NIntervals)},
         |${MeterSql.metersCte(NMeters)},
         |md AS (
         |  SELECT s.meter_id, m.grid_zone_id AS zone,
         |    CAST(s.reading_timestamp AS DATE) AS d,
         |    CAST(SUM(s.consumption_delta_mwh) AS BIGINT) AS daily_mwh
         |  FROM stg s JOIN meters m ON m.meter_id = s.meter_id
         |  GROUP BY 1, 2, 3),
         |rk AS (
         |  SELECT meter_id, zone, d, daily_mwh,
         |    CAST(row_number() OVER (PARTITION BY zone, d
         |      ORDER BY daily_mwh, meter_id) AS BIGINT) AS rank,
         |    CAST(COUNT(*) OVER (PARTITION BY zone, d) AS BIGINT) AS n_peers
         |  FROM md)
         |SELECT CAST(meter_id AS BIGINT) AS meter_id, CAST(zone AS BIGINT) AS zone,
         |  d, daily_mwh, rank, n_peers,
         |  CAST((rank - 1) * 1000000 // GREATEST(n_peers - 1, 1) AS BIGINT) AS pctile_ppm
         |FROM rk""".stripMargin
    }) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val byPeers = Window.partitionBy(col("zone"), col("d"))
      Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervals))
        .join(broadcast(MeterGen.metersDim(s, NMeters)
          .select(col("meter_id"), col("grid_zone_id").as("zone"))), "meter_id")
        .groupBy(col("meter_id"), col("zone"), to_date(col("reading_timestamp")).as("d"))
        .agg(sum(col("consumption_delta_mwh")).cast("long").as("daily_mwh"))
        .withColumn("rank",
          row_number().over(byPeers.orderBy(col("daily_mwh"), col("meter_id"))).cast("long"))
        .withColumn("n_peers", count(lit(1)).over(byPeers).cast("long"))
        .select(col("meter_id").cast("long").as("meter_id"),
          col("zone").cast("long").as("zone"), col("d"), col("daily_mwh"),
          col("rank"), col("n_peers"),
          expr("(rank - 1) * 1000000L div greatest(n_peers - 1, 1L)").as("pctile_ppm"))
    },

    // ---- FORECAST BACKTEST — day-ahead load forecasting evaluated the
    // way forecasters actually score it: the SEASONAL-NAIVE (persistence)
    // forecast — tomorrow's load in each quarter-hour slot = today's load
    // in the same slot — backtested against realized actuals across the
    // history, with per-meter WAPE (weighted absolute percentage error,
    // the utility-standard metric that, unlike MAPE, has no per-interval
    // zero-division), absolute-error mass, and signed bias. Persistence
    // is THE baseline every forecasting paper must beat; shipping its
    // backtest makes any model's skill measurable. Shape: one
    // (meter, slot)-keyed LAG window ordered by day (state bounded by
    // days-per-meter at any fleet size — never a global window), then one
    // map-side-combinable per-meter rollup. Exact BIGINT sums; the one
    // division is floor-by-positive. NOTE the greatest() denominator caps
    // the metric at min(WAPE, 100%) = 1e6 ppm for EVERY meter whose error
    // mass exceeds its actual mass (not only the zero-actual case) — hence
    // the column is named wape_capped_ppm, and the exact numerator
    // (abs_err_mwh) and denominator (actual_mwh) are emitted alongside so
    // the uncapped ratio stays recoverable downstream.
    q("meter_forecast_backtest", {
      s"""WITH ${MeterSql.stagingCtes(NMeters, NIntervalsCbl)},
         |iv AS (
         |  SELECT meter_id, CAST(reading_timestamp AS DATE) AS d,
         |    CAST(extract(hour FROM reading_timestamp) * 4
         |       + extract(minute FROM reading_timestamp) // 15 AS BIGINT) AS slot,
         |    CAST(consumption_delta_mwh AS BIGINT) AS a
         |  FROM stg),
         |fc AS (
         |  SELECT meter_id, d, slot, a,
         |    lag(a) OVER (PARTITION BY meter_id, slot ORDER BY d) AS f
         |  FROM iv)
         |SELECT CAST(meter_id AS BIGINT) AS meter_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_intervals,
         |  CAST(SUM(ABS(a - f)) AS BIGINT) AS abs_err_mwh,
         |  CAST(SUM(a - f) AS BIGINT) AS bias_mwh,
         |  CAST(SUM(a) AS BIGINT) AS actual_mwh,
         |  CAST(SUM(ABS(a - f)) * 1000000 // GREATEST(SUM(a), SUM(ABS(a - f)), 1) AS BIGINT)
         |    AS wape_capped_ppm
         |FROM fc WHERE f IS NOT NULL
         |GROUP BY 1""".stripMargin
    }) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val bySlot = Window.partitionBy(col("meter_id"), col("slot")).orderBy(col("d"))
      Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervalsCbl))
        .select(col("meter_id"), to_date(col("reading_timestamp")).as("d"),
          (hour(col("reading_timestamp")) * 4
            + expr("minute(reading_timestamp) div 15")).cast("long").as("slot"),
          col("consumption_delta_mwh").cast("long").as("a"))
        .withColumn("f", lag(col("a"), 1).over(bySlot))
        .filter(col("f").isNotNull)
        .groupBy(col("meter_id").cast("long").as("meter_id"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(abs(col("a") - col("f"))).as("abs_err_mwh"),
          sum(col("a") - col("f")).as("bias_mwh"),
          sum(col("a")).as("actual_mwh"))
        .select(col("meter_id"), col("n_intervals"), col("abs_err_mwh"),
          col("bias_mwh"), col("actual_mwh"),
          expr("abs_err_mwh * 1000000L div greatest(actual_mwh, abs_err_mwh, 1L)")
            .as("wape_capped_ppm"))
    },

    // ---- SPLIT-CONFORMAL PREDICTION INTERVALS on the seasonal-naive
    // forecast (Vovk et al.; Lei et al., JASA 2018): calibrate per meter
    // on days 2-3 of the backtest frame — qhat = the
    // ceil(0.8·(n_cal+1))-th smallest |error| (the finite-sample (n+1)
    // correction that makes split conformal's ≥80% coverage guarantee
    // exact under exchangeability) — then measure empirical coverage of
    // a ± qhat on the held-out days 4-5. Completes the forecasting
    // story: backtest scores the point forecast, conformal turns it into
    // a calibrated interval with a distribution-free guarantee. All
    // integer: errors are BIGINT mWh, the quantile is a rank pick
    // (per-meter window bounded by calibration rows = days × 96 slots),
    // coverage is floored ppm. Shape: ONE staging pass feeds both
    // splits; the rank window partitions by meter; the coverage join is
    // per-meter against a 1-row-per-meter qhat frame.
    q("meter_forecast_conformal", {
      s"""WITH ${MeterSql.stagingCtes(NMeters, NIntervalsCbl)},
         |iv AS (
         |  SELECT meter_id, CAST(reading_timestamp AS DATE) AS d,
         |    CAST(extract(hour FROM reading_timestamp) * 4
         |       + extract(minute FROM reading_timestamp) // 15 AS BIGINT) AS slot,
         |    CAST(consumption_delta_mwh AS BIGINT) AS a
         |  FROM stg),
         |fc AS (
         |  SELECT meter_id, d, slot, a,
         |    lag(a) OVER (PARTITION BY meter_id, slot ORDER BY d) AS f
         |  FROM iv),
         |err AS (
         |  SELECT meter_id, d, slot, ABS(a - f) AS e
         |  FROM fc WHERE f IS NOT NULL),
         |dmin AS (SELECT MIN(d) AS d0 FROM err),
         |cal AS (
         |  SELECT e.*, row_number() OVER (
         |      PARTITION BY e.meter_id ORDER BY e.e, e.d, e.slot) AS rn
         |  FROM err e CROSS JOIN dmin WHERE e.d < d0 + 2),
         |qh AS (
         |  SELECT c.meter_id, MAX(n.n_cal) AS n_cal,
         |    MAX(CASE WHEN c.rn = (4 * (n.n_cal + 1) + 4) // 5 THEN c.e END)
         |      AS qhat_mwh
         |  FROM cal c JOIN (SELECT meter_id, COUNT(*) AS n_cal FROM cal
         |    GROUP BY 1) n ON n.meter_id = c.meter_id
         |  GROUP BY 1),
         |tst AS (
         |  SELECT e.* FROM err e CROSS JOIN dmin WHERE e.d >= d0 + 2)
         |SELECT CAST(t.meter_id AS BIGINT) AS meter_id,
         |  CAST(q.n_cal AS BIGINT) AS n_cal,
         |  CAST(q.qhat_mwh AS BIGINT) AS qhat_mwh,
         |  CAST(COUNT(*) AS BIGINT) AS n_test,
         |  CAST(SUM(CASE WHEN t.e <= q.qhat_mwh THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_covered,
         |  CAST(SUM(CASE WHEN t.e <= q.qhat_mwh THEN 1 ELSE 0 END) * 1000000
         |    // COUNT(*) AS BIGINT) AS coverage_ppm
         |FROM tst t JOIN qh q ON q.meter_id = t.meter_id
         |GROUP BY 1, 2, 3""".stripMargin
    }) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val bySlot = Window.partitionBy(col("meter_id"), col("slot")).orderBy(col("d"))
      val err = Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervalsCbl))
        .select(col("meter_id"), to_date(col("reading_timestamp")).as("d"),
          (hour(col("reading_timestamp")) * 4
            + expr("minute(reading_timestamp) div 15")).cast("long").as("slot"),
          col("consumption_delta_mwh").cast("long").as("a"))
        .withColumn("f", lag(col("a"), 1).over(bySlot))
        .filter(col("f").isNotNull)
        .select(col("meter_id"), col("d"), col("slot"),
          abs(col("a") - col("f")).as("e"))
        .localCheckpoint(eager = false) // feeds both splits
      val dmin = err.agg(min(col("d")).as("d0"))
      val withSplit = err.crossJoin(broadcast(dmin))
      val cal = withSplit.filter(col("d") < date_add(col("d0"), 2))
        .withColumn("rn", row_number().over(Window.partitionBy(col("meter_id"))
          .orderBy(col("e"), col("d"), col("slot"))))
      val nCal = cal.groupBy(col("meter_id")).agg(count(lit(1)).as("n_cal"))
      val qh = cal.join(nCal, "meter_id")
        .groupBy(col("meter_id"))
        .agg(max(col("n_cal")).as("n_cal"),
          max(when(col("rn") === expr("(4 * (n_cal + 1) + 4) div 5"), col("e")))
            .as("qhat_mwh"))
      withSplit.filter(col("d") >= date_add(col("d0"), 2))
        .join(qh, "meter_id")
        .groupBy(col("meter_id").cast("long").as("meter_id"),
          col("n_cal"), col("qhat_mwh"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("e") <= col("qhat_mwh"), 1L).otherwise(0L)).as("n_covered"))
        .select(col("meter_id"), col("n_cal"), col("qhat_mwh"), col("n_test"),
          col("n_covered"),
          expr("n_covered * 1000000L div n_test").as("coverage_ppm"))
    },

    // ---- DISTRIBUTION LOSS ALLOCATION (UFE settlement) — the energy a
    // feeder injects always exceeds what its meters record (technical
    // losses); settlement allocates that unaccounted-for energy back to
    // meters pro-rata by consumption, and the books must balance EXACTLY
    // (allocated integer units must sum to the loss, no fractional
    // remainder). Feeder input is modeled as the metered zone-hour total
    // grossed up 6% in integer floor arithmetic (the deterministic
    // stand-in for the injection register this corpus lacks). The
    // pro-rata split uses the LARGEST-REMAINDER method: base share
    // loss·c//M, then the remainder units go +1 each to the meters with
    // the largest residue loss·c mod M (tie-broken by meter_id) — the
    // exact-cents discipline (E10) applied to energy. Shape: staging →
    // one (zone, hour, meter) aggregate; ranking and the balance windows
    // partition by (zone, hour) — state bounded by meters-per-feeder at
    // ANY fleet size; final rollup is per meter. All operands provably
    // nonneg ⇒ DuckDB // and % ≡ Spark div and %.
    q("meter_loss_allocation", {
      s"""WITH ${MeterSql.stagingCtes(NMeters, NIntervals)},
         |${MeterSql.metersCte(NMeters)},
         |mzh AS (
         |  SELECT m.grid_zone_id AS zone, date_trunc('hour', s.reading_timestamp) AS h,
         |    s.meter_id, CAST(SUM(GREATEST(s.consumption_delta_mwh, 0)) AS BIGINT) AS c
         |  FROM stg s JOIN meters m ON m.meter_id = s.meter_id
         |  GROUP BY 1, 2, 3),
         |zh AS (
         |  SELECT zone, h, CAST(SUM(c) AS BIGINT) AS metered,
         |    CAST(SUM(c) * 106 // 100 - SUM(c) AS BIGINT) AS loss
         |  FROM mzh GROUP BY 1, 2),
         |alloc AS (
         |  SELECT mz.zone, mz.h, mz.meter_id, mz.c, z.loss,
         |    CAST(z.loss * mz.c // z.metered AS BIGINT) AS base,
         |    row_number() OVER (PARTITION BY mz.zone, mz.h
         |      ORDER BY z.loss * mz.c % z.metered DESC, mz.meter_id) AS rn
         |  FROM mzh mz JOIN zh z ON z.zone = mz.zone AND z.h = mz.h
         |  WHERE z.metered > 0),
         |final AS (
         |  SELECT zone, h, meter_id, c,
         |    base + CASE WHEN rn <= loss - SUM(base) OVER (PARTITION BY zone, h)
         |                THEN 1 ELSE 0 END AS alloc
         |  FROM alloc)
         |SELECT CAST(meter_id AS BIGINT) AS meter_id,
         |  CAST(MIN(zone) AS BIGINT) AS zone,
         |  CAST(COUNT(*) AS BIGINT) AS n_hours,
         |  CAST(SUM(c) AS BIGINT) AS metered_mwh,
         |  CAST(SUM(alloc) AS BIGINT) AS loss_alloc_mwh
         |FROM final GROUP BY 1""".stripMargin
    }) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val mzh = Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervals))
        .join(broadcast(MeterGen.metersDim(s, NMeters)
          .select(col("meter_id"), col("grid_zone_id").as("zone"))), "meter_id")
        .groupBy(col("zone"), date_trunc("hour", col("reading_timestamp")).as("h"),
          col("meter_id"))
        .agg(sum(greatest(col("consumption_delta_mwh"), lit(0L))).cast("long").as("c"))
        .localCheckpoint(eager = false) // feeds both the feeder rollup and the split
      val zh = mzh.groupBy(col("zone"), col("h"))
        .agg(sum(col("c")).as("metered"),
          expr("sum(c) * 106L div 100L - sum(c)").as("loss"))
      val byFeeder = Window.partitionBy(col("zone"), col("h"))
      mzh.join(zh, Seq("zone", "h"))
        .filter(col("metered") > 0)
        .withColumn("base", expr("loss * c div metered"))
        .withColumn("rn", row_number().over(
          byFeeder.orderBy(expr("loss * c % metered").desc, col("meter_id"))))
        .withColumn("alloc", col("base")
          + when(col("rn") <= col("loss") - sum(col("base")).over(byFeeder), 1L)
            .otherwise(0L))
        .groupBy(col("meter_id").cast("long").as("meter_id"))
        .agg(min(col("zone")).cast("long").as("zone"),
          count(lit(1)).as("n_hours"),
          sum(col("c")).as("metered_mwh"),
          sum(col("alloc")).as("loss_alloc_mwh"))
    },

    // ---- ZONE LOAD-PROFILE CORRELATION — grid ops' similarity matrix:
    // Pearson correlation of hourly load shapes for every zone pair,
    // the input to zone clustering / transfer planning (which feeders
    // move together?). The corpus pays ONE (zone, hour) aggregate; the
    // pair join runs on the collapsed hour frame (|zones|²/2 pairs ×
    // hours — tiny at any fleet size, the load-duration doctrine). All
    // five moments accumulate as exact BIGINTs on kilo-scaled loads
    // (products bounded ≪ 2^63); the correlation itself is ONE final
    // IEEE expression over exactly-equal integers (casts exact below
    // 2^53, sqrt correctly rounded on both engines ⇒ bit-equal, the
    // a_trend_slope_per_meter doctrine). Constant series are excluded by
    // the zero-variance guard in BOTH twins (E12). The kilo-scaling is
    // plain Spark `div`, which matches DuckDB's integer `//` on ALL
    // integers: both TRUNCATE toward zero (-7 // 2 = -3 in DuckDB, same
    // as Spark -7 div 2 — pinned by MeterDomainSpec's negative-operand
    // division case), so negative hourly sums (counter resets) agree too.
    q("meter_zone_profile_corr", {
      s"""WITH ${MeterSql.stagingCtes(NMeters, NIntervals)},
         |${MeterSql.metersCte(NMeters)},
         |zh AS (
         |  SELECT m.grid_zone_id AS zone, date_trunc('hour', s.reading_timestamp) AS h,
         |    CAST(SUM(s.consumption_delta_mwh) // 1000 AS BIGINT) AS load_k
         |  FROM stg s JOIN meters m ON m.meter_id = s.meter_id
         |  GROUP BY 1, 2),
         |mo AS (
         |  SELECT a.zone AS zone_a, b.zone AS zone_b, COUNT(*) AS n,
         |    SUM(a.load_k) AS sx, SUM(b.load_k) AS sy,
         |    SUM(a.load_k * b.load_k) AS sxy,
         |    SUM(a.load_k * a.load_k) AS sxx,
         |    SUM(b.load_k * b.load_k) AS syy
         |  FROM zh a JOIN zh b ON a.h = b.h AND a.zone < b.zone
         |  GROUP BY 1, 2)
         |SELECT CAST(zone_a AS BIGINT) AS zone_a, CAST(zone_b AS BIGINT) AS zone_b,
         |  CAST(n AS BIGINT) AS n_hours,
         |  CAST(n * sxy - sx * sy AS BIGINT) AS corr_num,
         |  CAST(n * sxy - sx * sy AS DOUBLE)
         |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
         |       * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr
         |FROM mo WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0""".stripMargin
    }) { (s, _) =>
      val zh = Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervals))
        .join(broadcast(MeterGen.metersDim(s, NMeters)
          .select(col("meter_id"), col("grid_zone_id").as("zone"))), "meter_id")
        .groupBy(col("zone"), date_trunc("hour", col("reading_timestamp")).as("h"))
        .agg(expr("sum(consumption_delta_mwh) div 1000L").as("load_k"))
        .localCheckpoint(eager = false) // both sides of the pair join
      val a = zh.select(col("zone").as("zone_a"), col("h"), col("load_k").as("x"))
      val b = zh.select(col("zone").as("zone_b"), col("h"), col("load_k").as("y"))
      a.join(b, Seq("h")).filter(col("zone_a") < col("zone_b"))
        .groupBy(col("zone_a").cast("long").as("zone_a"),
          col("zone_b").cast("long").as("zone_b"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .filter(expr("n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"))
        .select(col("zone_a"), col("zone_b"), col("n").as("n_hours"),
          expr("n * sxy - sx * sy").as("corr_num"),
          (expr("cast(n * sxy - sx * sy as double)")
            / (sqrt(expr("cast(n * sxx - sx * sx as double)"))
               * sqrt(expr("cast(n * syy - sy * sy as double)")))).as("corr"))
    },

    // ---- WEATHER NORMALIZATION (PRISM, Fels 1986, Energy & Buildings 9;
    // the utility-standard degree-day regression behind every
    // energy-efficiency program evaluation): regress each meter's daily
    // consumption on heating degree-days over a 30-day window, yielding
    // the weather-sensitive slope (mWh per degree-day) and the
    // weather-independent base intercept. Daily temperature derives from
    // the same md5 hash family as every other synthetic input, so both
    // engines see the identical weather series without any weather table.
    // All arithmetic is the Pearson-moment discipline
    // (`meter_zone_profile_corr`): five exact-BIGINT sums per meter, then
    // ONE integer division per coefficient — plain Spark `div`, because
    // DuckDB's integer-integer `//` TRUNCATES toward zero exactly like
    // div (measured in r7; numerators here go negative on weather-
    // insensitive meters, so the direction matters). Scale shape: one staged pass →
    // per-(meter, day) aggregate (windows bounded by 96 rows/meter-day
    // upstream in staging), a broadcast join against the ≤31-row weather
    // frame, and a map-side-combinable per-meter moment aggregate — no
    // corpus-wide shuffle beyond the daily rollup.
    q("meter_weather_normalize", {
      s"""WITH ${MeterSql.stagingCtes(NMeters, NIntervalsWx)},
         |day AS (
         |  SELECT meter_id, CAST(reading_timestamp AS DATE) AS d,
         |    CAST(SUM(GREATEST(consumption_delta_mwh, 0)) AS BIGINT) AS y
         |  FROM stg GROUP BY 1, 2),
         |wx AS (
         |  SELECT d, GREATEST(18 - (${graft.llm.TextHash.h64Sql("'wx:v1:' || CAST(d AS VARCHAR)")} % 35 - 5), 0) AS hdd
         |  FROM (SELECT DISTINCT d FROM day)),
         |m AS (
         |  SELECT meter_id, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(hdd) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         |    CAST(SUM(hdd * y) AS BIGINT) AS sxy,
         |    CAST(SUM(hdd * hdd) AS BIGINT) AS sxx
         |  FROM day JOIN wx USING (d) GROUP BY 1)
         |SELECT meter_id, n AS n_days, sy AS total_mwh,
         |  CAST((n * sxy - sx * sy) * 1000000 // GREATEST(n * sxx - sx * sx, 1) AS BIGINT)
         |    AS hdd_slope_ppm,
         |  CAST((sy * sxx - sx * sxy) * 1000 // GREATEST(n * sxx - sx * sx, 1) AS BIGINT)
         |    AS base_intercept_milli
         |FROM m""".stripMargin
    }) { (s, _) =>
      val day = Staging.stgMeterReadings(MeterGen.readings(s, NMeters, NIntervalsWx))
        .groupBy(col("meter_id"), to_date(col("reading_timestamp")).as("d"))
        .agg(sum(greatest(col("consumption_delta_mwh"), lit(0L))).as("y"))
      val wx = day.select(col("d")).distinct()
        .withColumn("t",
          pmod(graft.llm.TextHash.h64(concat(lit("wx:v1:"), col("d").cast("string"))),
            lit(35L)) - 5L)
        .select(col("d"), greatest(lit(18L) - col("t"), lit(0L)).as("hdd"))
      day.join(broadcast(wx), Seq("d"))
        .groupBy(col("meter_id"))
        .agg(count(lit(1)).as("n"), sum(col("hdd")).as("sx"), sum(col("y")).as("sy"),
          sum(col("hdd") * col("y")).as("sxy"),
          sum(col("hdd") * col("hdd")).as("sxx"))
        .select(col("meter_id"), col("n").as("n_days"), col("sy").as("total_mwh"),
          expr("(n * sxy - sx * sy) * 1000000L div greatest(n * sxx - sx * sx, 1L)")
            .as("hdd_slope_ppm"),
          expr("(sy * sxx - sx * sxy) * 1000L div greatest(n * sxx - sx * sx, 1L)")
            .as("base_intercept_milli"))
    },

    // ---- OUTAGE / COMPLETENESS AUDIT — the data-completeness report an
    // MDM runs nightly against the expected register grid (the reference
    // asserts not-null on what ARRIVED; this audits what DIDN'T):
    // deterministically drop ~5% of the generated readings (the same
    // hash-coin family as every synthetic input, so both engines see the
    // identical missingness), then per meter report received/missing
    // counts, completeness ppm, and the interior gap structure via
    // gaps-and-islands on the 15-minute grid (LAG of the epoch second,
    // runs > 900 s are outages). Scale shape: a narrow filter on the
    // reading scan, ONE per-meter window (state bounded by readings per
    // meter), one combinable aggregate — no joins at all.
    q("meter_outage_intervals", {
      s"""WITH ${MeterSql.readingsCtes(NMeters, NIntervals)},
         |kept AS (
         |  SELECT meter_id, reading_timestamp
         |  FROM readings
         |  WHERE ${graft.llm.TextHash.h64Sql(
              "'out:v1:' || CAST(meter_id AS VARCHAR) || ':' || " +
                "CAST(CAST(epoch(reading_timestamp) AS BIGINT) AS VARCHAR)")} % 20 <> 0),
         |d AS (
         |  SELECT meter_id,
         |    CAST(epoch(reading_timestamp) AS BIGINT)
         |      - lag(CAST(epoch(reading_timestamp) AS BIGINT))
         |        OVER (PARTITION BY meter_id ORDER BY reading_timestamp) AS gap_s
         |  FROM kept)
         |SELECT meter_id, CAST(COUNT(*) AS BIGINT) AS n_readings,
         |  CAST($NIntervals - COUNT(*) AS BIGINT) AS n_missing,
         |  CAST(COUNT(*) * 1000000 // $NIntervals AS BIGINT) AS completeness_ppm,
         |  CAST(COUNT(CASE WHEN gap_s > 900 THEN 1 END) AS BIGINT) AS n_gaps,
         |  CAST(COALESCE(MAX(gap_s // 900 - 1), 0) AS BIGINT) AS longest_gap_intervals
         |FROM d GROUP BY 1""".stripMargin
    }) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val kept = MeterGen.readings(s, NMeters, NIntervals)
        .select(col("meter_id"), col("reading_timestamp"))
        .filter(pmod(graft.llm.TextHash.h64(
          concat(lit("out:v1:"), col("meter_id").cast("string"), lit(":"),
            unix_timestamp(col("reading_timestamp")).cast("string"))),
          lit(20L)) =!= 0L)
      val byMeter = Window.partitionBy(col("meter_id"))
        .orderBy(col("reading_timestamp"))
      kept
        .withColumn("gap_s",
          unix_timestamp(col("reading_timestamp"))
            - lag(unix_timestamp(col("reading_timestamp")), 1).over(byMeter))
        .groupBy(col("meter_id"))
        .agg(count(lit(1)).as("n_readings"),
          (lit(NIntervals) - count(lit(1))).as("n_missing"),
          expr(s"count(1) * 1000000L div $NIntervals").as("completeness_ppm"),
          sum(when(col("gap_s") > 900L, 1L).otherwise(0L)).as("n_gaps"),
          coalesce(max(expr("gap_s div 900L - 1L")), lit(0L))
            .as("longest_gap_intervals"))
    }
  )
}
