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
    // milliwatts end-to-end, ppm shares by floor division.
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
         |  CAST(mh.load * 1000000 // p.sys_load AS BIGINT) AS share_ppm,
         |  CAST(mh.load * 1000000 // o.own_peak AS BIGINT) AS coincidence_ppm
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
          expr("load * 1000000L div sys_load").as("share_ppm"),
          expr("load * 1000000L div own_peak").as("coincidence_ppm"))
        .orderBy(col("share_ppm").desc, col("meter_id"))
        .limit(20)
    }
  )
}
