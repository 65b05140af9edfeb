package graft.meter

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** End-to-end pipeline run: bronze landed, marts refreshed, results equal
  * the direct (unmaterialized) computation. */
class PipelineSpec extends SparkSpec {

  test("full batch run: bronze + both marts, consistent with direct computation") {
    val dir = Files.createTempDirectory("pipeline").toString
    val (billing, grid) = Pipeline.run(spark, nMeters = 20, nIntervals = 192, dir)

    assert(billing.count() == 20 * 2) // 20 customers × 2 days
    assert(grid.count() > 0)

    // bronze landed chunked
    val p = Pipeline.Paths(dir)
    assert(Files.list(Paths.get(p.bronze)).toArray.map(_.toString)
      .count(_.contains("reading_date=")) == 2)

    // materialized mart equals the direct computation (modulo row order)
    val direct = Marts.factCustomerBillingDaily(
      Staging.stgMeterReadings(MeterGen.readings(spark, 20, 192)),
      MeterGen.metersDim(spark, 20), MeterGen.customers(spark, 20),
      MeterGen.tariffRates(spark))
    val cols = direct.columns.sorted.toIndexedSeq
    assert(billing.selectExpr(cols: _*).except(direct.selectExpr(cols: _*)).count() == 0)
    assert(direct.selectExpr(cols: _*).except(billing.selectExpr(cols: _*)).count() == 0)

    // grid mart invariant: per-hour zone rows bounded by zones × hours
    assert(grid.select(col("grid_zone_id")).distinct().count() <= 20)
  }

  test("incremental billing mart: day-2 delta rebuild equals full refresh, day-1 files untouched") {
    val dir = Files.createTempDirectory("mart_inc_e2e").toString + "/m"
    MeterPipeline.billingIncrementalInit(spark, dir)
    def mtimes(day: String) = Files.walk(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && p.contains(s"billing_date=$day"))
      .sorted.map(p => Files.getLastModifiedTime(Paths.get(p)).toMillis).toSeq
    val day1Before = mtimes("2026-01-01")
    assert(day1Before.nonEmpty, "init must land the day-1 partition")
    assert(mtimes("2026-01-02").isEmpty, "stale state must not have day 2 yet")
    Thread.sleep(1100) // distinguishable mtimes

    MeterPipeline.billingIncrementalDelta(spark, dir)
    assert(mtimes("2026-01-01") == day1Before,
      "a day-2 delta must not rewrite the day-1 mart chunk")
    assert(mtimes("2026-01-02").nonEmpty)

    // incremental state ≡ full refresh (the registered query's hash gate
    // proves this vs DuckDB; here vs the direct Spark computation)
    val got = spark.read.parquet(dir)
    val full = Marts.factCustomerBillingDaily(
      Staging.stgMeterReadings(MeterGen.readings(spark, 200, 192)),
      MeterGen.metersDim(spark, 200), MeterGen.customers(spark, 200),
      MeterGen.tariffRates(spark))
    val cols = full.columns.sorted.toIndexedSeq
    assert(got.count() == full.count())
    assert(got.selectExpr(cols: _*).except(full.selectExpr(cols: _*)).count() == 0)
    assert(full.selectExpr(cols: _*).except(got.selectExpr(cols: _*)).count() == 0)
  }

  test("peak coincidence recomputes from a driver-side brute force") {
    import spark.implicits._
    val mh = Staging.stgMeterReadings(MeterGen.readings(spark, 200, 192))
      .groupBy(col("meter_id"), date_trunc("hour", col("reading_timestamp")).as("h"))
      .agg(sum(col("consumption_delta_mwh")).as("load"))
      .as[(Int, java.sql.Timestamp, Long)].collect()
    val sys = mh.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val (peakH, peakLoad) = sys.toSeq.minBy { case (h, l) => (-l, h.getTime) }
    val ownPeak = mh.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val expected = mh.filter(_._2 == peakH)
      .map { case (m, _, load) =>
        (m, load, ownPeak(m), load * 1000000L / peakLoad, load * 1000000L / ownPeak(m))
      }
      .sortBy { case (m, _, _, share, _) => (-share, m) }
      .take(20).toSeq
    val gotRows = graft.SparkEntry.queries("meter_peak_coincidence")(spark, sf0001)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(gotRows === expected)
    // every share is a true fraction of the system peak, and the factor
    // never exceeds 1e6 (load at peak cannot exceed the meter's own max)
    assert(gotRows.forall { case (_, _, _, s, c) => s <= 1000000L && c <= 1000000L })
  }
}
