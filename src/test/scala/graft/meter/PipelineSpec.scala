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

  test("VEE estimation recomputes from a driver-side brute force and only edits flagged rows") {
    import spark.implicits._
    val rows = Staging.stgMeterReadings(MeterGen.readings(spark, 200, 192))
      .select(col("meter_id"), hour(col("reading_timestamp")).cast("long"),
        col("consumption_delta_mwh"), col("status"))
      .as[(Int, Long, Long, String)].collect()
    val expected = rows.groupBy(_._1).map { case (m, xs) =>
      val flagged = xs.map { case (_, h, d, st) => (h, d, st == "R" || d < 0) }
      val slotMean = flagged.filter(!_._3).groupBy(_._1).view
        .mapValues(v => v.map(_._2).sum / v.length).toMap
      val est = flagged.map { case (h, d, inv) =>
        if (inv) slotMean.getOrElse(h, 0L) else d
      }
      (m, flagged.length.toLong, flagged.count(_._3).toLong,
        flagged.map(_._2).sum, est.sum)
    }.toSet
    val got = graft.SparkEntry.queries("meter_vee_estimates")(spark, sf0001)
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
    // the workflow is non-vacuous (errors exist) and only flagged rows move
    assert(got.exists(_._3 > 0), "no interval was estimated — vacuous")
    assert(got.filter(_._3 == 0).forall(r => r._4 == r._5),
      "a meter with zero estimates changed its total")
  }

  test("demand charge picks each meter-day's max interval with a deterministic argmax") {
    import spark.implicits._
    val rows = Staging.stgMeterReadings(MeterGen.readings(spark, 200, 192))
      .select(col("meter_id"), to_date(col("reading_timestamp")),
        col("reading_timestamp"), col("consumption_delta_mwh").cast("long"))
      .as[(Int, java.sql.Date, java.sql.Timestamp, Long)].collect()
    val expected = rows.groupBy(r => (r._1, r._2)).map { case ((m, day), xs) =>
      val best = xs.minBy(r => (-r._4, r._3.getTime)) // max d, earliest ts on tie
      (m, day, best._4, best._3, math.max(best._4, 0L) * 12L / 1000L)
    }.toSet
    val got = graft.SparkEntry.queries("meter_demand_charge")(spark, sf0001)
      .as[(Int, java.sql.Date, Long, java.sql.Timestamp, Long)].collect().toSet
    assert(got === expected)
    assert(got.size == 400L, "200 meters x 2 billing days")
  }

  test("load duration curve: ranks are a permutation, exceedance and share are monotone") {
    import spark.implicits._
    val got = graft.SparkEntry.queries("meter_load_duration")(spark, sf0001)
      .orderBy(col("rank"))
      .as[(Long, java.sql.Timestamp, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == (1L to got.length).toSeq)
    // descending load by construction; cumulative share ends at exactly 1e6
    assert(got.sliding(2).forall(p => p.length < 2 || p(0)._3 >= p(1)._3))
    assert(got.last._5 === 1000000L)
    assert(got.map(_._5).toSeq == got.map(_._5).toSeq.sorted)
  }

  test("CBL baseline equals the brute-force like-day mean over valid prior days") {
    import spark.implicits._
    val rows = Staging.stgMeterReadings(MeterGen.readings(spark, 200, 480))
      .filter(!(col("status") === "R" || col("consumption_delta_mwh") < 0))
      .select(col("meter_id"), to_date(col("reading_timestamp")),
        (hour(col("reading_timestamp")) * 4
          + expr("minute(reading_timestamp) div 15")).cast("long"),
        col("consumption_delta_mwh").cast("long"))
      .as[(Int, java.sql.Date, Long, Long)].collect()
    val eventDay = rows.map(_._2.toLocalDate).max
    val baseline = rows.filter(_._2.toLocalDate.isBefore(eventDay))
      .groupBy(r => (r._1, r._3)).view.mapValues(v => v.map(_._4).sum / v.length).toMap
    val expected = rows.filter(_._2.toLocalDate == eventDay).groupBy(_._1)
      .map { case (m, xs) =>
        val actual = xs.map(_._4).sum
        val base = xs.map(r => baseline.getOrElse((m, r._3), 0L)).sum
        (m, actual, base, actual * 1000000L / math.max(base, 1L))
      }.toSet
    val got = graft.SparkEntry.queries("meter_baseline_cbl")(spark, sf0001)
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty && got.forall(_._3 > 0), "every meter has a nonzero baseline")
  }
}
