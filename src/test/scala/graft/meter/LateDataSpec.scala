package graft.meter

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Late-data invalidation for the incremental billing mart (the
  * TimescaleDB continuous-aggregate invalidation-log analogue): a late
  * batch re-materializes ONLY its invalidation closure — the touched
  * days plus each late row's SUCCESSOR-reading day, derived from the
  * data by lead() — untouched day partitions stay byte-identical, the
  * result equals a full refresh. The successor day is proven NECESSARY,
  * not defensive padding: a late row that becomes a day's new last
  * reading changes the successor's LAG delta, so rebuilding the touched
  * day alone leaves the mart stale; and the multi-day-outage case proves
  * the derivation must come from the data — a constant {day, day+1} rule
  * provably leaves the successor's partition stale when the meter was
  * silent across the boundary.
  */
class LateDataSpec extends SparkSpec {

  private val nM = 200L
  private val nI = 192L // 2 days: day0 = 2026-01-01, day1 = 2026-01-02

  private def fullMart() = Marts.factCustomerBillingDaily(
    Staging.stgMeterReadings(MeterGen.readings(spark, nM, nI)),
    MeterGen.metersDim(spark, nM), MeterGen.customers(spark, nM),
    MeterGen.tariffRates(spark))

  private def martOf(stg: org.apache.spark.sql.DataFrame) =
    Marts.factCustomerBillingDaily(stg,
      MeterGen.metersDim(spark, nM), MeterGen.customers(spark, nM),
      MeterGen.tariffRates(spark))

  private def files(dir: String, day: String) =
    Files.walk(Paths.get(dir)).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && p.contains(s"billing_date=$day"))
      .sorted.map(p => p -> (Files.getLastModifiedTime(Paths.get(p)).toMillis,
        Files.size(Paths.get(p)))).toSeq

  test("mid-day late batch: only its day rebuilds, day0 byte-identical, result ≡ full refresh") {
    val dir = Files.createTempDirectory("mart_late_mid").toString + "/m"
    val full = MeterGen.readings(spark, nM, nI)
    // an afternoon of day-1 readings in flight (mid-day window: every
    // late row's successor is still inside day1, so the DERIVED closure
    // is exactly {day1} — the constant day+1 rule would have rebuilt a
    // day that was never stale)
    val late = col("meter_id") % 10 === 7 &&
      to_date(col("reading_timestamp")) === lit("2026-01-02").cast("date") &&
      hour(col("reading_timestamp")).between(12, 17)
    graft.sources.Store.writeMart(
      martOf(Staging.stgMeterReadings(full.filter(!late))), dir, "billing_date")
    val day0Before = files(dir, "2026-01-01")
    assert(day0Before.nonEmpty)
    Thread.sleep(1100) // distinguishable mtimes

    val invalidated = MeterPipeline.refreshForLateBatch(
      spark, dir, full, full.filter(late))
    assert(invalidated.map(_.toString) === Seq("2026-01-02"),
      "derived closure = touched day only (all successors are same-day)")
    assert(files(dir, "2026-01-01") === day0Before,
      "day0 was not invalidated and must stay byte-identical")
    assert(files(dir, "2026-01-03").isEmpty,
      "a never-stale day must not be rebuilt or create a phantom partition")

    val got = spark.read.parquet(dir)
    val expect = fullMart()
    val cols = expect.columns.sorted.toIndexedSeq
    assert(got.count() === expect.count())
    assert(got.selectExpr(cols: _*).except(expect.selectExpr(cols: _*)).count() === 0)
    assert(expect.selectExpr(cols: _*).except(got.selectExpr(cols: _*)).count() === 0)
  }

  test("day-end late batch: the day+1 closure is NECESSARY — touched-day-only refresh stays stale") {
    val dir = Files.createTempDirectory("mart_late_end").toString + "/m"
    val dirNaive = Files.createTempDirectory("mart_late_naive").toString + "/m"
    val full = MeterGen.readings(spark, nM, nI)
    // the LAST readings of day0 for some meters arrive late: without
    // them, day1's first-interval LAG delta spans the hole and lands in
    // day1's aggregate inflated
    val late = col("meter_id") % 10 === 3 &&
      to_date(col("reading_timestamp")) === lit("2026-01-01").cast("date") &&
      hour(col("reading_timestamp")) >= 20
    val staleStg = Staging.stgMeterReadings(full.filter(!late))
    graft.sources.Store.writeMart(martOf(staleStg), dir, "billing_date")
    graft.sources.Store.writeMart(martOf(staleStg), dirNaive, "billing_date")

    // the naive repair: rebuild ONLY the touched day (day0)
    val stgAll = Staging.stgMeterReadings(full)
    graft.sources.Store.refreshMartPartitions(
      martOf(stgAll.filter(
        to_date(col("reading_timestamp")) === lit("2026-01-01").cast("date"))),
      dirNaive, "billing_date")

    // the closure repair: {day0, day1}
    val invalidated = MeterPipeline.refreshForLateBatch(
      spark, dir, full, full.filter(late))
    assert(invalidated.map(_.toString) === Seq("2026-01-01", "2026-01-02"))

    val expect = fullMart()
    val cols = expect.columns.sorted.toIndexedSeq
    val got = spark.read.parquet(dir)
    assert(got.selectExpr(cols: _*).except(expect.selectExpr(cols: _*)).count() === 0)
    assert(expect.selectExpr(cols: _*).except(got.selectExpr(cols: _*)).count() === 0)

    val naive = spark.read.parquet(dirNaive)
    assert(naive.selectExpr(cols: _*).except(expect.selectExpr(cols: _*)).count() > 0,
      "touched-day-only refresh must remain stale on day1 — else the " +
        "closure test is vacuous and the rule untested")
  }

  test("multi-day outage: the derived closure heals the successor day the constant day+1 rule provably misses") {
    val dir = Files.createTempDirectory("mart_late_gap").toString + "/m"
    val dirConst = Files.createTempDirectory("mart_late_gap_const").toString + "/m"
    val nI4 = 384L // 4 days: 2026-01-01 .. 2026-01-04
    // outage meters are SILENT on days 1-2 (their rows never existed),
    // so the day-3 first reading's LAG predecessor is back on day 0
    val outage = col("meter_id") % 10 === 5
    val gap = outage &&
      to_date(col("reading_timestamp")).between("2026-01-02", "2026-01-03")
    val gappy = MeterGen.readings(spark, nM, nI4).filter(!gap)
    // the END of day 0 arrives late for the outage meters: the late rows
    // change day0's aggregate AND the day-3 successor's delta (it now
    // spans 23:45→00:00 instead of 19:45→00:00 across the outage)
    val late = outage &&
      to_date(col("reading_timestamp")) === lit("2026-01-01").cast("date") &&
      hour(col("reading_timestamp")) >= 20
    val staleStg = Staging.stgMeterReadings(gappy.filter(!late))
    graft.sources.Store.writeMart(martOf(staleStg), dir, "billing_date")
    graft.sources.Store.writeMart(martOf(staleStg), dirConst, "billing_date")

    // the constant-closure repair: rebuild {day0, day0+1} as the old rule did
    val stgAll = Staging.stgMeterReadings(gappy)
    graft.sources.Store.refreshMartPartitions(
      martOf(stgAll.filter(to_date(col("reading_timestamp"))
        .between("2026-01-01", "2026-01-02"))),
      dirConst, "billing_date")

    // the derived repair: lead() finds the day-3 successor through the gap
    val invalidated = MeterPipeline.refreshForLateBatch(
      spark, dir, gappy, gappy.filter(late))
    assert(invalidated.map(_.toString) === Seq("2026-01-01", "2026-01-04"),
      "derived closure = touched day + the successor's day ACROSS the outage")

    val expect = martOf(stgAll)
    val cols = expect.columns.sorted.toIndexedSeq
    val got = spark.read.parquet(dir)
    assert(got.selectExpr(cols: _*).except(expect.selectExpr(cols: _*)).count() === 0)
    assert(expect.selectExpr(cols: _*).except(got.selectExpr(cols: _*)).count() === 0)

    val constant = spark.read.parquet(dirConst)
    assert(constant.selectExpr(cols: _*).except(expect.selectExpr(cols: _*)).count() > 0,
      "the constant {day, day+1} repair must remain stale on the day-3 " +
        "successor partition — else the gap case is vacuous")
  }

  test("invalidatedDates: the per-day-max reduction equals the brute all-late-rows derivation") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val nI4 = 384L // 4 days
    val gap = col("meter_id") % 10 === 5 &&
      to_date(col("reading_timestamp")).between("2026-01-02", "2026-01-03")
    val gappy = MeterGen.readings(spark, nM, nI4).filter(!gap)
    def onDay(d: String) = to_date(col("reading_timestamp")) === lit(d).cast("date")
    // adversarial late masks: day-end across an outage, mid-day slices,
    // a mask spanning a day boundary, and the empty mask (no-op)
    val masks = Seq(
      col("meter_id") % 10 === 5 && onDay("2026-01-01") &&
        hour(col("reading_timestamp")) >= 20,
      col("meter_id") % 7 === 2 && hour(col("reading_timestamp")).between(9, 11),
      col("meter_id") % 13 === 4 && (onDay("2026-01-02") ||
        (onDay("2026-01-03") && hour(col("reading_timestamp")) < 2)))
    masks.foreach { m =>
      val late = gappy.filter(m)
      assert(late.count() > 0, "mask must select rows or the case is vacuous")
      val got = MeterPipeline.invalidatedDates(spark, gappy, late)
        .map(_.toString).toSet
      // brute twin: EVERY late row's own date plus its successor's date,
      // lead() over the late meters' full history — no per-day-max
      // reduction, no timestamp bound
      val w = Window.partitionBy(col("meter_id")).orderBy(col("reading_timestamp"))
      val brute = gappy
        .join(late.select("meter_id").distinct(), Seq("meter_id"), "left_semi")
        .select(col("meter_id"), col("reading_timestamp"))
        .withColumn("next_ts", lead(col("reading_timestamp"), 1).over(w))
        .join(late.select(col("meter_id"), col("reading_timestamp")).distinct(),
          Seq("meter_id", "reading_timestamp"))
        .select(explode(array(
          to_date(col("reading_timestamp")), to_date(col("next_ts")))).as("d"))
        .filter(col("d").isNotNull).distinct()
        .as[java.sql.Date].collect().map(_.toString).toSet
      assert(got === brute, s"reduction diverged for mask $m")
    }
    // the empty late batch is a no-op, not an NPE
    assert(MeterPipeline.invalidatedDates(
      spark, gappy, gappy.filter(lit(false))) === Seq.empty)
  }

  test("registered query equals the full recompute") {
    val got = graft.SparkEntry.queries("meter_billing_late_refresh")(spark, sf0001)
    val expect = fullMart()
    val cols = expect.columns.sorted.toIndexedSeq
    assert(got.count() === expect.count())
    assert(got.selectExpr(cols: _*).except(expect.selectExpr(cols: _*)).count() === 0)
    assert(expect.selectExpr(cols: _*).except(got.selectExpr(cols: _*)).count() === 0)
  }
}
