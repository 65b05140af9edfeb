package graft.streaming

import graft.SparkSpec
import graft.meter.MeterGen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming generator parity (ST11) and watermarked windowed aggregation
  * (ST6/ST7 extensions beyond the reference's batch-only windows). */
class StreamingGenSpec extends SparkSpec {

  test("burst-mode stream emits the batch generator's increments row-for-row") {
    val q = RateSimulator.burst(spark, meterCount = 8, nIntervals = 12)
      .writeStream.format("memory").queryName("gen_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // wait until 12 intervals × 8 meters have been emitted
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("gen_out").filter(col("reading_timestamp") <=
        lit("2026-01-01 02:45:00").cast("timestamp")).count() < 96 &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    } finally q.stop()

    val streamed = spark.table("gen_out")
      .filter(col("reading_timestamp") < lit("2026-01-01 03:00:00").cast("timestamp"))
    assert(streamed.count() == 96)

    // batch generator over the same (meter, interval) grid: cumulative
    // minus lag == the streamed increments
    val batch = graft.meter.Staging.stgMeterReadings(MeterGen.readings(spark, 8, 12))
      .select(col("meter_id"), col("reading_timestamp"),
        col("consumption_delta_mwh").as("b_cons"), col("status").as("b_status"))
    val joined = streamed.join(batch, Seq("meter_id", "reading_timestamp"))
    assert(joined.count() == 96)
    assert(joined.filter(col("consumption_inc_mwh") =!= col("b_cons")).count() == 0)
    assert(joined.filter(col("status") =!= col("b_status")).count() == 0)
  }

  test("dropDuplicatesWithinWatermark absorbs redelivered readings on the stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    val mem = MemoryStream[(Int, java.sql.Timestamp, Long)]
    val deduped = mem.toDF().toDF("meter_id", "ts", "mwh")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("meter_id", "ts")
    val q = deduped.writeStream.format("memory").queryName("ddw_out")
      .outputMode("append").start()
    try {
      mem.addData((1, t("2026-01-01 00:00:00"), 100L))
      q.processAllAvailable()
      mem.addData((1, t("2026-01-01 00:00:00"), 100L)) // redelivery, next batch
      mem.addData((2, t("2026-01-01 00:05:00"), 50L))
      q.processAllAvailable()
      assert(spark.table("ddw_out").count() == 2)
    } finally q.stop()
  }

  test("streaming hourly grid-load mart matches the batch mart on closed windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val nMeters = 6L
    val nIntervals = 96L // one day

    // stream the batch deltas through the streaming mart
    val batchStg = graft.meter.Staging.stgMeterReadings(
      MeterGen.readings(spark, nMeters, nIntervals))
      .select(col("reading_timestamp"), col("meter_id"),
        col("consumption_delta_mwh"), col("production_delta_mwh"))
    case class D(reading_timestamp: java.sql.Timestamp, meter_id: Int,
      consumption_delta_mwh: Long, production_delta_mwh: Option[Long])
    val rows = batchStg.as[(java.sql.Timestamp, Int, Long, Option[Long])].collect()
      .sortBy(_._1.getTime)

    val mem = MemoryStream[(java.sql.Timestamp, Int, Long, Option[Long])]
    val deltas = mem.toDF().toDF(
      "reading_timestamp", "meter_id", "consumption_delta_mwh", "production_delta_mwh")
    val mart = StreamingMarts.hourlyGridLoad(
      deltas, MeterGen.metersDim(spark, nMeters), MeterGen.gridZones(spark))
    val q = mart.writeStream.format("memory").queryName("sgrid_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()

      val streamed = spark.table("sgrid_out")
      assert(streamed.count() > 0, "no windows closed")
      // closed windows carry the exact batch sums (compare kwh per hour+zone)
      val batchMart = graft.meter.Marts.factGridLoadHourly(
        graft.meter.Staging.stgMeterReadings(MeterGen.readings(spark, nMeters, nIntervals)),
        MeterGen.metersDim(spark, nMeters), MeterGen.gridZones(spark))
        .select(col("load_hour"), col("grid_zone_id"),
          col("total_consumption_kwh").as("b_kwh"))
      val joined = streamed.join(batchMart, Seq("load_hour", "grid_zone_id"))
      assert(joined.count() == streamed.count())
      assert(joined.filter(col("total_consumption_kwh") =!= col("b_kwh")).count() == 0)
    } finally q.stop()
  }

  test("streaming daily billing mart matches the batch mart on closed windows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val nMeters = 6L
    val nIntervals = 192L // two days: day 1 closes, day 2 stays open

    val batchStg = graft.meter.Staging.stgMeterReadings(
      MeterGen.readings(spark, nMeters, nIntervals))
      .select(col("reading_timestamp"), col("meter_id"),
        col("consumption_delta_mwh"), col("production_delta_mwh"), col("status"))
    val rows = batchStg
      .as[(java.sql.Timestamp, Int, Long, Option[Long], String)].collect()
      .sortBy(_._1.getTime)

    val mem = MemoryStream[(java.sql.Timestamp, Int, Long, Option[Long], String)]
    val deltas = mem.toDF().toDF(
      "reading_timestamp", "meter_id", "consumption_delta_mwh",
      "production_delta_mwh", "status")
    val mart = StreamingMarts.dailyBilling(
      deltas, MeterGen.metersDim(spark, nMeters), MeterGen.customers(spark, nMeters),
      MeterGen.tariffRates(spark))
    val q = mart.writeStream.format("memory").queryName("sbill_out")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()

      val streamed = spark.table("sbill_out")
      assert(streamed.count() == nMeters, "expected one closed day per customer")
      val batchMart = graft.meter.Marts.factCustomerBillingDaily(
        graft.meter.Staging.stgMeterReadings(MeterGen.readings(spark, nMeters, nIntervals)),
        MeterGen.metersDim(spark, nMeters), MeterGen.customers(spark, nMeters),
        MeterGen.tariffRates(spark))
        .select(col("billing_date"), col("customer_id"),
          col("total_consumption_kwh").as("b_kwh"), col("net_charge").as("b_charge"),
          col("valid_reading_count").as("b_valid"), col("meter_count").as("b_meters"),
          col("has_solar").as("b_solar"))
      val joined = streamed.join(batchMart, Seq("billing_date", "customer_id"))
      assert(joined.count() == streamed.count())
      assert(joined.filter(col("total_consumption_kwh") =!= col("b_kwh")).count() == 0)
      assert(joined.filter(col("net_charge") =!= col("b_charge")).count() == 0)
      assert(joined.filter(col("valid_reading_count") =!= col("b_valid")).count() == 0)
      // HLL distinct is exact at these cardinalities
      assert(joined.filter(col("meter_count") =!= col("b_meters")).count() == 0)
      assert(joined.filter(col("has_solar") =!= col("b_solar")).count() == 0)
    } finally q.stop()
  }

  test("streaming session windows: 30-min-gap sessions close past the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    val mem = MemoryStream[(Int, java.sql.Timestamp)]
    val sess = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"), col("n_events"))
    val q = sess.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      mem.addData((1, t("2026-01-01 00:00:00")), (1, t("2026-01-01 00:10:00")),
        (2, t("2026-01-01 00:05:00")), (1, t("2026-01-01 01:00:00")))
      q.processAllAvailable()
      // advance the watermark past every session's close
      mem.addData((9, t("2026-01-01 03:00:00")))
      q.processAllAvailable()
      val closed = spark.table("sess_out")
        .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
      // 00:00 + 00:10 merge (gap 10 min < 30); 01:00 starts a new session
      assert(closed == Set(
        (1, "2026-01-01 00:00:00", 2L),
        (1, "2026-01-01 01:00:00", 1L),
        (2, "2026-01-01 00:05:00", 1L)), s"got $closed")
    } finally q.stop()
  }

  test("streaming grid mart restarts from checkpoint without duplicating closed windows") {
    import java.nio.file.Files
    val dataDir = Files.createTempDirectory("mart_src").toString
    val ckptDir = Files.createTempDirectory("mart_ckpt").toString
    val outDir = Files.createTempDirectory("mart_out").toString + "/t"
    val nMeters = 4L

    val stg = graft.meter.Staging.stgMeterReadings(
      MeterGen.readings(spark, nMeters, 96 * 2))
      .select(col("reading_timestamp"), col("meter_id"),
        col("consumption_delta_mwh"), col("production_delta_mwh"))
    val schema = stg.schema
    // half the stream arrives before the crash, half after
    val firstDay = stg.filter(col("reading_timestamp") < lit("2026-01-02").cast("timestamp"))
    val secondDay = stg.filter(col("reading_timestamp") >= lit("2026-01-02").cast("timestamp"))
    firstDay.coalesce(1).write.json(dataDir + "/b1")

    def runOnce(): Unit = {
      val deltas = spark.readStream.schema(schema).json(dataDir + "/*")
      val mart = StreamingMarts.hourlyGridLoad(
        deltas, MeterGen.metersDim(spark, nMeters), MeterGen.gridZones(spark))
      val q = mart.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(outDir)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    runOnce() // processes day 1, then "crashes"
    secondDay.coalesce(1).write.json(dataDir + "/b2")
    runOnce() // restart from the same checkpoint

    val out = spark.read.parquet(outDir)
    // exactly-once across the restart: each closed (hour, zone) emitted once
    val dups = out.groupBy(col("load_hour"), col("grid_zone_id"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
    assert(dups.count() == 0, "closed windows duplicated across restart")
    // and the closed windows carry the exact batch-mart sums
    val batchMart = graft.meter.Marts.factGridLoadHourly(
      graft.meter.Staging.stgMeterReadings(MeterGen.readings(spark, nMeters, 96 * 2)),
      MeterGen.metersDim(spark, nMeters), MeterGen.gridZones(spark))
      .select(col("load_hour"), col("grid_zone_id"), col("total_consumption_kwh").as("b_kwh"))
    val joined = out.join(batchMart, Seq("load_hour", "grid_zone_id"))
    assert(joined.count() == out.count())
    assert(joined.filter(col("total_consumption_kwh") =!= col("b_kwh")).count() == 0)
    assert(out.count() > 0)
  }

  test("stream-stream interval join: readings matched to alerts within the hour before") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    val readingsMem = MemoryStream[(Int, java.sql.Timestamp, Long)]
    val alertsMem = MemoryStream[(Int, java.sql.Timestamp, String)]
    val readings = readingsMem.toDF().toDF("meter_id", "r_ts", "mwh")
      .withWatermark("r_ts", "1 hour")
    val alerts = alertsMem.toDF().toDF("a_meter_id", "a_ts", "alert")
      .withWatermark("a_ts", "2 hours")
    // event-time-bounded inner join: state on both sides is droppable once
    // the watermark passes the range bound (the only stream-stream join
    // shape with bounded state)
    val joined = readings.join(alerts,
      expr("meter_id = a_meter_id AND r_ts BETWEEN a_ts - INTERVAL 1 HOUR AND a_ts"))
      .select(col("meter_id"), col("mwh"), col("alert"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      readingsMem.addData((1, t("2026-01-01 00:30:00"), 100L),
        (1, t("2026-01-01 03:00:00"), 50L), (3, t("2026-01-01 00:45:00"), 70L))
      alertsMem.addData((1, t("2026-01-01 01:00:00"), "spike"),
        (2, t("2026-01-01 01:00:00"), "orphan"))
      q.processAllAvailable()
      val rows = spark.table("ssj_out")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
      // only meter 1's 00:30 reading falls in [00:00, 01:00] of its alert
      assert(rows == Set((1, 100L, "spike")), s"got $rows")
    } finally q.stop()
  }

  test("pricedDeltas: stream-stream tariff join equals the batch join; late rows dropped") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    val nMeters = 6L
    val meters = MeterGen.metersDim(spark, nMeters)
    val readingsMem = MemoryStream[(java.sql.Timestamp, Int, Long)]
    val updatesMem = MemoryStream[(Int, java.sql.Timestamp, Double)]
    val deltas = readingsMem.toDF()
      .toDF("reading_timestamp", "meter_id", "consumption_delta_mwh")
    val updates = updatesMem.toDF()
      .toDF("grid_zone_id", "update_ts", "rate_per_kwh")
    val priced = StreamingMarts.pricedDeltas(deltas, meters, updates)
    val q = priced.writeStream.format("memory").queryName("priced_out")
      .outputMode("append").start()
    try {
      val zones = meters.select("meter_id", "grid_zone_id").as[(Int, Int)].collect().toMap
      // tariff updates at 00:00 and 01:00 everywhere, PLUS an overlapping
      // 00:30 correction in meter 1's zone: its 00:20 readings stay on the
      // 00:00 rate, but any reading in [00:30, 01:00) must take the
      // correction — and must NOT be billed twice
      val z1 = zones(1)
      val updateRows = zones.values.toSeq.distinct.flatMap(z =>
        Seq((z, t("2026-01-01 00:00:00"), 0.25), (z, t("2026-01-01 01:00:00"), 0.30))) :+
        ((z1, t("2026-01-01 00:30:00"), 0.27))
      val readingRows = (1 to nMeters.toInt).flatMap(m => Seq(
        (t("2026-01-01 00:20:00"), m, 4000000L),
        (t("2026-01-01 00:45:00"), m, 3000000L), // overlap regime in z1
        (t("2026-01-01 02:30:00"), m, 1000000L))) // no update covers hour 2
      updatesMem.addData(updateRows)
      readingsMem.addData(readingRows)
      q.processAllAvailable()
      // advance both watermarks so every hour-0 reading finalizes
      // (append-mode: priced rows emit when the watermark passes them)
      updatesMem.addData((z1, t("2026-01-01 09:00:00"), 0.40))
      readingsMem.addData((t("2026-01-01 09:30:00"), 1, 1000000L))
      q.processAllAvailable()

      val got = spark.table("priced_out")
        .select("meter_id", "reading_timestamp", "tariff_effective_ts",
          "rate_per_kwh", "consumption_charge")
      // oracle: the same join in batch, reduced to the LATEST covering
      // update per reading (overlap must not double-bill)
      val batch = readingRows.toDF("reading_timestamp", "meter_id", "consumption_delta_mwh")
        .join(broadcast(meters.select(col("meter_id"), col("grid_zone_id"))), Seq("meter_id"))
        .join(updateRows.toDF("grid_zone_id", "update_ts", "rate_per_kwh")
          .withColumnRenamed("grid_zone_id", "u_zone"),
          expr("""grid_zone_id = u_zone
                  AND reading_timestamp >= update_ts
                  AND reading_timestamp < update_ts + INTERVAL 1 HOUR"""))
        .groupBy(col("reading_timestamp"), col("meter_id"), col("consumption_delta_mwh"))
        .agg(max(struct(col("update_ts"), col("rate_per_kwh"))).as("m"))
        .select(col("meter_id"), col("reading_timestamp"),
          col("m.update_ts").as("tariff_effective_ts"),
          col("m.rate_per_kwh").as("rate_per_kwh"),
          (col("consumption_delta_mwh") / 1000000.0 * col("m.rate_per_kwh"))
            .as("consumption_charge"))
      // hour-2 readings never price; one row per priced reading, never two
      assert(got.count() == nMeters * 2, s"got ${got.count()}")
      assert(got.groupBy("meter_id", "reading_timestamp").count()
        .filter(col("count") > 1).count() == 0, "a reading was billed twice")
      assert(got.except(batch).count() == 0 && batch.except(got).count() == 0,
        "stream-stream pricing diverged from the batch argmax join")
      // the overlapping correction won in z1 for the 00:45 reading
      assert(got.filter(col("meter_id") === 1 &&
        col("reading_timestamp") === t("2026-01-01 00:45:00"))
        .head().getAs[Double]("rate_per_kwh") == 0.27)

      val afterAdvance = spark.table("priced_out").count()
      readingsMem.addData((t("2026-01-01 00:25:00"), 1, 9000000L)) // 9.5h late
      q.processAllAvailable()
      assert(spark.table("priced_out").count() == afterAdvance,
        "late reading behind the watermark must be dropped")
    } finally q.stop()
  }

  test("pricedDeltas left_outer: coverage gaps emit with NULL rate once provable") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    val meters = MeterGen.metersDim(spark, 2)
    val readingsMem = MemoryStream[(java.sql.Timestamp, Int, Long)]
    val updatesMem = MemoryStream[(Int, java.sql.Timestamp, Double)]
    val priced = StreamingMarts.pricedDeltas(
      readingsMem.toDF().toDF("reading_timestamp", "meter_id", "consumption_delta_mwh"),
      meters,
      updatesMem.toDF().toDF("grid_zone_id", "update_ts", "rate_per_kwh"),
      joinType = "left_outer")
    val q = priced.writeStream.format("memory").queryName("priced_outer")
      .outputMode("append").start()
    try {
      val z1 = meters.select("meter_id", "grid_zone_id").as[(Int, Int)].collect().toMap.apply(1)
      updatesMem.addData((z1, t("2026-01-01 00:00:00"), 0.25))
      readingsMem.addData(
        (t("2026-01-01 00:30:00"), 1, 1000000L), // covered
        (t("2026-01-01 02:30:00"), 1, 2000000L)) // coverage gap
      q.processAllAvailable()
      // advance watermarks far enough to prove the gap and close all state
      updatesMem.addData((z1, t("2026-01-01 12:00:00"), 0.40))
      readingsMem.addData((t("2026-01-01 12:30:00"), 1, 1000000L))
      q.processAllAvailable()
      val rows = spark.table("priced_outer")
        .select("reading_timestamp", "rate_per_kwh").collect()
        .map(r => (r.getTimestamp(0), Option(r.get(1)))).toMap
      assert(rows(t("2026-01-01 00:30:00")).contains(0.25))
      assert(rows.contains(t("2026-01-01 02:30:00")), "gap reading must surface")
      assert(rows(t("2026-01-01 02:30:00")).isEmpty, "gap reading carries NULL rate")
    } finally q.stop()
  }

  test("watermarked tumbling-window streaming aggregation (ST6/ST7 extension)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    val mem = MemoryStream[(Int, java.sql.Timestamp, Long)]
    val agg = mem.toDF().toDF("meter_id", "ts", "mwh")
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("meter_id"))
      .agg(sum(col("mwh")).as("total_mwh"), count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      mem.addData((1, t("2026-01-01 00:00:00"), 100L), (1, t("2026-01-01 00:15:00"), 150L))
      q.processAllAvailable()
      // advance event time past watermark: hour-0 window closes
      mem.addData((1, t("2026-01-01 01:45:00"), 50L))
      q.processAllAvailable()
      mem.addData((1, t("2026-01-01 02:40:00"), 10L))
      q.processAllAvailable()
      val closed = spark.table("wm_out")
        .select(col("window.start").cast("string").as("ws"), col("total_mwh"), col("n"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(closed.contains(("2026-01-01 00:00:00", 250L, 2L)), s"got $closed")
      // a late row behind the watermark is dropped, not re-opened
      mem.addData((1, t("2026-01-01 00:30:00"), 999L))
      q.processAllAvailable()
      val after = spark.table("wm_out")
        .filter(col("total_mwh") === 999L).count()
      assert(after == 0)
    } finally q.stop()
  }

  test("streaming hopping windows: closed windows bit-equal the batch w15 query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // the real corpus rows, streamed: (ts, exact cents)
    val rows = graft.ops.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("ts"), graft.ops.Tables.cents(col("value")).as("cents"))
      .as[(java.sql.Timestamp, Long)].collect().sortBy(_._1.getTime)
    val (first, rest) = rows.splitAt(rows.length / 2)
    val sentinelTs = new java.sql.Timestamp(rows.last._1.getTime + 30L * 86400000)

    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val q = StreamingMarts.hoppingEventTotals(mem.toDF().toDF("ts", "cents"))
      .writeStream.format("memory").queryName("hop_out")
      .outputMode("append").start()
    try {
      mem.addData(first.toIndexedSeq)
      q.processAllAvailable()
      mem.addData(rest.toIndexedSeq)
      q.processAllAvailable()
      // sentinel far past the data advances the watermark so every real
      // window closes; two triggers because the watermark takes effect in
      // the batch AFTER the one that observed the sentinel
      mem.addData((sentinelTs, 0L))
      q.processAllAvailable()
      mem.addData((sentinelTs, 0L))
      q.processAllAvailable()

      val cutoffMs = sentinelTs.getTime - 3600000
      val streamed = spark.table("hop_out")
        .filter(col("window_start_ms") < cutoffMs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = graft.SparkEntry.queries("w15_hopping_windows")(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
