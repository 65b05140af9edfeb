package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Event-time-timeout silence detection (GapDetect): alerts are driven by
  * the WATERMARK, fire exactly once per silence, and active meters never
  * alert. */
class GapDetectSpec extends SparkSpec {
  import Ingest.WireReading

  private def t(s: String) = java.sql.Timestamp.valueOf(s)
  private def r(m: Int, ts: String): WireReading =
    WireReading(m, t(ts), 1000L, None, "V")

  test("silent meter alerts exactly once when the watermark passes its gap; active meter never alerts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val mem = MemoryStream[WireReading]
    val alerts = GapDetect.detectGaps(
      mem.toDS()
        .withWatermark("reading_timestamp", "10 minutes"),
      gapSeconds = 3600L)
    val q = alerts.writeStream.format("memory").queryName("gap_out")
      .outputMode("append").start()
    try {
      // both meters speak at 00:00; meter 1 keeps reporting, meter 2 goes dark
      mem.addData(r(1, "2026-01-01 00:00:00"), r(2, "2026-01-01 00:00:00"))
      q.processAllAvailable()
      mem.addData(r(1, "2026-01-01 00:30:00"))
      q.processAllAvailable()
      assert(spark.table("gap_out").count() == 0) // watermark still below 01:00

      // meter 1 advances event time far enough that the watermark
      // (max event − 10 min) passes meter 2's timeout of 01:00
      mem.addData(r(1, "2026-01-01 02:00:00"))
      q.processAllAvailable()
      // timeouts are evaluated on the NEXT micro-batch after the watermark
      // update; nudge one more batch through
      mem.addData(r(1, "2026-01-01 02:05:00"))
      q.processAllAvailable()

      val out = spark.table("gap_out")
        .select("meter_id", "last_seen", "readings_before_silence")
        .collect()
      assert(out.length == 1)
      assert(out(0).getInt(0) == 2)
      assert(out(0).getTimestamp(1) == t("2026-01-01 00:00:00"))
      assert(out(0).getLong(2) == 1L)

      // the alert fired ONCE: pushing more batches through must not re-alert
      mem.addData(r(1, "2026-01-01 02:10:00"))
      q.processAllAvailable()
      assert(spark.table("gap_out").count() == 1)

      // meter 2 resumes → re-registers; goes dark again → second alert with
      // the NEW last_seen (state was rebuilt, counts restart)
      mem.addData(r(2, "2026-01-01 02:15:00"))
      q.processAllAvailable()
      mem.addData(r(1, "2026-01-01 04:00:00"))
      q.processAllAvailable()
      mem.addData(r(1, "2026-01-01 04:05:00"))
      q.processAllAvailable()
      val second = spark.table("gap_out")
        .filter($"last_seen" === t("2026-01-01 02:15:00")).collect()
      assert(second.length == 1 && second(0).getAs[Int]("meter_id") == 2)
    } finally q.stop()
  }
}
