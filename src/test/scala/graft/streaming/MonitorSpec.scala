package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming observability (ST12/A10): the listener's throughput counters
  * and the kafka_monitor-parity lag metrics. */
class MonitorSpec extends SparkSpec {

  test("offsetTotal handles bare, Kafka-style, and opaque offsets") {
    assert(IngestMonitor.offsetTotal("42") == Some(42L))
    assert(IngestMonitor.offsetTotal(" 1234567890123 ") == Some(1234567890123L))
    assert(IngestMonitor.offsetTotal("""{"meter-readings":{"0":100,"1":250}}""") == Some(350L))
    assert(IngestMonitor.offsetTotal("""{"t":{"0":"7"}}""") == Some(7L))
    assert(IngestMonitor.offsetTotal("not-an-offset") == None)
    assert(IngestMonitor.offsetTotal("""{"a":{"b":[]}}""") == None)
    assert(IngestMonitor.offsetTotal("") == None)
  }

  test("listener reports rows, batch duration, and a caught-up lag of zero") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val mon = new IngestMonitor
    spark.streams.addListener(mon)
    val mem = MemoryStream[Int]
    val q = mem.toDF().select(col("value") * 2 as "doubled")
      .writeStream.format("memory").queryName("mon_out").start()
    try {
      mem.addData(1 to 100: _*)
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 30000
      while (mon.totalInputRows.get() < 100 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(mon.totalInputRows.get() >= 100)
      assert(mon.batches.get() >= 1)
      // fully processed: sources' latestOffset == endOffset -> 0% behind
      assert(mon.lastBehindRecords == 0L, mon.summary)
      assert(mon.lastLagPct == 0.0, mon.summary)
      assert(mon.summary.contains("\"lastLagPct\":"))
    } finally {
      q.stop()
      spark.streams.removeListener(mon)
    }
  }
}
