package graft.streaming

import graft.SparkSpec
import graft.meter.{Marts, MeterGen, Staging}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Capstone integration: the full reference path on the stream —
  * generator → JSON wire (S1) → exactly-once ingest (S2/S4/S5) →
  * chunked bronze (S11) → LAG staging (W1/W2) → billing mart (A1-A7)
  * — produces the identical mart the pure-batch pipeline produces.
  */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("streamed wire-format ingest reproduces the batch billing mart exactly") {
    val nMeters = 10L
    val nIntervals = 96L
    val dir = Files.createTempDirectory("e2e").toString
    val bronze = s"$dir/bronze"

    // the producer side: batch-generate the cumulative readings, frame
    // them as the 5-field JSON wire messages, and feed them through a
    // stream in two micro-batches (with a duplicate delivery)
    val wire = MeterGen.readings(spark, nMeters, nIntervals)
      .select(to_json(struct(
        col("meter_id"),
        date_format(col("reading_timestamp"), "yyyy-MM-dd'T'HH:mm:ssXXX").as("reading_timestamp"),
        col("reading_consumption_milliwatts"),
        col("reading_production_milliwatts"),
        col("status"))).as("value"))
      .as[String].collect().toSeq

    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[String]
    val (b1, b2) = wire.splitAt(wire.size / 2)
    mem.addData(b1)
    mem.addData(b1.take(50)) // at-least-once redelivery
    mem.addData(b2)
    val q = Ingest.startIngest(mem.toDF(), bronze, s"$dir/ckpt", Trigger.AvailableNow())
    q.awaitTermination(120000)

    val landed = spark.read.parquet(bronze)
    assert(landed.count() == nMeters * nIntervals) // duplicates absorbed

    // consumer side onward: staging + mart over the streamed bronze
    val streamedMart = Marts.factCustomerBillingDaily(
      Staging.stgMeterReadings(landed.select(
        col("reading_timestamp"), col("meter_id"),
        col("reading_consumption_milliwatts"),
        col("reading_production_milliwatts"), col("status"))),
      MeterGen.metersDim(spark, nMeters), MeterGen.customers(spark, nMeters),
      MeterGen.tariffRates(spark))

    // pure-batch reference
    val batchMart = Marts.factCustomerBillingDaily(
      Staging.stgMeterReadings(MeterGen.readings(spark, nMeters, nIntervals)),
      MeterGen.metersDim(spark, nMeters), MeterGen.customers(spark, nMeters),
      MeterGen.tariffRates(spark))

    val cols = batchMart.columns.sorted.toIndexedSeq
    assert(streamedMart.selectExpr(cols: _*).except(batchMart.selectExpr(cols: _*)).count() == 0)
    assert(batchMart.selectExpr(cols: _*).except(streamedMart.selectExpr(cols: _*)).count() == 0)
  }
}
