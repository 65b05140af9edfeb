package graft.streaming

import graft.GraftQuery
import graft.GraftQuery.qNoOracle
import graft.meter.MeterGen
import org.apache.spark.sql.functions._

/** Ingest-path throughput as a harness query (BASELINE.md headline: the
  * reference consumer sustains ~10K rec/sec/process, 4 partitions). This
  * runs the consumer's exact CPU work — JSON wire decode, schema
  * validation, composite-key dedup — over 960K generated readings
  * (10K meters × 96 intervals = one design-scale day per 10K meters),
  * entirely in-engine. Bench times it through the noop sink: seconds for
  * 960K rows ⇒ rows/sec directly comparable to the baseline (e.g. 10 s
  * ≈ 96K rec/sec on one host).
  */
object IngestBench {

  private val NMeters = 10000L
  private val NIntervals = 96L

  val all: Seq[GraftQuery] = Seq(
    qNoOracle("st_ingest_960k_readings") { (s, _) =>
      val wire = RateSimulator.toWire(
        RateSimulator.readingColumns(
          s.range(0, NMeters * NIntervals).select(
            (col("id") % NMeters + 1).as("meter_id"),
            expr(s"id div $NMeters").as("i")),
          NIntervals))
      Ingest.parseAndValidate(wire.select(col("value")))
        .dropDuplicates("reading_timestamp", "meter_id")
    }
  )
}
