package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Online CUSUM: the streamed alerts must equal the batch closed form
  * (prefix-sum minus running-min with the frozen calibration mean)
  * exactly, under uneven micro-batching — integer state means batch
  * boundaries cannot change the chart. A planted level shift must alert;
  * a stationary meter must not. */
class StreamCusumSpec extends SparkSpec {
  import spark.implicits._
  import Ingest.DeltaReading

  private def t(i: Int) =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime + i * 900000L)

  private def d(m: Int, i: Int, mwh: Long): DeltaReading =
    DeltaReading(m, t(i), mwh, None, "V")

  /** The relational closed form on the post-warmup subsequence: k is the
    * floor-mean of the first WarmupN readings; S = P − min(0, running
    * min P) over y = x − k. Same shape as the batch
    * `ts_cusum_changepoints` query, with the frozen-k calibration the
    * stream semantics define. */
  private def batchAlerts(deltas: Seq[DeltaReading]) = {
    val byMeter = Window.partitionBy($"meter_id").orderBy($"reading_timestamp")
    val cum = byMeter.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = deltas.toDS()
      .withColumn("x", $"consumption_delta_mwh" / 1000 cast "long")
      .withColumn("rn", row_number().over(byMeter))
    val k = rows.filter($"rn" <= StreamCusum.WarmupN)
      .groupBy($"meter_id").agg(expr(s"sum(x) div ${StreamCusum.WarmupN}").as("k"))
    rows.filter($"rn" > StreamCusum.WarmupN)
      .join(k, "meter_id")
      .withColumn("p", sum($"x" - $"k").over(cum))
      .withColumn("s", $"p" - least(lit(0L), min($"p").over(cum)))
      .filter($"s" > $"k" * 4)
      .select($"meter_id", $"reading_timestamp",
        $"s".as("cusum_wh"), ($"k" * 4).as("threshold_wh"))
  }

  private def runStream(all: Seq[DeltaReading], name: String, chunk: Int) = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      val mem = MemoryStream[DeltaReading]
      val q = StreamCusum.detect(mem.toDS()).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      all.grouped(chunk).foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name)
    } finally before match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("streamed alerts ≡ the frozen-k closed form; a level shift alerts, stationarity does not") {
    // meter 1: ~1000 Wh calibration, then a sustained +50% level shift
    // meter 2: stationary around its own calibration mean throughout
    val m1 = (0 until 20).map(i => d(1, i, 1000000L + (i % 4) * 2000L)) ++
      (20 until 32).map(i => d(1, i, 1500000L + (i % 3) * 2000L))
    val m2 = (0 until 32).map(i => d(2, i, 900000L + (i % 4) * 2000L))
    val all = (m1 ++ m2).sortBy(_.reading_timestamp.getTime)

    val streamed = runStream(all, "cusum_out", 23) // uneven batches on purpose
      .select("meter_id", "reading_timestamp", "cusum_wh", "threshold_wh")
    val batch = batchAlerts(all)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)

    val rows = streamed.collect()
    assert(rows.exists(_.getInt(0) == 1), "the level shift must alert")
    assert(!rows.exists(_.getInt(0) == 2), "the stationary meter must not")
  }

  /** Drive the FUSED wire→delta→chart operator on raw cumulative wire
    * readings (the composed chain's input), uneven batches. */
  private def runFused(all: Seq[Ingest.WireReading], name: String, chunk: Int) = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      val mem = MemoryStream[Ingest.WireReading]
      val q = StreamCusum.detectFused(mem.toDS()).writeStream
        .format("memory").queryName(name).outputMode("append").start()
      all.grouped(chunk).foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name)
    } finally before match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("fused wire→delta→chart ≡ the composed two-operator chain, alert for alert") {
    // raw CUMULATIVE wire readings for the generator fleet — the fused
    // operator must reproduce the composed detect(streamingDeltas(...))
    // alerts exactly: same delta-from-cumulative contract (first delta =
    // cumulative), same warmup, same chart, one state row instead of two
    val wire = graft.meter.MeterGen.readings(spark, 4, 96)
      .select($"meter_id", $"reading_timestamp",
        $"reading_consumption_milliwatts", $"reading_production_milliwatts",
        $"status")
      .as[Ingest.WireReading].collect().toSeq
      .sortBy(_.reading_timestamp.getTime)

    val fused = runFused(wire, "cusum_fused_out", 41)
      .select("meter_id", "reading_timestamp", "cusum_wh", "threshold_wh")

    // composed twin over the SAME input, different (also uneven) batching
    val deltas = graft.meter.Staging.stgMeterReadings(
      graft.meter.MeterGen.readings(spark, 4, 96))
      .select($"meter_id", $"reading_timestamp", $"consumption_delta_mwh")
      .withColumn("production_delta_mwh", lit(null).cast("long"))
      .withColumn("status", lit("V"))
      .as[DeltaReading].collect().toSeq
      .sortBy(_.reading_timestamp.getTime)
    val composed = runStream(deltas, "cusum_composed_twin_out", 29)
      .select("meter_id", "reading_timestamp", "cusum_wh", "threshold_wh")

    assert(fused.count() == composed.count())
    assert(fused.except(composed).count() == 0 &&
      composed.except(fused).count() == 0)
    assert(fused.count() > 0, "the diurnal peak must drive alerts")
  }

  test("generator corpus: streamed ≡ closed form on real meter deltas, any batching") {
    val deltas = graft.meter.Staging.stgMeterReadings(
      graft.meter.MeterGen.readings(spark, 4, 96))
      .select($"meter_id", $"reading_timestamp", $"consumption_delta_mwh")
      .withColumn("production_delta_mwh", lit(null).cast("long"))
      .withColumn("status", lit("V"))
      .as[DeltaReading].collect().toSeq
      .sortBy(_.reading_timestamp.getTime)

    val streamed = runStream(deltas, "cusum_gen_out", 57)
      .select("meter_id", "reading_timestamp", "cusum_wh", "threshold_wh")
    val batch = batchAlerts(deltas)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(streamed.count() > 0, "the diurnal peak must drive alerts")
  }
}
