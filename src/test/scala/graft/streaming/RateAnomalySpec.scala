package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Online anomaly scoring: the streamed alerts must equal the batch
  * prefix-moment formulation exactly (integer state ⇒ batch boundaries
  * can't change the result), and a planted spike must alert. */
class RateAnomalySpec extends SparkSpec {
  import spark.implicits._
  import Ingest.DeltaReading

  private def t(i: Int) =
    new java.sql.Timestamp(java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime + i * 900000L)

  private def d(m: Int, i: Int, mwh: Long): DeltaReading =
    DeltaReading(m, t(i), mwh, None, "V")

  /** The same exact integer test as the processor, as a batch window. */
  private def batchAlerts(deltas: Seq[DeltaReading]) = {
    val w = Window.partitionBy($"meter_id").orderBy($"reading_timestamp")
      .rowsBetween(Window.unboundedPreceding, -1)
    deltas.toDS()
      .withColumn("x", $"consumption_delta_mwh" / 1000 cast "long")
      .withColumn("n", count($"x").over(w))
      .withColumn("s", coalesce(sum($"x").over(w), lit(0L)))
      .withColumn("sxx", coalesce(sum($"x" * $"x").over(w), lit(0L)))
      .filter($"n" >= RateAnomaly.WarmupN &&
        ($"n" * $"x" - $"s") * ($"n" * $"x" - $"s") > lit(9L) * ($"n" * $"sxx" - $"s" * $"s"))
      .select($"meter_id", $"reading_timestamp", $"x".as("consumption_wh"), $"n".as("n_prior"))
  }

  test("streamed alerts ≡ batch prefix-moment formulation; planted spike alerts") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // meter 1: stable ~1000±3 Wh then a 5000 Wh spike at i=12, back to normal
      // meter 2: steadily noisy — variance high enough that nothing alerts
      val m1 = (0 until 12).map(i => d(1, i, 1000000L + (i % 3) * 3000L)) ++
        Seq(d(1, 12, 5000000L)) ++ (13 until 16).map(i => d(1, i, 1001000L))
      val m2 = (0 until 16).map(i => d(2, i, 800000L + (i % 5) * 400000L))
      val all = (m1 ++ m2).sortBy(_.reading_timestamp.getTime)

      implicit val ctx = spark.sqlContext
      val mem = MemoryStream[DeltaReading]
      val q = RateAnomaly.detect(mem.toDS()).writeStream
        .format("memory").queryName("anomaly_out").outputMode("append").start()
      val (b1, b2) = all.splitAt(all.size / 3) // uneven micro-batches on purpose
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      q.stop()

      val streamed = spark.table("anomaly_out")
        .select("meter_id", "reading_timestamp", "consumption_wh", "n_prior")
      val batch = batchAlerts(all)
      assert(streamed.count() == batch.count())
      assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0)

      // the planted spike is IN the alert set; the noisy meter is not
      val rows = streamed.collect()
      assert(rows.exists(r => r.getInt(0) == 1 && r.getLong(2) == 5000L))
      assert(!rows.exists(_.getInt(0) == 2))
    } finally before match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("generator corpus: streamed ≡ batch on real meter deltas, any batching") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val deltas = graft.meter.Staging.stgMeterReadings(
        graft.meter.MeterGen.readings(spark, 4, 48))
        .select($"meter_id", $"reading_timestamp", $"consumption_delta_mwh")
        .withColumn("production_delta_mwh", lit(null).cast("long"))
        .withColumn("status", lit("V"))
        .as[DeltaReading].collect().toSeq
        .sortBy(_.reading_timestamp.getTime)

      implicit val ctx = spark.sqlContext
      val mem = MemoryStream[DeltaReading]
      val q = RateAnomaly.detect(mem.toDS()).writeStream
        .format("memory").queryName("anomaly_gen_out").outputMode("append").start()
      deltas.grouped(57).foreach { b => mem.addData(b); q.processAllAvailable() }
      q.stop()

      val streamed = spark.table("anomaly_gen_out")
      val batch = batchAlerts(deltas)
      assert(streamed.count() == batch.count())
      assert(streamed.select("meter_id", "reading_timestamp", "consumption_wh", "n_prior")
        .except(batch).count() == 0)
    } finally before match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
