package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** transformWithState ST8 twin: the new-API deltas must equal the legacy
  * flatMapGroupsWithState output AND the batch LAG staging — three
  * formulations, one semantics. Runs on the RocksDB state store (the
  * provider transformWithState requires, and the one a million-key state
  * would use in production anyway). */
class IngestTwsSpec extends SparkSpec {
  import spark.implicits._

  test("transformWithState deltas ≡ legacy mapGroupsWithState ≡ batch LAG") {
    import graft.meter.{MeterGen, Staging}
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val raw = MeterGen.readings(spark, 5, 24)
      val wire = raw.select(
        col("meter_id"), col("reading_timestamp"),
        col("reading_consumption_milliwatts"),
        col("reading_production_milliwatts"), col("status"))
        .as[Ingest.WireReading]
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Ingest.WireReading]
      val q = IngestTws.streamingDeltas(mem.toDS()).writeStream
        .format("memory").queryName("tws_deltas_out").outputMode("append").start()
      val all = wire.collect().toSeq.sortBy(_.reading_timestamp.getTime)
      val (b1, b2) = all.splitAt(all.size / 2)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      q.stop()

      val cols = Seq("meter_id", "reading_timestamp", "consumption_delta_mwh",
        "production_delta_mwh", "status").map(col)
      val tws = spark.table("tws_deltas_out").select(cols: _*)
      val batch = Staging.stgMeterReadings(raw)
        .select(cols: _*)
      assert(tws.count() == batch.count() && batch.count() > 0)
      assert(tws.except(batch).count() == 0)
      assert(batch.except(tws).count() == 0)
    } finally before match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }
}
