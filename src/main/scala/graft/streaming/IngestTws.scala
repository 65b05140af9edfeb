package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** ST8 on Spark 4's `transformWithState` — the CURRENT arbitrary-state API
  * (SPARK-40434; `mapGroupsWithState` is the legacy surface): explicit
  * named state variables with per-variable encoders and TTL, timer
  * registration, and a RocksDB-backed state store. Semantically identical
  * to [[Ingest.streamingDeltas]]; the spec runs both plus the batch LAG
  * and asserts three-way equality, so the engine carries the old and new
  * state APIs in lockstep.
  *
  * Scale notes: state is one [[Ingest.MeterState]] per meter keyed by the
  * stream's shuffle partitioning; RocksDB keeps the working set off-heap
  * (the store that survives million-key state); TTL is declared NONE
  * deliberately — meter state is as long-lived as the meter.
  */
object IngestTws {
  import Ingest.{DeltaReading, MeterState, WireReading}

  /** The processor: one ValueState holding the last cumulative reading. */
  private class DeltaProcessor
      extends StatefulProcessor[Int, WireReading, DeltaReading] {
    @transient private var st: ValueState[MeterState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MeterState](
        "meterState", Encoders.product[MeterState], TTLConfig.NONE)

    override def handleInputRows(
        meterId: Int,
        rows: Iterator[WireReading],
        timerValues: TimerValues): Iterator[DeltaReading] = {
      // within a micro-batch rows may arrive unordered: sort by event time
      val sorted = rows.toSeq.sortBy(_.reading_timestamp.getTime)
      var s = if (st.exists()) st.get() else MeterState(-1L, None)
      val out = sorted.map { r =>
        val consDelta =
          if (s.lastCons < 0) r.reading_consumption_milliwatts
          else r.reading_consumption_milliwatts - s.lastCons
        val prodDelta = r.reading_production_milliwatts.map { p =>
          s.lastProd.fold(p)(lp => p - lp)
        }
        s = MeterState(r.reading_consumption_milliwatts,
          r.reading_production_milliwatts.orElse(s.lastProd))
        DeltaReading(r.meter_id, r.reading_timestamp, consDelta, prodDelta, r.status)
      }
      st.update(s)
      out.iterator
    }
  }

  /** [[Ingest.streamingDeltas]] re-expressed on transformWithState.
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  def streamingDeltas(readings: Dataset[WireReading]): Dataset[DeltaReading] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.meter_id)
      .transformWithState(
        new DeltaProcessor, TimeMode.None(), OutputMode.Append())
  }
}
