package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** ONLINE per-meter CUSUM drift monitoring — the streaming twin of the
  * batch `ts_cusum_changepoints` query (ops.TimeSeriesTk), delivering the
  * generalization [[RateAnomaly]]'s doc promises: keyed state as an online
  * sufficient statistic, here Page's cumulative-sum chart.
  *
  * Semantics: the first [[StreamCusum.WarmupN]] readings per meter
  * CALIBRATE the reference k (exact floor-mean — a stream has no
  * full-history mean to center on, so the monitor freezes its reference
  * after warmup; the batch twin's k is the full-series mean, the
  * documented difference). After warmup the chart runs the textbook
  * recursion S ← max(0, S + (x − k)) and alerts every interval with
  * S > 4k — the same no-reset emission as the batch query, so the alert
  * set equals the closed relational form (prefix-sum minus running-min)
  * applied to the post-warmup subsequence, which is exactly what
  * StreamCusumSpec proves. A production chart would typically reset S on
  * signal (Page's restart convention); no-reset is kept so the online and
  * relational formulations stay provably identical.
  *
  * All state is exact integers (Wh) ⇒ replays under ANY micro-batching
  * reproduce bit-identical alerts (the RateAnomaly doctrine). Spark 4
  * `transformWithState` on the RocksDB store.
  */
object StreamCusum {
  import Ingest.DeltaReading

  /** Calibration length: readings used to freeze the reference mean. */
  val WarmupN = 16L

  private def toWh(mwh: Long): Long = mwh / 1000L

  /** n/sum accumulate during calibration; k = −1 marks "not yet frozen". */
  final case class CusumState(n: Long, sum: Long, k: Long, s: Long)

  final case class CusumAlert(
      meter_id: Int,
      reading_timestamp: java.sql.Timestamp,
      cusum_wh: Long,
      threshold_wh: Long)

  private class CusumProcessor
      extends StatefulProcessor[Int, DeltaReading, CusumAlert] {
    @transient private var st: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CusumState](
        "cusum", Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(
        meterId: Int,
        rows: Iterator[DeltaReading],
        timerValues: TimerValues): Iterator[CusumAlert] = {
      val sorted = rows.toSeq.sortBy(_.reading_timestamp.getTime)
      var m = if (st.exists()) st.get() else CusumState(0L, 0L, -1L, 0L)
      val out = Seq.newBuilder[CusumAlert]
      sorted.foreach { r =>
        val x = toWh(r.consumption_delta_mwh)
        if (m.k < 0L) {
          val (n, sum) = (m.n + 1, m.sum + x)
          // freeze the reference the moment calibration completes; the
          // chart starts at S = 0 from the NEXT reading
          m = if (n >= WarmupN) CusumState(n, sum, sum / WarmupN, 0L)
          else CusumState(n, sum, -1L, 0L)
        } else {
          val s = math.max(0L, m.s + (x - m.k))
          if (s > 4L * m.k) {
            out += CusumAlert(meterId, r.reading_timestamp, s, 4L * m.k)
          }
          m = m.copy(s = s)
        }
      }
      st.update(m)
      out.result().iterator
    }
  }

  /** Drift alerts for sustained consumption above the meter's calibrated
    * mean. Compose after [[Ingest.streamingDeltas]]. */
  def detect(deltas: Dataset[DeltaReading]): Dataset[CusumAlert] = {
    import deltas.sparkSession.implicits._
    deltas
      .groupByKey(_.meter_id)
      .transformWithState(
        new CusumProcessor, TimeMode.None(), OutputMode.Append())
  }

  // ---- fused capacity path ----------------------------------------------

  /** Delta tracking + CUSUM chart in ONE state row. The composed chain
    * (`detect(streamingDeltas(parsed))`) stacks two keyed stateful
    * operators: because `groupByKey` keys through an opaque lambda, the
    * planner cannot see that the delta output is already hash-clustered
    * by meter, so the second operator plans its OWN Exchange and its own
    * RocksDB get+put per key per batch. At the reference's 160 K rows/s
    * anchor that second state hop is exactly the measured capacity gap
    * (r8 STREAMING_LATENCY `ingest+cusum` proc/input 0.89 vs plain
    * `ingest` 1.01). Fusing folds the chart into the SAME keyed pass that
    * computes deltas — one shuffle, one state row (6 BIGINTs), one
    * get+put — and StreamCusumSpec proves the alert stream is
    * bit-identical to the composed form under any micro-batching. The
    * composed form stays as the flexible building block; this is the
    * deploy-at-capacity shape. */
  final case class FusedState(
      lastCons: Long, n: Long, sum: Long, k: Long, s: Long)

  private class FusedProcessor
      extends StatefulProcessor[Int, Ingest.WireReading, CusumAlert] {
    @transient private var st: ValueState[FusedState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[FusedState](
        "cusumFused", Encoders.product[FusedState], TTLConfig.NONE)

    override def handleInputRows(
        meterId: Int,
        rows: Iterator[Ingest.WireReading],
        timerValues: TimerValues): Iterator[CusumAlert] = {
      val sorted = rows.toSeq.sortBy(_.reading_timestamp.getTime)
      var m = if (st.exists()) st.get() else FusedState(-1L, 0L, 0L, -1L, 0L)
      val out = Seq.newBuilder[CusumAlert]
      sorted.foreach { r =>
        // the streamingDeltas contract: first reading's delta = cumulative
        val delta =
          if (m.lastCons < 0) r.reading_consumption_milliwatts
          else r.reading_consumption_milliwatts - m.lastCons
        val x = toWh(delta)
        if (m.k < 0L) {
          val (n, sum) = (m.n + 1, m.sum + x)
          m = if (n >= WarmupN)
            FusedState(r.reading_consumption_milliwatts, n, sum, sum / WarmupN, 0L)
          else FusedState(r.reading_consumption_milliwatts, n, sum, -1L, 0L)
        } else {
          val s = math.max(0L, m.s + (x - m.k))
          if (s > 4L * m.k) {
            out += CusumAlert(meterId, r.reading_timestamp, s, 4L * m.k)
          }
          m = m.copy(lastCons = r.reading_consumption_milliwatts, s = s)
        }
      }
      st.update(m)
      out.result().iterator
    }
  }

  /** The fused delta+chart monitor straight off the parsed wire — alert
    * stream identical to `detect(Ingest.streamingDeltas(readings))` with
    * one keyed stateful operator instead of two. */
  def detectFused(readings: Dataset[Ingest.WireReading]): Dataset[CusumAlert] = {
    import readings.sparkSession.implicits._
    readings
      .groupByKey(_.meter_id)
      .transformWithState(
        new FusedProcessor, TimeMode.None(), OutputMode.Append())
  }
}
