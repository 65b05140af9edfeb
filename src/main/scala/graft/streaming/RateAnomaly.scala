package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** ONLINE per-meter consumption anomaly scoring — the streaming twin of the
  * batch `w9_zscore_anomaly` window query, maintained incrementally in
  * keyed state instead of re-scanning history.
  *
  * State per meter is the exact integer prefix moments (n, Σx, Σx²) in
  * mWh — integers are associative, so a replay that re-partitions or
  * re-batches the stream reproduces IDENTICAL state and identical alerts
  * (float accumulators would drift with batch boundaries). A reading
  * alerts when n ≥ [[RateAnomaly.WarmupN]] and
  * (x−μ)² > 9·σ² — the |z| > 3 test cross-multiplied into pure integer
  * arithmetic: (n·x − S)² > 9·(n·Sxx − S²) — no division, no sqrt, no
  * float anywhere, so the alert set is bit-deterministic.
  *
  * Spark 4 `transformWithState` (RocksDB store): second production use of
  * the current state API next to [[IngestTws]] — here the state is a
  * running aggregate rather than a last-value, the shape that generalizes
  * to any online sufficient-statistic (EMA, CUSUM, quantile sketches).
  */
object RateAnomaly {
  import Ingest.DeltaReading

  /** Minimum prior readings before a meter can alert. */
  val WarmupN = 8L

  /** Scoring unit: per-interval deltas in whole Wh (mWh div 1000).
    * Overflow headroom: x ≈ 10³ Wh/interval ⇒ dev² stays < 2⁶³ out to
    * ~10⁶ retained readings per meter (≈ 30 years of 15-min data); a
    * production variant would also decay/rescale the moments. */
  private def toWh(mwh: Long): Long = mwh / 1000L

  final case class Moments(n: Long, s: Long, sxx: Long)
  final case class RateAlert(
      meter_id: Int,
      reading_timestamp: java.sql.Timestamp,
      consumption_wh: Long,
      n_prior: Long)

  private class AnomalyProcessor
      extends StatefulProcessor[Int, DeltaReading, RateAlert] {
    @transient private var st: ValueState[Moments] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Moments](
        "moments", Encoders.product[Moments], TTLConfig.NONE)

    override def handleInputRows(
        meterId: Int,
        rows: Iterator[DeltaReading],
        timerValues: TimerValues): Iterator[RateAlert] = {
      val sorted = rows.toSeq.sortBy(_.reading_timestamp.getTime)
      var m = if (st.exists()) st.get() else Moments(0L, 0L, 0L)
      val out = Seq.newBuilder[RateAlert]
      sorted.foreach { r =>
        val x = toWh(r.consumption_delta_mwh)
        // test against the PRIOR moments (a point must not soften its own
        // alert) — same frame as a batch ROWS BETWEEN ... AND 1 PRECEDING
        if (m.n >= WarmupN) {
          val dev = m.n * x - m.s
          val varN2 = m.n * m.sxx - m.s * m.s // n²·σ² ≥ 0, exact
          if (dev * dev > 9L * varN2) {
            out += RateAlert(meterId, r.reading_timestamp, x, m.n)
          }
        }
        m = Moments(m.n + 1, m.s + x, m.sxx + x * x)
      }
      st.update(m)
      out.result().iterator
    }
  }

  /** Alerts for per-interval consumptions deviating > 3σ from the meter's
    * own prior history (exact integer test; see object doc). Compose after
    * [[Ingest.streamingDeltas]] / [[IngestTws.streamingDeltas]]. */
  def detect(deltas: Dataset[DeltaReading]): Dataset[RateAlert] = {
    import deltas.sparkSession.implicits._
    deltas
      .groupByKey(_.meter_id)
      .transformWithState(
        new AnomalyProcessor, TimeMode.None(), OutputMode.Append())
  }
}
