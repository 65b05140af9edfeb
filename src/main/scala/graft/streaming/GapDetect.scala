package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SILENCE detection: alert when a meter stops reporting.
  *
  * The reference monitors pipeline health from the consumer side
  * (kafka_monitor.py lag metrics — see [[Monitor]]); what it cannot see is
  * a meter that simply goes dark, because absence produces no records to
  * lag behind. Detecting absence needs per-key TIMERS, not per-record
  * logic: this is `flatMapGroupsWithState` with an EVENT-TIME timeout —
  * each meter's state re-arms a timeout at `last_seen + gap` and the alert
  * fires when the WATERMARK (not wall clock — replays of historic data
  * alert identically) passes it with no new reading.
  *
  * Scale shape: state is one (long, long) per *distinct meter*, not per
  * reading — bounded by fleet size, streamed through the state store
  * partitioned on meter_id. Alert-once semantics: firing removes the
  * state, so a silent meter costs nothing until it speaks again (and a
  * meter that resumes re-registers automatically on its next reading).
  */
object GapDetect {
  import Ingest.WireReading

  final case class Heartbeat(lastTsMs: Long, nSeen: Long)
  final case class GapAlert(
      meter_id: Int,
      last_seen: java.sql.Timestamp,
      readings_before_silence: Long)

  /** `readings` must already carry a watermark on `reading_timestamp`
    * (the watermark delay bounds how late a reading can arrive before a
    * false alert; the gap is how long silence must last to alert). */
  def detectGaps(
      readings: Dataset[WireReading],
      gapSeconds: Long): Dataset[GapAlert] = {
    import readings.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L
    readings
      .groupByKey(_.meter_id)
      .flatMapGroupsWithState[Heartbeat, GapAlert](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (meterId: Int, rows: Iterator[WireReading], state: GroupState[Heartbeat]) =>
          if (state.hasTimedOut) {
            val hb = state.get
            state.remove() // alert once; meter re-registers on next reading
            Iterator.single(GapAlert(
              meterId, new java.sql.Timestamp(hb.lastTsMs), hb.nSeen))
          } else {
            val prev = state.getOption.getOrElse(Heartbeat(Long.MinValue, 0L))
            var latest = prev.lastTsMs
            var n = prev.nSeen
            rows.foreach { r =>
              latest = math.max(latest, r.reading_timestamp.getTime)
              n += 1
            }
            state.update(Heartbeat(latest, n))
            // re-arm: fire when the watermark passes last_seen + gap
            state.setTimeoutTimestamp(latest + gapMs)
            Iterator.empty
          }
      }
  }
}
