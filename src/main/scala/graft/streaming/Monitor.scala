package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** Streaming observability — the Spark analogue of the reference's Kafka
  * lag monitor + consumer throughput counters (SURVEY.md §2.8 ST12/A10;
  * monitor/kafka_monitor.py:60-167, consumer/meter_consumer.py:320-378).
  *
  * Kafka's high-watermark − committed-offset lag maps onto Structured
  * Streaming progress: per-batch input rows, processing rate,
  * trigger-to-finish latency, and — mirroring kafka_monitor.py:156-157's
  * lag-as-%-of-log-size — the behind-fraction computed from each source's
  * `latestOffset − endOffset` (records available at the source but not yet
  * in a committed batch).
  */
final class IngestMonitor extends StreamingQueryListener {

  val totalInputRows = new AtomicLong(0)
  val batches = new AtomicLong(0)
  val lastProgressJson = new AtomicReference[String]("")

  @volatile var lastInputRowsPerSecond: Double = 0.0
  @volatile var lastBatchDurationMs: Long = 0L
  /** Records available at the sources but beyond the last batch's end. */
  @volatile var lastBehindRecords: Long = 0L
  /** [[lastBehindRecords]] as % of the sources' total position
    * (kafka_monitor.py:156-157's lag-percentage). */
  @volatile var lastLagPct: Double = 0.0

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    totalInputRows.addAndGet(p.numInputRows)
    batches.incrementAndGet()
    lastInputRowsPerSecond = p.inputRowsPerSecond
    lastBatchDurationMs = Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)
    val offsets = p.sources.toSeq.flatMap { sp =>
      for {
        latest <- Option(sp.latestOffset).flatMap(IngestMonitor.offsetTotal)
        end <- Option(sp.endOffset).flatMap(IngestMonitor.offsetTotal)
      } yield (latest, end)
    }
    if (offsets.nonEmpty) {
      val latestSum = offsets.map(_._1).sum
      val endSum = offsets.map(_._2).sum
      lastBehindRecords = math.max(0L, latestSum - endSum)
      lastLagPct = if (latestSum > 0) lastBehindRecords * 100.0 / latestSum else 0.0
    }
    lastProgressJson.set(p.json)
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  def summary: String =
    s"""{"batches":${batches.get},"totalInputRows":${totalInputRows.get},""" +
      s""""lastInputRowsPerSecond":$lastInputRowsPerSecond,"lastBatchDurationMs":$lastBatchDurationMs,""" +
      s""""lastBehindRecords":$lastBehindRecords,"lastLagPct":$lastLagPct}"""
}

object IngestMonitor {

  /** Total record position encoded in a source's offset string: a bare
    * number (rate/memory/file sources) or the sum of per-partition offsets
    * in a Kafka-style `{"topic":{"0":123,"1":456}}` JSON. Offsets that
    * encode neither (opaque source-specific JSON) yield None and are left
    * out of the lag computation. */
  private[streaming] def offsetTotal(s: String): Option[Long] = {
    val t = s.trim
    if (t.isEmpty) None
    else if (t.matches("-?\\d+")) Some(t.toLong)
    else if (t.startsWith("{")) {
      try {
        import org.json4s._
        val ast = org.json4s.jackson.JsonMethods.parse(t)
        def leaves(v: JValue): Seq[Long] = v match {
          case JObject(fields) => fields.flatMap { case (_, fv) => leaves(fv) }
          case JInt(i) => Seq(i.toLong)
          case JLong(l) => Seq(l)
          case JDecimal(d) => Seq(d.toLong)
          case JDouble(d) => Seq(d.toLong)
          case JString(str) if str.matches("-?\\d+") => Seq(str.toLong)
          case _ => Seq.empty
        }
        val ls = leaves(ast)
        if (ls.isEmpty) None else Some(ls.sum)
      } catch { case _: Exception => None }
    } else None
  }
}
