package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

/** Streaming observability — the Spark analogue of the reference's Kafka
  * lag monitor + consumer throughput counters (SURVEY.md §2.8 ST12/A10;
  * monitor/kafka_monitor.py:60-167, consumer/meter_consumer.py:320-378).
  *
  * Kafka's high-watermark − committed-offset lag maps onto Structured
  * Streaming progress: rows not yet processed are simply not yet in a
  * batch, so the operative metrics are per-batch input rows, processing
  * rate, and trigger-to-finish latency, all published by the engine on
  * every micro-batch.
  */
final class IngestMonitor extends StreamingQueryListener {

  val totalInputRows = new AtomicLong(0)
  val batches = new AtomicLong(0)
  val lastProgressJson = new AtomicReference[String]("")

  @volatile var lastInputRowsPerSecond: Double = 0.0
  @volatile var lastBatchDurationMs: Long = 0L

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    totalInputRows.addAndGet(p.numInputRows)
    batches.incrementAndGet()
    lastInputRowsPerSecond = p.inputRowsPerSecond
    lastBatchDurationMs = Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)
    lastProgressJson.set(p.json)
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  def summary: String =
    s"""{"batches":${batches.get},"totalInputRows":${totalInputRows.get},""" +
      s""""lastInputRowsPerSecond":$lastInputRowsPerSecond,"lastBatchDurationMs":$lastBatchDurationMs}"""
}
