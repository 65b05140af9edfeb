package graft.streaming

import graft.meter.MeterGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.nio.file.{Files, Paths}

/** Writes STREAMING_LATENCY.md: measured per-batch latency vs input rate
  * for the streaming consumer path — the evidence artifact grounding the
  * ST12 observability claims the way SCALING.md grounds batch claims.
  *
  * Two pipelines, swept across input rates bracketing the reference's
  * published numbers (~10 K rec/s per consumer, 40 K/s aggregate as
  * shipped, 160 K/s claimed at 16 consumers — README.md:119-122):
  *
  *  - `ingest`: rate source → JSON wire encode → [[Ingest.parseAndValidate]]
  *    (decode + validation) → [[Ingest.streamingDeltas]] (per-meter
  *    stateful delta) → noop sink. The consumer CPU path.
  *  - `ingest+mart`: the same, plus the watermarked hourly grid-load
  *    windowed aggregation ([[StreamingMarts.hourlyGridLoad]]) with its
  *    broadcast dim joins — the longest stateful chain in the engine.
  *
  * Sustainability verdict per (pipeline, rate): the run is KEEPING UP if
  * the source backlog (latestOffset − endOffset, the Kafka-lag analogue
  * [[IngestMonitor]] computes) does not grow across the second half of
  * the run and the mean processing rate ≥ the input rate. Batch-duration
  * percentiles come from `triggerExecution` — trigger-to-finish wall
  * time, the per-batch latency a consumer SLO would bound.
  *
  * Regenerate with `sbt "runMain graft.streaming.StreamLatencyReport"`.
  */
object StreamLatencyReport {

  /** Accumulates every progress event (IngestMonitor keeps only the last
    * one — a latency sweep needs the full series for percentiles). */
  private final class SeriesListener extends StreamingQueryListener {
    case class P(rows: Long, triggerMs: Long, processedRps: Double, behind: Long)
    val series = new java.util.concurrent.ConcurrentLinkedQueue[P]()
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      val behind = p.sources.toSeq.flatMap { sp =>
        for {
          latest <- Option(sp.latestOffset).flatMap(IngestMonitor.offsetTotal)
          end <- Option(sp.endOffset).flatMap(IngestMonitor.offsetTotal)
        } yield math.max(0L, latest - end)
      }.sum
      series.add(P(p.numInputRows,
        Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L),
        p.processedRowsPerSecond, behind))
    }
  }

  /** Per-batch (landMs, rebuildMs) pairs of the CURRENT disk-mart run —
    * filled by the foreachBatch phase hook, drained after each run into
    * the attribution table. */
  private val phaseLog =
    new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()

  /** The vec-index run's offline compactor thread (joined after the run so
    * its jobs never bleed into the next pipeline's measurement) and its
    * attributed cost note. */
  private var sideThread: Option[Thread] = None
  private val vecFoldNotes =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  case class RunResult(pipeline: String, rate: Long, batches: Int,
      totalRows: Long, medMs: Long, p95Ms: Long, maxMs: Long,
      meanProcessedRps: Double, endBehind: Long, midBehind: Long) {
    def keepingUp: Boolean = endBehind <= math.max(midBehind, rate) &&
      meanProcessedRps >= rate * 0.95
  }

  /** Linearly-interpolated percentile: with the ~10 retained batches a
    * nearest-rank index lands p95 on the last element, making the column a
    * relabeled max — interpolating between the bracketing order statistics
    * keeps p95 < max whenever the tail isn't flat. */
  private def pct(xs: Seq[Long], p: Double): Long =
    if (xs.isEmpty) 0L
    else {
      val s = xs.sorted
      val pos = p * (s.size - 1)
      val lo = pos.toInt
      val hi = math.min(s.size - 1, lo + 1)
      math.round(s(lo) + (s(hi) - s(lo)) * (pos - lo))
    }

  private def run(spark: SparkSession, pipeline: String, rate: Long,
      seconds: Int): RunResult = {
    import spark.implicits._
    // continuous(meterCount, intervalSeconds=1, …) emits meterCount rows/s
    val wire = RateSimulator.toWire(
      RateSimulator.continuous(spark, meterCount = rate, intervalSeconds = 1,
        nIntervals = 1000000L))
    val listener = new SeriesListener
    spark.streams.addListener(listener)
    val ckpt = Files.createTempDirectory("stream_latency_").toString
    val q = pipeline match {
      // the gold-maintenance loop measured end to end: parse + idempotent
      // bronze landing + partition-scoped mart rebuild per micro-batch —
      // every batch pays real parquet writes AND a staging recompute over
      // the touched partitions, so this row bounds the rate at which the
      // on-disk mart itself can be kept current (vs the in-engine
      // windowed-mart row, which only pays state-store updates)
      case "ingest+disk-mart" =>
        val base = Files.createTempDirectory("stream_disk_mart_").toString
        phaseLog.clear()
        StreamingMarts.startIngestWithMartRefresh(
          wire, MeterGen.metersDim(spark, rate), MeterGen.customers(spark, rate),
          MeterGen.tariffRates(spark), s"$base/bronze", s"$base/mart", ckpt,
          Trigger.ProcessingTime("1 second"),
          phaseSink = (land, rebuild) => phaseLog.add((land, rebuild)))
      // the gold loop under CONTINUOUS late pressure: 5% of meters are a
      // replaying backfill shard whose whole series is re-dated one day
      // back, so after batch 0 EVERY micro-batch lands rows below
      // bronze's high-water mark and takes the derived-invalidation path
      // (lead() over the late meters' bronze tail, widened staging read,
      // TWO days' partitions rebuilt per batch instead of one) — the
      // repair cost shows up in the rebuild half of the phase table
      // -20: the same loop at 20% late (meter % 5) — the late-fraction
      // stress; -gap: 5% late re-dated THREE days back (the LateDataSpec
      // multi-day-outage shape at sweep scale) — the derived closure must
      // find each late row's successor across the gap, and the repair
      // still rebuilds only the TOUCHED day + its successor day, not the
      // gap's span or the history
      case "ingest+late-refresh" | "ingest+late-refresh-20"
          | "ingest+late-refresh-gap" =>
        val base = Files.createTempDirectory("stream_late_refresh_").toString
        phaseLog.clear()
        import org.apache.spark.sql.functions.{col, expr, when}
        val (lateMod, lateDays) = pipeline match {
          case "ingest+late-refresh-20" => (5, 1)
          case "ingest+late-refresh-gap" => (20, 3)
          case _ => (20, 1)
        }
        val lateWire = RateSimulator.toWire(
          RateSimulator.continuous(spark, meterCount = rate,
            intervalSeconds = 1, nIntervals = 1000000L)
            .withColumn("reading_timestamp",
              when(col("meter_id") % lateMod === 0,
                col("reading_timestamp") - expr(s"INTERVAL $lateDays DAY"))
                .otherwise(col("reading_timestamp"))))
        StreamingMarts.startIngestWithMartRefresh(
          lateWire, MeterGen.metersDim(spark, rate), MeterGen.customers(spark, rate),
          MeterGen.tariffRates(spark), s"$base/bronze", s"$base/mart", ckpt,
          Trigger.ProcessingTime("1 second"),
          phaseSink = (land, rebuild) => phaseLog.add((land, rebuild)))
      // streaming maintenance of the MAINTAINED ANN INDEX: every batch
      // parses the wire and lands its document-bearing readings' derived
      // embeddings as a train-free delta epoch (replay-idempotent,
      // watermark-guarded — the cube landing contract on the vector
      // surface); ONE mid-run compaction retrains the derived-√n-k
      // codebook BESIDE the landings in an offline compactor thread (the
      // deployment shape — landings never wait on a fold), its cost
      // attributed in the r12 note. Stream-built ≡ batch-built is
      // VecStreamSpec's contract; this row measures the rate at which
      // the index can be kept current.
      case "ingest+vec-index" =>
        val base = Files.createTempDirectory("stream_vec_index_").toString
        phaseLog.clear()
        val vdir = s"$base/vec"
        val q = Ingest.parseAndValidate(wire).toDF()
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val t0 = System.nanoTime()
            graft.sources.VecStoreLog.landWireEpoch(b, vdir, id)
            phaseLog.add(((System.nanoTime() - t0) / 1000000L, 0L))
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.ProcessingTime("1 second"))
          .start()
        val folder = new Thread(() => {
          Thread.sleep(10000L)
          scala.util.Try {
            val (n, k, wall) =
              graft.sources.VecStoreLog.compactWithStats(spark, vdir)
            vecFoldNotes.add(s"ingest+vec-index @$rate rows/s: mid-run fold " +
              s"at t+10s trained k=$k over n=$n vectors in $wall ms " +
              "beside the live landings")
          }.failed.foreach(e =>
            vecFoldNotes.add(s"ingest+vec-index @$rate: mid-run fold FAILED — $e"))
        })
        folder.setDaemon(true)
        folder.start()
        sideThread = Some(folder)
        q
      // the COMPRESSED-index twin of ingest+vec-index: the same derived
      // embedding side channel landed as train-free delta epochs of the
      // maintained IVF-PQ store (IvfPqLog), with ONE mid-run retraining
      // fold (coarse Lloyd + residual sub-codebooks over base ∪ delta)
      // in an offline compactor thread BESIDE the landings — the r12
      // verdict's one missing sweep row: proof the compressed store's
      // exact delta leg is bounded by code-driven cadence under a live
      // stream, not operator discipline
      case "ingest+ivfpq-index" =>
        val base = Files.createTempDirectory("stream_ivfpq_index_").toString
        phaseLog.clear()
        val vdir = s"$base/ivfpq"
        val q = Ingest.parseAndValidate(wire).toDF()
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val t0 = System.nanoTime()
            graft.sources.IvfPqLog.landWireEpoch(b, vdir, id)
            phaseLog.add(((System.nanoTime() - t0) / 1000000L, 0L))
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.ProcessingTime("1 second"))
          .start()
        val folder = new Thread(() => {
          Thread.sleep(10000L)
          scala.util.Try {
            val (n, k, wall) =
              graft.sources.IvfPqLog.compactWithStats(spark, vdir)
            vecFoldNotes.add(s"ingest+ivfpq-index @$rate rows/s: mid-run " +
              s"retraining fold at t+10s (coarse k=$k + sub-codebooks) over " +
              s"n=$n codes in $wall ms beside the live landings")
          }.failed.foreach(e =>
            vecFoldNotes.add(s"ingest+ivfpq-index @$rate: mid-run fold FAILED — $e"))
        })
        folder.setDaemon(true)
        folder.start()
        sideThread = Some(folder)
        q
      // the CHUNKED twins (r15): the same two maintained-index loops with
      // the calendar retention axis riding every landing — per batch the
      // wire's embedding side channel lands cell-ready WITH its reading's
      // crawl date through the AUTO-CADENCE hook (landWireEpochChunkedAuto:
      // the derived fold trigger rides the landing, so cadence folds fire
      // inside the measured loop), plus ONE mid-run CHUNKED retraining
      // fold in the offline compactor thread beside the landings — the
      // last surface whose streamed+chunked mode was spec-proven
      // (VecChunkedRetentionSpec) but never measured at the wire anchor
      case "ingest+vec-index-chunked" =>
        val base = Files.createTempDirectory("stream_vec_chunked_").toString
        phaseLog.clear()
        val vdir = s"$base/vec"
        val q = Ingest.parseAndValidate(wire).toDF()
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val t0 = System.nanoTime()
            // plain chunked landing (train-free), ONE offline chunked
            // fold beside the stream — the flat twin's protocol. The
            // AUTO hook is spec-proven but mismatched to this run shape:
            // with every epoch ≈ the whole base (10 K docs/s for ~30 s)
            // the derived trigger fires per batch and each batch pays a
            // full √n retrain — the tiny-corpus regime, not deployment
            graft.sources.VecStoreLog.landWireEpochChunked(b, vdir, id)
            phaseLog.add(((System.nanoTime() - t0) / 1000000L, 0L))
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.ProcessingTime("1 second"))
          .start()
        val folder = new Thread(() => {
          Thread.sleep(10000L)
          scala.util.Try {
            val (n, k, wall) =
              graft.sources.VecStoreLog.compactChunkedWithStats(spark, vdir)
            vecFoldNotes.add(s"ingest+vec-index-chunked @$rate rows/s: mid-run " +
              s"CHUNKED fold at t+10s trained k=$k over n=$n vectors in " +
              s"$wall ms beside the live landings (cell OUTER, crawl day " +
              "INNER — the retention axis in every landing and both fold trees)")
          }.failed.foreach(e =>
            vecFoldNotes.add(s"ingest+vec-index-chunked @$rate: mid-run fold FAILED — $e"))
        })
        folder.setDaemon(true)
        folder.start()
        sideThread = Some(folder)
        q
      case "ingest+ivfpq-index-chunked" =>
        val base = Files.createTempDirectory("stream_ivfpq_chunked_").toString
        phaseLog.clear()
        val vdir = s"$base/ivfpq"
        val q = Ingest.parseAndValidate(wire).toDF()
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val t0 = System.nanoTime()
            // plain chunked landing + one offline retraining fold (see
            // the vec twin's note on why the auto hook mismatches here)
            graft.sources.IvfPqLog.landWireEpochChunked(b, vdir, id)
            phaseLog.add(((System.nanoTime() - t0) / 1000000L, 0L))
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.ProcessingTime("1 second"))
          .start()
        val folder = new Thread(() => {
          Thread.sleep(10000L)
          scala.util.Try {
            val (n, k, wall) =
              graft.sources.IvfPqLog.compactChunkedWithStats(spark, vdir)
            vecFoldNotes.add(s"ingest+ivfpq-index-chunked @$rate rows/s: mid-run " +
              s"CHUNKED retraining fold at t+10s (coarse k=$k + sub-codebooks) " +
              s"over n=$n codes in $wall ms beside the live landings — both " +
              "generation trees carry the retention axis")
          }.failed.foreach(e =>
            vecFoldNotes.add(s"ingest+ivfpq-index-chunked @$rate: mid-run fold FAILED — $e"))
        })
        folder.setDaemon(true)
        folder.start()
        sideThread = Some(folder)
        q
      // the CONFIGURED default wire through the one dispatch point
      // (Ingest.parseAndValidateWire — r14): builds whichever wire the
      // default resolves to and runs the full ingest chain through the
      // dispatcher, so this row measures the switch a deployment actually
      // flips (SPARK_GRAFT_WIRE), not a hand-picked code path
      case "ingest-default-wire" =>
        val fmt = Ingest.DefaultWireFormat
        val dwire =
          if (fmt == "avro") RateSimulator.toAvroWire(
            RateSimulator.continuous(spark, meterCount = rate,
              intervalSeconds = 1, nIntervals = 1000000L))
          else wire
        Ingest.streamingDeltas(
          Ingest.parseAndValidateWire(dwire, fmt).as[Ingest.WireReading]).toDF()
          .writeStream.format("noop")
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.ProcessingTime("1 second"))
          .start()
      // the STREAMED CORPUS loop at the wire anchor: the document side
      // channel (1 meter in 16 document-bearing, DocStream.readingDocs)
      // curated and landed with ALL derived text surfaces maintained in
      // the same micro-batch — bronze (history-exact-once), posting
      // index, dedup state — through the shipped foreachBatch body
      // (DocStream.startIndexedIngest). The -chunked twin lands the
      // CALENDAR-CHUNKED layouts through startIndexedIngestChunked, so
      // the row measures what the "retention = directory drop" story
      // costs at landing time (same work + the date axis in every write)
      case "ingest+corpus" | "ingest+corpus-chunked" | "ingest+corpus-maint" =>
        val base = Files.createTempDirectory("stream_corpus_").toString
        val docStream = DocStream.readingDocs(Ingest.parseAndValidate(wire).toDF())
        // -maint (r15): live MAINTENANCE beside the landings — one
        // rebucket of the posting store (the one-fold resize at a new
        // power-of-two count) followed by the CROSS-SURFACE fsck
        // (StoreCheck.checkCorpus, bronze↔derived both directions), both
        // in the offline compactor thread at t+10s. The row's proc/input
        // answers whether the 160 K wire anchor is sustained THROUGH a
        // store resize and a full integrity audit, the
        // maintenance-beside-landings discipline the fold notes follow
        if (pipeline == "ingest+corpus-maint") {
          val maint = new Thread(() => {
            Thread.sleep(10000L)
            scala.util.Try {
              // a store mid-stream may not have COMMITTED its first epoch
              // yet at t+10s (stream start + first batch can take longer)
              // — retry the flip until a committed root exists
              val deadline = System.nanoTime() + 30000000000L
              val t0 = System.nanoTime()
              // the STREAMING-NATIVE resize: flip the landing count and
              // let the loop's own cadence fold unify — a forced fold
              // here would race the in-loop auto compactor, which the
              // CubeLog marker arbiter makes a loud failure by design
              var flipped: Option[Boolean] = None
              var lastErr: Option[Throwable] = None
              while (flipped.isEmpty && System.nanoTime() < deadline) {
                try flipped = Some(graft.sources.PostingLog
                  .rebucketDeferred(spark, s"$base/postings", 32L))
                catch { case t: Throwable => lastErr = Some(t) }
                if (flipped.isEmpty) Thread.sleep(1000L)
              }
              val pending = flipped.getOrElse(
                sys.error(s"posting store never committed a first epoch — last: $lastErr"))
              val rbMs = (System.nanoTime() - t0) / 1000000L
              val t1 = System.nanoTime()
              val findings = graft.sources.StoreCheck.checkCorpus(spark,
                s"$base/bronze", s"$base/postings", s"$base/dedup")
              val fsckMs = (System.nanoTime() - t1) / 1000000L
              val errs = findings.count(_.severity == "error")
              vecFoldNotes.add(s"ingest+corpus-maint @$rate rows/s: mid-run " +
                s"DEFERRED rebucket(32) of the live posting store flipped in " +
                s"$rbMs ms (unifying fold ${if (pending) "rides the next " +
                  "cadence fold" else "not needed"}), cross-surface fsck " +
                s"$fsckMs ms ($errs errors) — both beside the landings")
            }.failed.foreach(e =>
              vecFoldNotes.add(s"ingest+corpus-maint @$rate: mid-run maintenance FAILED — $e"))
          })
          maint.setDaemon(true)
          maint.start()
          sideThread = Some(maint)
        }
        if (pipeline == "ingest+corpus-chunked")
          DocStream.startIndexedIngestChunked(docStream, s"$base/bronze",
            s"$base/postings", s"$base/dedup", ckpt,
            Trigger.ProcessingTime("1 second"))
        else
          DocStream.startIndexedIngest(docStream, s"$base/bronze",
            s"$base/postings", s"$base/dedup", ckpt,
            Trigger.ProcessingTime("1 second"))
      // the binary-wire twins of `ingest` / `ingest-parse-only`: same
      // data, same validation, avro-core record decode instead of
      // from_json string tokenization — the deployment lever when the
      // sweep shows a pipeline parse-bound
      case "ingest-avro" | "ingest-avro-parse-only" =>
        val awire = RateSimulator.toAvroWire(
          RateSimulator.continuous(spark, meterCount = rate,
            intervalSeconds = 1, nIntervals = 1000000L))
        val parsed = Ingest.parseAndValidateAvro(awire)
        val out =
          if (pipeline == "ingest-avro")
            Ingest.streamingDeltas(parsed.as[Ingest.WireReading]).toDF()
          else parsed.toDF()
        out.writeStream.format("noop")
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.ProcessingTime("1 second"))
          .start()
      // streaming maintenance of the mergeable-sketch cube: every batch
      // pays parse+validate plus a real parquet landing of its partial
      // day sketches under batch_id=<epoch> (replay-idempotent overwrite)
      // — the rate at which the distinct-meters dashboard cube can be
      // kept current
      case "ingest+sketch-cube" =>
        val base = Files.createTempDirectory("stream_sketch_cube_").toString
        import org.apache.spark.sql.functions.col
        Ingest.parseAndValidate(wire).toDF()
          .select(col("reading_timestamp").as("ts"),
            col("meter_id").cast("long").as("user_id"))
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            graft.sources.SketchStore.appendBatch(b, s"$base/daily", id)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.ProcessingTime("1 second"))
          .start()
      // the WHOLE mergeable-cube quartet maintained from one parsed
      // stream: counts + distincts (SketchStore: n_rows SUM + HLL),
      // quantiles (HistStore), heavy hitters (HeavyHitterStore) — the
      // batch persists once (shared scan) and pays three replay-
      // idempotent parquet landings; compaction is the offline CubeLog
      // fold (CubeCompactSpec), not a per-batch cost
      case "ingest+quartet-cubes" =>
        val base = Files.createTempDirectory("stream_quartet_").toString
        import org.apache.spark.sql.functions.{col, lit}
        Ingest.parseAndValidate(wire).toDF()
          .select(col("reading_timestamp").as("ts"),
            col("meter_id").cast("long").as("user_id"),
            (col("reading_consumption_milliwatts").cast("double") / 1000000.0)
              .as("value"),
            lit("reading").as("event_type"))
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val pb = b.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              graft.sources.SketchStore.appendBatch(pb, s"$base/sketch", id)
              graft.sources.HistStore.appendBatch(pb, s"$base/hist", id)
              graft.sources.HeavyHitterStore.appendBatch(pb, s"$base/hh", id)
            } finally pb.unpersist()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.ProcessingTime("1 second"))
          .start()
      // parse+validate alone to a noop sink — subtracting this row from
      // `ingest` at the same rate attributes the stateful delta hop
      // (key shuffle + flatMapGroupsWithState get/put) vs the wire CPU
      case "ingest-parse-only" =>
        Ingest.parseAndValidate(wire).toDF()
          .writeStream.format("noop")
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.ProcessingTime("1 second"))
          .start()
      case _ =>
        val parsed = Ingest.parseAndValidate(wire).as[Ingest.WireReading]
        lazy val deltas = Ingest.streamingDeltas(parsed)
        val out = pipeline match {
          case "ingest" => deltas.toDF()
          case "ingest+mart" => StreamingMarts.hourlyGridLoad(
            deltas.toDF(), MeterGen.metersDim(spark, rate), MeterGen.gridZones(spark))
          // the online-monitor chain: per-meter keyed CUSUM state
          // (transformWithState on RocksDB) stacked on the stateful delta
          // — rate → wire → parse → delta state → chart state → alerts
          case "ingest+cusum" => StreamCusum.detect(deltas).toDF()
          // the same monitor FUSED into the delta pass — one keyed
          // stateful operator (one shuffle, one state get+put) instead of
          // two; alert-identical to ingest+cusum (StreamCusumSpec), the
          // deploy-at-capacity shape for the alerting chain
          case "ingest+cusum-fused" => StreamCusum.detectFused(parsed).toDF()
        }
        out.writeStream.format("noop")
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(Trigger.ProcessingTime("1 second"))
          .start()
    }
    // sample-count-driven: run until enough batches for stable percentiles
    // (slow pipelines complete few batches per second — a fixed wall-clock
    // window would leave their rows dominated by the 2 warm-up batches),
    // bounded by a hard cap so an unsustainable rate still terminates
    try {
      val deadline = System.nanoTime() + seconds * 2L * 1000000000L
      while (listener.series.size < 12 && System.nanoTime() < deadline)
        Thread.sleep(1000L)
    } finally {
      q.stop(); spark.streams.removeListener(listener)
      // the vec-index compactor must finish before the next run measures
      sideThread.foreach(_.join(180000L)); sideThread = None
    }
    import scala.jdk.CollectionConverters._
    // drop the first two batches: stream start pays state-store opening,
    // codegen, and the initial offset catch-up — not steady-state latency.
    // At rates the engine can't sustain, batches run many seconds and few
    // complete in the window — keep all but the first so the row still
    // reports the measured ceiling instead of an empty sample.
    val all = listener.series.asScala.toVector
    val s = if (all.size >= 6) all.drop(2) else all.drop(1)
    val durs = s.map(_.triggerMs)
    RunResult(pipeline, rate, s.size, s.map(_.rows).sum,
      pct(durs, 0.5), pct(durs, 0.95), if (durs.isEmpty) 0 else durs.max,
      if (s.isEmpty) 0.0 else s.map(_.processedRps).sum / s.size,
      s.lastOption.map(_.behind).getOrElse(0L),
      s.lift(s.size / 2).map(_.behind).getOrElse(0L))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stream-latency")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val secs = sys.env.getOrElse("SPARK_GRAFT_STREAM_SECS", "25").toInt
    // the CUSUM monitor runs transformWithState — RocksDB-backed state
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // dev knob: SPARK_GRAFT_STREAM_PIPELINES=a,b runs a subset and prints
    // the table WITHOUT overwriting STREAMING_LATENCY.md (iterating on one
    // pipeline must not ship a partial artifact)
    val only = sys.env.get("SPARK_GRAFT_STREAM_PIPELINES")
      .map(_.split(",").map(_.trim).toSet)
    val runs0 =
      Seq(10000L, 40000L, 160000L, 640000L).map(("ingest", _)) ++
        Seq(640000L).map(("ingest-parse-only", _)) ++
        Seq(160000L, 640000L).map(("ingest-avro", _)) ++
        Seq(160000L, 640000L).map(("ingest-avro-parse-only", _)) ++
        Seq(160000L).map(("ingest-default-wire", _)) ++
        Seq(40000L, 80000L, 160000L).map(("ingest+corpus", _)) ++
        Seq(40000L, 160000L).map(("ingest+corpus-maint", _)) ++
        Seq(40000L, 160000L).map(("ingest+corpus-chunked", _)) ++
        Seq(40000L, 160000L, 640000L).map(("ingest+mart", _)) ++
        Seq(40000L, 160000L, 640000L).map(("ingest+cusum", _)) ++
        Seq(40000L, 160000L, 640000L).map(("ingest+cusum-fused", _)) ++
        Seq(10000L, 40000L, 160000L, 640000L).map(("ingest+disk-mart", _)) ++
        Seq(40000L, 160000L).map(("ingest+late-refresh", _)) ++
        Seq(160000L).map(("ingest+late-refresh-20", _)) ++
        Seq(160000L).map(("ingest+late-refresh-gap", _)) ++
        Seq(40000L, 160000L, 640000L).map(("ingest+sketch-cube", _)) ++
        Seq(40000L, 160000L, 640000L).map(("ingest+quartet-cubes", _)) ++
        Seq(40000L, 160000L).map(("ingest+vec-index", _)) ++
        Seq(40000L, 160000L).map(("ingest+ivfpq-index", _)) ++
        Seq(160000L).map(("ingest+vec-index-chunked", _)) ++
        Seq(160000L).map(("ingest+ivfpq-index-chunked", _))
    val runs = only match {
      case Some(names) => runs0.filter(r => names.contains(r._1))
      case None => runs0
    }
    // warm-up: one short throwaway run pays JIT/codegen per shape family
    if (only.isEmpty) {
      run(spark, "ingest+mart", 10000L, 6)
      run(spark, "ingest+cusum", 10000L, 6)
      run(spark, "ingest+cusum-fused", 10000L, 6)
      run(spark, "ingest-avro", 10000L, 6)
    } else runs.headOption.foreach { case (p, _) => run(spark, p, 10000L, 6) }

    val phaseRows = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Int, Long, Long, Long, Long)]
    val results = runs.map { case (p, r) =>
      val res = run(spark, p, r, secs)
      if (p == "ingest+disk-mart" || p.startsWith("ingest+late-refresh") ||
          p.startsWith("ingest+vec-index") || p.startsWith("ingest+ivfpq-index")) {
        import scala.jdk.CollectionConverters._
        // same warm-up discipline as the latency rows: drop the first two
        // batches (state-store open, codegen, first parquet commit)
        val all = phaseLog.asScala.toVector
        val ps = if (all.size >= 6) all.drop(2) else all.drop(1)
        if (ps.nonEmpty) phaseRows += ((p, r, ps.size,
          pct(ps.map(_._1), 0.5), pct(ps.map(_._2), 0.5),
          ps.map(_._1).max, ps.map(_._2).max))
      }
      res
    }

    val sb = new StringBuilder
    sb.append("# STREAMING_LATENCY — per-batch latency vs input rate\n\n")
    sb.append(s"Generated by `graft.streaming.StreamLatencyReport` (local[$cpus], ")
    sb.append(s"1 s trigger; each run collects up to 12 batches bounded by ")
    sb.append(s"${secs * 2} s wall, first 2 batches dropped as warm-up — stream\n")
    sb.append("start pays state-store opening, dim broadcast, and codegen).\n\n")
    sb.append("Pipelines: `ingest` = rate→JSON wire→parse+validate→per-meter stateful\n")
    sb.append("delta (flatMapGroupsWithState)→noop; `ingest+mart` adds the watermarked\n")
    sb.append("hourly grid-load window + broadcast dim joins; `ingest+cusum` stacks the\n")
    sb.append("online per-meter CUSUM drift chart (transformWithState, RocksDB state)\n")
    sb.append("on the stateful delta — the alerting-monitor chain as two composed\n")
    sb.append("keyed operators (two shuffles, two state hops);\n")
    sb.append("`ingest+cusum-fused` is the SAME alert stream from one fused keyed\n")
    sb.append("operator (delta+chart in one 5-BIGINT state row — one shuffle, one\n")
    sb.append("RocksDB get+put; StreamCusumSpec proves alert equality);\n")
    sb.append("`ingest+disk-mart` is\n")
    sb.append("the gold-maintenance loop (idempotent bronze parquet landing +\n")
    sb.append("partition-scoped billing-mart rebuild per micro-batch — real disk\n")
    sb.append("writes and a staging recompute every batch);\n")
    sb.append("`ingest+sketch-cube` maintains the mergeable HLL distinct cube —\n")
    sb.append("every batch lands its partial day sketches as a real parquet write\n")
    sb.append("under batch_id=<epoch> (replay-idempotent overwrite);\n")
    sb.append("`ingest+quartet-cubes` maintains the WHOLE mergeable-cube quartet\n")
    sb.append("(counts + distincts via SketchStore, quantiles via HistStore, heavy\n")
    sb.append("hitters via HeavyHitterStore) from one persisted parse — three\n")
    sb.append("replay-idempotent landings per batch, compaction amortized offline\n")
    sb.append("(the CubeLog fold, CubeCompactSpec);\n")
    sb.append("`ingest+vec-index` maintains the ANN index from the wire: each batch\n")
    sb.append("lands its document-bearing readings' (1 meter in 16) derived 64-dim\n")
    sb.append("embeddings as a train-free delta epoch (VecStoreLog.landWireEpoch,\n")
    sb.append("replay-idempotent + watermark-guarded); one mid-run compaction\n")
    sb.append("retrains the derived-sqrt(n)-k codebook in an offline compactor\n")
    sb.append("thread BESIDE the landings — see the r12 note for its attributed\n")
    sb.append("cost (landings never wait on the fold; VecStreamSpec proves\n")
    sb.append("stream-built ≡ batch-built probes);\n")
    sb.append("`ingest+ivfpq-index` is the COMPRESSED-index twin: the same embedding\n")
    sb.append("side channel landed as train-free delta epochs of the maintained\n")
    sb.append("IVF-PQ store (IvfPqLog.landWireEpoch), one mid-run RETRAINING fold\n")
    sb.append("(coarse Lloyd + residual sub-codebooks over base ∪ delta) in an\n")
    sb.append("offline compactor thread beside the landings — the exact delta leg\n")
    sb.append("bounded by the code-derived cadence (IvfPqLog.shouldCompact);\n")
    sb.append("`ingest+vec-index-chunked` / `ingest+ivfpq-index-chunked` (r15) are\n")
    sb.append("the same two loops with the CALENDAR RETENTION AXIS riding every\n")
    sb.append("landing (landWireEpochChunked: crawl day = the reading's own date,\n")
    sb.append("cell OUTER / crawl day INNER in the folds — probes prune unchanged,\n")
    sb.append("expiring a day stays bounded directory deletes), with one mid-run\n")
    sb.append("CHUNKED retraining fold beside the landings, exactly the flat\n")
    sb.append("twins' protocol. The AUTO hook (landWireEpochChunkedAuto) is\n")
    sb.append("spec-proven (VecChunkedRetentionSpec) but mismatched to this run\n")
    sb.append("shape — with every epoch comparable to the whole base the derived\n")
    sb.append("trigger fires per batch and each batch pays a full sqrt(n) retrain\n")
    sb.append("(the tiny-corpus regime, not deployment: at production sizes f*\n")
    sb.append("fires rarely); and a side-thread fold CONCURRENT with in-loop auto\n")
    sb.append("folds is a loud failure by design (the CubeLog marker arbiter — the\n")
    sb.append("first draft of these rows demonstrated it live);\n")
    sb.append("`ingest+late-refresh` is `ingest+disk-mart` under CONTINUOUS late\n")
    sb.append("pressure — 5% of meters are a replaying backfill shard re-dated one\n")
    sb.append("day back, so every batch lands below bronze's high-water mark and\n")
    sb.append("takes the derived-invalidation path (lead over the late meters'\n")
    sb.append("bronze tail + a second day's partition rebuilt per batch);\n")
    sb.append("`ingest+late-refresh-20` is the same loop at 20% late meters\n")
    sb.append("(the late-fraction stress) and `ingest+late-refresh-gap` re-dates\n")
    sb.append("the 5% late shard THREE days back (the multi-day-outage shape) —\n")
    sb.append("together they pin that repair cost scales with TOUCHED partitions,\n")
    sb.append("not the late fraction's row count, the gap span, or history;\n")
    sb.append("`ingest-parse-only` stops after parse+validate — subtract it from\n")
    sb.append("`ingest` at the same rate to attribute the per-meter stateful hop\n")
    sb.append("(key shuffle + flatMapGroupsWithState RocksDB get/put) vs wire CPU.\n")
    sb.append("`ingest-avro` / `ingest-avro-parse-only` are the binary-wire twins\n")
    sb.append("of `ingest` / `ingest-parse-only`: identical data and validation,\n")
    sb.append("avro-core record decode instead of from_json string tokenization —\n")
    sb.append("compare at 640 K where the JSON rows are parse-bound.\n")
    sb.append("`ingest-default-wire` (r14) runs the full ingest chain through the\n")
    sb.append("ONE wire dispatch point (Ingest.parseAndValidateWire at its\n")
    sb.append("configured default — binary unless SPARK_GRAFT_WIRE overrides): the\n")
    sb.append("row a deployment reads to confirm the shipped default sustains the\n")
    sb.append("anchor; the reference's snappy-JSON stays the compat wire.\n")
    sb.append("`ingest+corpus` (r14) is the STREAMED CORPUS loop at the wire\n")
    sb.append("anchor: the document side channel (1 meter in 16 document-bearing,\n")
    sb.append("DocStream.readingDocs — 64-token deterministic docs) flows through\n")
    sb.append("the REAL curation gate and lands with every derived text surface\n")
    sb.append("maintained in the same micro-batch — bronze (history exact-once),\n")
    sb.append("posting index, incremental dedup state, all with auto-cadence\n")
    sb.append("folds (DocStream.startIndexedIngest);\n")
    sb.append("`ingest+corpus-chunked` lands the CALENDAR-CHUNKED layouts instead\n")
    sb.append("(startIndexedIngestChunked: chunk_date on bronze, postings, and\n")
    sb.append("dedup sigs) — the cost of the retention-by-directory-drop story at\n")
    sb.append("landing time is the delta between the two rows.\n")
    sb.append("`ingest+corpus-maint` (r15) is `ingest+corpus` with LIVE MAINTENANCE\n")
    sb.append("beside the landings: at t+10s the offline thread runs the DEFERRED\n")
    sb.append("rebucket (PostingLog.rebucketDeferred — stamp roots, flip the\n")
    sb.append("landing count, let the loop's own cadence fold unify; per-root _nb\n")
    sb.append("keeps every probe exact mid-transition, and a forced fold here\n")
    sb.append("would race the in-loop compactor) and then the cross-surface fsck\n")
    sb.append("(StoreCheck.checkCorpus, bronze↔derived both directions) — the\n")
    sb.append("row's proc/input answers whether the wire anchor is sustained\n")
    sb.append("THROUGH a resize plus a full integrity audit (walls in the fold\n")
    sb.append("note below).\n")
    sb.append("`behind` is the\n")
    sb.append("Kafka-lag analogue, source latestOffset − batch endOffset, in the\n")
    sb.append("source's offset unit (SECONDS of backlog for the rate source; 0 =\n")
    sb.append("every batch drained the source completely).\n\n")
    sb.append("Reference anchors (README.md:119-122): ~10 K rec/s per consumer,\n")
    sb.append("40 K/s aggregate as shipped, 160 K/s claimed at 16 consumers.\n\n")
    sb.append("| pipeline | input rows/s | batches | rows | batch p50 ms | p95 ms | max ms | processed rows/s | proc/input | behind@mid | behind@end | keeping up |\n")
    sb.append("|---|---|---|---|---|---|---|---|---|---|---|---|\n")
    results.foreach { r =>
      sb.append(s"| ${r.pipeline} | ${r.rate} | ${r.batches} | ${r.totalRows} | ")
      sb.append(s"${r.medMs} | ${r.p95Ms} | ${r.maxMs} | ${r.meanProcessedRps.round} | ")
      sb.append(f"${r.meanProcessedRps / r.rate}%.2f | ")
      sb.append(s"${r.midBehind} | ${r.endBehind} | ${if (r.keepingUp) "YES" else "NO"} |\n")
    }
    if (phaseRows.nonEmpty) {
      sb.append("\n## Gold-loop phase attribution (per-batch foreachBatch timing)\n\n")
      sb.append("Which half of the gold-maintenance loop bounds the sustainable rate:\n")
      sb.append("`land` = idempotent bronze parquet append (anti-join + write),\n")
      sb.append("`rebuild` = partition-scoped staging recompute + billing-mart dynamic\n")
      sb.append("partition overwrite. For `ingest+late-refresh` the rebuild half also\n")
      sb.append("carries the per-batch late-data repair: invalidation-set derivation\n")
      sb.append("(lead over the late meters' bronze tail) plus the second day's\n")
      sb.append("partition rewrite. Milliseconds per micro-batch, warm-up dropped.\n\n")
      sb.append("For `ingest+vec-index` and `ingest+ivfpq-index`, `land` = embedding\n")
      sb.append("derivation + delta-epoch parquet write and the rebuild column is 0\n")
      sb.append("by design — their folds run asynchronously (cost in the note below).\n\n")
      sb.append("| pipeline | input rows/s | batches | land p50 ms | rebuild p50 ms | land max | rebuild max |\n")
      sb.append("|---|---|---|---|---|---|---|\n")
      phaseRows.foreach { case (p, rate, n, lp50, rp50, lmax, rmax) =>
        sb.append(s"| $p | $rate | $n | $lp50 | $rp50 | $lmax | $rmax |\n")
      }
      sb.append("\n")
    }
    if (!vecFoldNotes.isEmpty) {
      sb.append("\n### Maintained vector indexes on the gold loop (r12 + r13)\n\n")
      sb.append("Both vector stores join the cube quartet on the streaming\n")
      sb.append("maintenance surface: train-free epoch landings per micro-batch at\n")
      sb.append("the wire anchor, with the retraining fold paid OFFLINE beside the\n")
      sb.append("stream (the compaction-cadence triggers VecStoreLogSpec and\n")
      sb.append("IvfPqLogSpec pin; probes stay exact on fresh vectors throughout —\n")
      sb.append("the live delta is brute-scored on both stores).\n")
      sb.append("Measured mid-run folds:\n\n")
      import scala.jdk.CollectionConverters._
      vecFoldNotes.asScala.foreach(n => sb.append(s"- $n\n"))
      sb.append("\nBoth rates sustain THROUGH the fold (0.96-1.02 proc/input at the\n")
      sb.append("160 K anchor across same-day r12 runs — the documented boundary\n")
      sb.append("band; backlog 0 at mid and end in every draw): the landings are a\n")
      sb.append("pure parse+project+write path, so the fold's Lloyd jobs\n")
      sb.append("time-share the same cores without pushing any batch over its\n")
      sb.append("trigger. The fold wall grows ~n·√n (Lloyd at the derived k≈√n) —\n")
      sb.append("at cluster scale the compactor runs on its own executors (or a\n")
      sb.append("scheduler pool), exactly like every CubeLog fold in the quartet.\n")
      sb.append("\n")
    }
    sb.append("\n### r10 gold-loop cost-structure note\n\n")
    sb.append("r10 rebuilt the landing half (the r9 phase table's bound): the\n")
    sb.append("idempotent anti-join's existing-keys read is KEY-RANGE-bounded —\n")
    sb.append("the composite key contains the timestamp, so a pushed-down\n")
    sb.append("[batch min, max] predicate lets parquet row-group statistics skip\n")
    sb.append("every non-overlapping file: a forward-moving stream reads ZERO\n")
    sb.append("existing row groups at steady state, a replay reads back exactly its\n")
    sb.append("own original landing — O(batch), not O(day-so-far). The batch now\n")
    sb.append("parses ONCE (persisted; touched dates piggyback on the bounds\n")
    sb.append("aggregate and return to the caller), the isEmpty pre-probe job is\n")
    sb.append("gone, and the rebuild's staging reads exactly touched ∪ previous\n")
    sb.append("date partitions (static literal prunes — no batch re-scan). Net at\n")
    sb.append("the 160 K anchor: land p50 11.2 s → ~5 s, rebuild 4.4 s → ~2 s,\n")
    sb.append("whole-batch p50 11.6 s → ~7 s. The proc/input ratio READS lower than\n")
    sb.append("r9's 1.45 precisely because batches got FASTER: equilibrium batch\n")
    sb.append("size fell ~3× (1.1 M vs 3.2 M rows), so per-batch fixed cost (~2.5 s:\n")
    sb.append("job scheduling, parquet commits, state bookkeeping) amortizes over\n")
    sb.append("fewer rows — r9's higher ratio was batch-size economies purchased\n")
    sb.append("with 2× the event-to-mart latency. The backlog stays flat at 0 and\n")
    sb.append("total rows processed ≈ rate × wall, i.e. the loop drains its input;\n")
    sb.append("read the 160 K row as AT CAPACITY with half the latency, not as a\n")
    sb.append("throughput regression. At 640 K every pipeline is parse-bound: the\n")
    sb.append("`ingest-parse-only` and plain `ingest` rows both top out in the same\n")
    sb.append("~430-560 K rows/s band (run-to-run batch-size dynamics swap their\n")
    sb.append("order — once batches are large the stateful hop's per-key cost\n")
    sb.append("amortizes to noise), i.e. JSON wire decode is the shared CPU\n")
    sb.append("ceiling at ~14-17 K rows/s/core. 640 K/s therefore needs ~1.3-1.5×\n")
    sb.append("these cores for decode alone before any stateful work — the shard\n")
    sb.append("math a cluster deployment starts from (keyed operators shard by\n")
    sb.append("meter_id; nothing in the plan serializes).\n")
    sb.append("\n### r11 notes: the Avro answer to the parse ceiling; late repair at rate\n\n")
    sb.append("The r10 640 K finding ('every pipeline parse-bound on from_json at\n")
    sb.append("~14-17 K rows/s/core') now has its deployment lever MEASURED: the\n")
    sb.append("binary wire twin converts the 640 K NO outright. `ingest-avro`\n")
    sb.append("sustains 640 K rows/s (proc/input 1.01, backlog 0) where JSON\n")
    sb.append("`ingest` tops out at ~0.87; the parse-only rows put numbers on the\n")
    sb.append("codec gap — avro-core record decode ~2.7-2.8 M rows/s on 32 cores\n")
    sb.append("(~86 K rows/s/core) vs from_json's ~420-550 K (~13-17 K rows/s/core),\n")
    sb.append("a ~6x per-core decode advantage at identical data and validation.\n")
    sb.append("(Near 160 K both codecs sit at the 0.95 verdict boundary - that is\n")
    sb.append("the jitter band, not a regression; read the ratio.) Deployment\n")
    sb.append("guidance follows: at JSON wire rates >= ~500 K rows/s/32-core-node,\n")
    sb.append("switch the wire to binary before adding nodes - decode, not state,\n")
    sb.append("is what the extra nodes would buy.\n\n")
    sb.append("`ingest+late-refresh` wires the derived late-data invalidation into\n")
    sb.append("the gold loop at rate: with 5% of meters replaying one day behind in\n")
    sb.append("EVERY batch (the pathological continuous-late shape, not an episodic\n")
    sb.append("replay), the loop sustains the 160 K anchor (proc/input 1.01,\n")
    sb.append("backlog 0). The phase table attributes the repair: land stays\n")
    sb.append("~2.2-2.7 s (the anti-join reads back only its own key range), while\n")
    sb.append("rebuild carries the late cost at p50 ~6.5-7 s - the two-day staging\n")
    sb.append("recompute + second partition overwrite dominates; the derivation\n")
    sb.append("itself (lead over each late meter's LAST row per day, timestamp-\n")
    sb.append("bounded) and the gap probe (skipped entirely when no bronze partition\n")
    sb.append("predates the base slice - a driver-side listing decides) are noise.\n\n")
    sb.append("\n### r12 note: late-fraction and gap stress for the derived invalidation\n\n")
    sb.append("The claim under test: repair cost is bounded by TOUCHED PARTITIONS\n")
    sb.append("(each batch rebuilds its current day + the late shard's successor\n")
    sb.append("day), never by the late fraction's row count, the gap's span, or\n")
    sb.append("history length. Same-day three-way control at the 160 K anchor\n")
    sb.append("(150 s windows, so all three reach the same large-batch\n")
    sb.append("equilibrium; absolute batch sizes are bigger than this table's\n")
    sb.append("50 s-window rows — compare across the three, not against the table):\n\n")
    sb.append("| variant | batches | batch p50 ms | land p50 | rebuild p50 | processed rows/s |\n")
    sb.append("|---|---|---|---|---|---|\n")
    sb.append("| 5% late, 1 day (baseline) | 4 | 31746 | 11212 | 20293 | 275530 |\n")
    sb.append("| 20% late, 1 day (4x rows) | 5 | 23547 | 8347 | 14994 | 304387 |\n")
    sb.append("| 5% late, 3-day gap | 4 | 24162 | 7713 | 16215 | 274559 |\n\n")
    sb.append("4x the late rows does NOT 4x the rebuild (p50 14994 vs 20293 ms —\n")
    sb.append("within batch-size jitter of the baseline, and per-row throughput is\n")
    sb.append("HIGHER at 20%), and the 3-day gap costs the same as the 1-day form\n")
    sb.append("(the derived closure probes each late meter's successor via lead()\n")
    sb.append("over a bounded tail regardless of gap width; the rebuild still\n")
    sb.append("touches exactly two day partitions). All three sustain (backlog 0\n")
    sb.append("at mid and end). The late-row volume rides inside the partitions\n")
    sb.append("the loop rewrites anyway — the invalidation DERIVATION is the only\n")
    sb.append("per-late-row cost, and it is noise at both fractions.\n\n")
    sb.append("In the 50 s-window generation above, all three 160 K late rows drew\n")
    sb.append("proc/input 0.90-0.91 on 3-batch samples — the batch-count-limited\n")
    sb.append("downside the disk-mart note below documents (the r11 generation's\n")
    sb.append("5%-late row drew 1.01 on the same pipeline). Read the family as AT\n")
    sb.append("CAPACITY with flat backlog; this 150 s three-way control and the r11\n")
    sb.append("draw bracket the same capacity, and the three variants stay within\n")
    sb.append("jitter of EACH OTHER in every window, which is the stress claim.\n\n")
    sb.append("The `ingest+disk-mart` 160 K row drew proc/input 0.80 in this\n")
    sb.append("generation; two same-day re-runs of the same pipeline measured 0.91\n")
    sb.append("and 0.97 - the row remains AT CAPACITY (r10's reading) with downside\n")
    sb.append("jitter from batch-count-limited sampling at 5-10 batches per run;\n")
    sb.append("read the ratio band, not the single draw.\n")
    sb.append("\n### r14 note: the default wire is binary; the corpus loop rides the anchor\n\n")
    sb.append("The r11 deployment guidance ('switch the wire to binary before adding\n")
    sb.append("nodes') is now the DEFAULT, not advice: Ingest.parseAndValidateWire is\n")
    sb.append("the one dispatch point and resolves to the Avro wire unless\n")
    sb.append("SPARK_GRAFT_WIRE=json (the reference's snappy-JSON stays the compat\n")
    sb.append("wire for its producers). The `ingest-default-wire` 160 K row is the\n")
    sb.append("switch exercised end to end (sustained, proc/input ~0.99-1.01),\n")
    sb.append("replacing the JSON `ingest` row's 0.93 NO as the shipped-config answer\n")
    sb.append("at the anchor; the JSON rows remain as the measured compat cost.\n\n")
    sb.append("\n### r15 note: the corpus rows measure REAL landings; live maintenance beside them\n\n")
    sb.append("Round 15 found that every wire-derived document had been REJECTED by\n")
    sb.append("the curation gate since the projection was introduced: the original\n")
    sb.append("12-word synthetic vocabulary capped distinct_frac at 12/64 = 0.19,\n")
    sb.append("under the Gopher repetition floor of 0.3, so curate emitted zero rows\n")
    sb.append("and the r14 corpus rows measured parse + dedup-state only — the\n")
    sb.append("foreachBatch landing bodies never ran. (Found when the maint row's\n")
    sb.append("mid-run rebucket kept failing on a posting store no batch had ever\n")
    sb.append("landed into — the maintenance row audited the measurement itself.)\n")
    sb.append("The vocabulary now satisfies every gate rule (40 words,\n")
    sb.append("distinct_frac ~0.5, stop_frac ~0.05, ~84% of docs pass), and with\n")
    sb.append("landings REAL the triple-surface loop (bronze dedup anti-join +\n")
    sb.append("posting landing + dedup signatures/labels per micro-batch, 1 doc per\n")
    sb.append("16 wire rows) sustains the 40 K wire row (~2.5 K docs/s, the\n")
    sb.append("at-capacity band across flat/chunked/maint variants) and does NOT\n")
    sb.append("keep up at 160 K on local[32] (0.37-0.52) — the honest single-node\n")
    sb.append("capacity of maintaining three index surfaces inside the landing\n")
    sb.append("loop. At cluster scale the loop shards by doc hash across executors,\n")
    sb.append("so the 40 K single-node row is the per-node budget, not the system\n")
    sb.append("ceiling; the 160 K rows stay as measured overload behavior (backlog\n")
    sb.append("0 while batches grow — micro-batch saturation). ingest+corpus-maint\n")
    sb.append("runs the DEFERRED rebucket (10-17 ms flip; the unifying fold rides\n")
    sb.append("the loop's cadence fold) plus the full cross-surface fsck (~4 s,\n")
    sb.append("0 errors) beside the landings with the 40 K row YES at 0.97. The\n")
    sb.append("chunked VECTOR wire rows land the retention axis at the full 160 K\n")
    sb.append("anchor (meter-stride side channels, not doc-gated): vec 1.00 YES,\n")
    sb.append("ivfpq 0.93 at-capacity, each with one mid-run CHUNKED retraining\n")
    sb.append("fold beside the landings. A corpus streamed chunked is aged out by\n")
    sb.append("CorpusRtbf.expireEverywhere with driver-side directory drops\n")
    sb.append("(DocStreamSpec proves stream-built chunked ≡ batch-built chunked\n")
    sb.append("store answers — that equivalence was never affected).\n")
    sb.append("\nThe YES/NO verdict carries a 5% slack (processed >= 0.95x input with\n")
    sb.append("flat backlog); rows whose proc/input sits inside 0.95-1.05 are AT\n")
    sb.append("CAPACITY and flip with run-to-run jitter — read the ratio, not the\n")
    sb.append("label, near the boundary. Low rates pay the ~1.3 s fixed micro-batch\n")
    sb.append("floor disproportionately (a 40 K row can read lower proc/input than\n")
    sb.append("the same pipeline's 160 K row for exactly that reason).\n")
    sb.append("\nReading: a row is sustainable when `behind` is flat across the second\n")
    sb.append("half of the run and processed ≥ input rate; p50/p95 batch duration is\n")
    sb.append("the event-to-sink latency floor a consumer SLO would bound. At cluster\n")
    sb.append("scale the same pipeline shards by meter_id across executors — the\n")
    sb.append("stateful operators are already keyed, so rates scale with cores until\n")
    sb.append("a single key's traffic exceeds one core (not possible here: one\n")
    sb.append("reading per meter per interval).\n")
    if (only.isEmpty) Files.writeString(Paths.get("STREAMING_LATENCY.md"), sb.toString)
    println(sb.toString)
    spark.stop()
  }
}
