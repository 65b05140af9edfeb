package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming maintenance of the mergeable-sketch cube: per-micro-batch
  * partial day sketches landed under `batch_id=<epoch>` with overwrite.
  * Contracts proven here: (1) the stream-built store answers EXACTLY
  * like the batch-built store (register-max merge is associative over
  * any batch slicing); (2) replaying an epoch rewrites its own partition
  * dir and changes nothing — exactly-once store contents over an
  * at-least-once foreachBatch channel. */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream-maintained cube ≡ batch-built cube; epoch replay is a no-op") {
    val events = graft.ops.Tables.events(spark, sf0001)
      .select($"ts", $"user_id").cache()
    try {
      val rows = events.as[(Timestamp, Long)].collect().toSeq
      val streamDir = Files.createTempDirectory("sketch_stream_").toString + "/daily"
      val batchDir = Files.createTempDirectory("sketch_batch_").toString + "/daily"
      SketchStore.build(events, batchDir)

      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Timestamp, Long)]
      val q = mem.toDF().toDF("ts", "user_id").writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          SketchStore.appendBatch(b, streamDir, id)
        }
        .option("checkpointLocation",
          Files.createTempDirectory("sketch_stream_ckpt_").toString)
        .start()
      // three uneven micro-batches slicing days arbitrarily
      val (a, bc) = rows.splitAt(rows.size / 5)
      val (b, c) = bc.splitAt(bc.size / 2)
      Seq(a, b, c).foreach { slice => mem.addData(slice); q.processAllAvailable() }
      q.stop()

      def estimates(dir: String) = spark.read.parquet(dir)
        .groupBy($"day")
        .agg(hll_sketch_estimate(hll_union_agg($"sketch")).as("est"))
        .as[(java.sql.Date, Long)].collect().toMap
      val fromStream = estimates(streamDir)
      assert(fromStream === estimates(batchDir),
        "any batch slicing must union to the same registers per day")

      // replay epoch 1: same rows, same batch_id → same path overwritten
      SketchStore.appendBatch(b.toDF("ts", "user_id"), streamDir, 1L)
      assert(estimates(streamDir) === fromStream, "replay must not double-count")
    } finally events.unpersist()
  }
}
