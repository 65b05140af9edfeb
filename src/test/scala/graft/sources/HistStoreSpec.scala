package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The mergeable-histogram cube contract: per-day partial histograms SUM
  * back to exactly the direct histogram over the range (the merge is a
  * plain combinable aggregate), appends touch no existing file and may
  * even duplicate (day,bucket) keys across files without changing any
  * probe answer, and the registered probes' store-derived quantile
  * buckets equal `exact_quantile div W` — deterministically, not within
  * a bound. */
class HistStoreSpec extends SparkSpec {
  import spark.implicits._

  private def events = graft.ops.Tables.events(spark, sf0001)

  test("summed per-day partials ≡ the direct histogram over the range (count-exact)") {
    val dir = Files.createTempDirectory("hist_store_").toString + "/daily"
    HistStore.build(events, dir)
    val merged = spark.read.parquet(dir)
      .groupBy($"bucket").agg(sum($"cnt").as("cnt"))
    val direct = events
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("v_c"))
      .withColumn("bucket", expr(s"v_c div ${HistStore.W}L"))
      .groupBy($"bucket").agg(count(lit(1)).as("cnt"))
    assert(merged.join(direct, Seq("bucket"), "full_outer")
      .filter(merged("cnt") =!= direct("cnt")
        || merged("cnt").isNull || direct("cnt").isNull)
      .count() === 0,
      "day-grain partial counts must SUM to the direct histogram exactly")
  }

  test("append is additive and merge-tolerant: old files untouched, duplicate day keys fold by SUM") {
    val dir = Files.createTempDirectory("hist_store_app_").toString + "/daily"
    val d0 = events.select(to_date($"ts").as("day")).agg(min($"day")).head.getDate(0)
    val head = events.filter(to_date($"ts") === lit(d0))
    val rest = events.filter(to_date($"ts") =!= lit(d0))
    HistStore.build(rest, dir)
    val before = spark.read.parquet(dir).select(input_file_name()).distinct()
      .as[String].collect().toSet
    // append d0 in TWO partial batches — (day,bucket) keys repeat across
    // files; the probe-side SUM merge must fold them like any partial agg
    val half = head.filter(pmod($"event_id", lit(2)) === 0)
    HistStore.appendDay(half, dir)
    HistStore.appendDay(head.except(half), dir)
    val after = spark.read.parquet(dir).select(input_file_name()).distinct()
      .as[String].collect().toSet
    assert(before.subsetOf(after), "append must not rewrite existing files")
    val merged = spark.read.parquet(dir).agg(sum($"cnt")).head.getLong(0)
    assert(merged === events.count(), "every event counted exactly once")
  }

  test("stream-maintained store ≡ batch-built; epoch replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val e = events.select($"ts", $"user_id", $"event_type", $"value").cache()
    try {
      val rows = e.as[(java.sql.Timestamp, Long, String, Double)].collect().toSeq
      val streamDir = Files.createTempDirectory("hist_stream_").toString + "/daily"
      val batchDir = Files.createTempDirectory("hist_batch_").toString + "/daily"
      HistStore.build(e, batchDir)
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(java.sql.Timestamp, Long, String, Double)]
      val q = mem.toDF().toDF("ts", "user_id", "event_type", "value").writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          HistStore.appendBatch(b, streamDir, id)
        }
        .option("checkpointLocation",
          Files.createTempDirectory("hist_stream_ckpt_").toString)
        .start()
      val (a, bc) = rows.splitAt(rows.size / 3)
      val (b, c) = bc.splitAt(bc.size / 2)
      Seq(a, b, c).foreach { slice => mem.addData(slice); q.processAllAvailable() }
      q.stop()
      def hist(dir: String) = spark.read.parquet(dir)
        .groupBy($"day", $"event_type", $"bucket").agg(sum($"cnt").as("cnt"))
        .as[(java.sql.Date, String, Long, Long)].collect().toSet
      val fromStream = hist(streamDir)
      assert(fromStream === hist(batchDir))
      HistStore.appendBatch(b.toDF("ts", "user_id", "event_type", "value"),
        streamDir, 1L)
      assert(hist(streamDir) === fromStream, "replay must not double-count")
    } finally e.unpersist()
  }

  test("registered probes: store bucket == exact div W on every scope; weekly n partition the span") {
    val probe = graft.SparkEntry.queries("hist_store_probe")(spark, sf0001).cache()
    try {
      assert(probe.count() > 1, "weekly scopes + the all row")
      assert(probe.filter($"p50_bucket" =!= expr(s"exact_p50_c div ${HistStore.W}L")
          || $"p95_bucket" =!= expr(s"exact_p95_c div ${HistStore.W}L"))
        .count() === 0,
        "the store-located rank bucket must be the bucket containing the exact quantile")
      val all = probe.filter($"scope" === "all").head.getAs[Long]("n_rows")
      val wk = probe.filter($"scope" =!= "all").agg(sum($"n_rows")).head.getLong(0)
      assert(all === wk, "weekly row counts must partition the full span")
    } finally probe.unpersist()
    val roll = graft.SparkEntry.queries("hist_store_rollup")(spark, sf0001)
    assert(roll.filter($"p50_bucket" =!= expr(s"exact_p50_c div ${HistStore.W}L"))
      .count() === 0)
  }
}
