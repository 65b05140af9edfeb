package graft.meter

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Design-scale smoke (BASELINE.md: 1M meters): the generator + LAG staging
  * + billing mart pipeline at the reference's meter cardinality (4
  * intervals to keep test runtime bounded — the per-meter interval count
  * scales linearly and independently). Guards against overflow/cliff
  * regressions that sf0.01 correctness runs can't see. */
class ScaleSpec extends SparkSpec {

  test("1M meters flow through generation -> staging -> billing mart") {
    val nMeters = 1000000L
    val raw = MeterGen.readings(spark, nMeters, 4)
    val stg = Staging.stgMeterReadings(raw)
    val mart = Marts.factCustomerBillingDaily(
      stg, MeterGen.metersDim(spark, nMeters), MeterGen.customers(spark, nMeters),
      MeterGen.tariffRates(spark))
    // one row per customer-day; all meters present exactly once
    assert(mart.count() == nMeters)
    val agg = mart.agg(
      sum(col("total_reading_count")).as("readings"),
      min(col("total_consumption_kwh")).as("min_kwh"),
      max(col("data_quality_pct")).as("max_q")).head()
    assert(agg.getAs[Long]("readings") == nMeters * 4)
    assert(agg.getAs[Double]("min_kwh") > 0)
    assert(agg.getAs[Double]("max_q") <= 100.0)
  }

  test("two-level prefix-sum packing bins 2M synthetic docs without a global window") {
    // synthetic (doc_id, n-token) corpus straight from range — exercises
    // the chunk-partitioned cumulative-sum shape at design scale
    val n = 2000000L
    val budget = 2048L
    val chunk = 1000L
    val toks = spark.range(1, n + 1).select(
      col("id").as("doc_id"),
      (col("id") % 97 + 3).as("n"),
      expr(s"id div $chunk").as("chunk"))
    val chunkTotals = toks.groupBy(col("chunk"))
      .agg(sum(col("n")).as("chunk_tokens"))
      // single-task BY DESIGN on the ~n/chunk-row collapsed frame;
      // pmod(…,1) is the repo's non-foldable constant key so the
      // bare-global-window warning stays reserved for real regressions
      .withColumn("chunk_end", sum(col("chunk_tokens")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(col("chunk"), lit(1L)))
          .orderBy(col("chunk"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("chunk"), (col("chunk_end") - col("chunk_tokens")).as("offset"))
    val wChunk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val binned = toks.join(broadcast(chunkTotals), Seq("chunk"))
      .withColumn("c", sum(col("n")).over(wChunk) + col("offset"))
      .withColumn("bin_id", expr(s"(c - n) div $budget"))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"))
    val stats = binned.agg(
      count(lit(1)).as("bins"),
      sum(col("n_docs")).as("docs"),
      sum(col("total_tokens")).as("toks"),
      max(col("total_tokens")).as("max_bin")).head()
    assert(stats.getAs[Long]("docs") == n)
    // every token lands in exactly one bin; bins overfill by < one doc
    val expectedTokens = spark.range(1, n + 1)
      .agg(sum(col("id") % 97 + 3)).head().getLong(0)
    assert(stats.getAs[Long]("toks") == expectedTokens)
    val bins = stats.getAs[Long]("bins")
    assert(bins >= expectedTokens / budget && bins <= expectedTokens / budget + 1,
      s"bins=$bins for $expectedTokens tokens")
    assert(stats.getAs[Long]("max_bin") < budget + 100) // max doc = 100 tokens
  }

  test("500K real media payloads generate and decode shuffle-free") {
    import graft.llm.{MediaCodec, Multimodal}
    import spark.implicits._
    val n = 500000L
    val items = spark.range(0, n).as[Long]
      .mapPartitions(_.map(id =>
        Multimodal.MMItem(id, MediaCodec.modalityOf(id), MediaCodec.mediaFor(id))))
      .toDF()
    val perModality = Multimodal.decodeMedia(items)
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n"), sum(col("n_values")).as("values"),
        min(col("width")).as("min_w"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(perModality.keySet == Set("image", "audio", "video"))
    assert(perModality.values.map(_.getAs[Long]("n")).sum == n)
    // every payload parsed: images/videos carry real dims, audio real samples
    assert(perModality("image").getAs[Int]("min_w") >= 2)
    assert(perModality("video").getAs[Int]("min_w") >= 2)
    assert(perModality("audio").getAs[Long]("values") > 0)
  }
}
