package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted ANN index layout: embeddings PHYSICALLY partitioned by their
  * sign-LSH bucket, so a similarity probe reads exactly one bucket
  * directory instead of scanning the corpus — the storage half of the
  * similarity-search story ([[graft.llm.Similarity]] is the compute
  * half; its in-memory bucket joins become partition-pruned scans once
  * the index is on disk).
  *
  * Layout contract: `dir/bucket=K/part-*.parquet`. The bucket is the
  * 8-bit hyperplane signature ([[graft.llm.Similarity.planes]] — the same
  * planes the in-memory LSH queries use, so on-disk and in-memory probes
  * agree). Appends are additive: new vectors land in their bucket
  * partitions without touching existing files — the incremental-crawl
  * regime, same doctrine as [[DocStore]].
  *
  * At 100 TB: the scan for one probe prunes to 1/256 of the corpus by
  * DIRECTORY listing (no file reads outside the bucket), and bucket
  * directories are the unit of compaction/retention, exactly like
  * [[Store]]'s date chunks.
  */
object VecStore {

  /** Quantize + bucket (the exact arithmetic of the in-memory LSH path). */
  private def bucketed(embeddings: DataFrame): DataFrame = {
    val qv = expr(
      s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * ${graft.llm.Similarity.Q}) AS BIGINT))")
    embeddings
      .withColumn("qv", qv)
      // all 8 plane sign bits in one fused pass (same value as the
      // per-plane CASE sum; agrees bit-for-bit with the in-memory LSH)
      .withColumn("bucket", graft.functions.PlaneSignMask(col("qv"), 8))
  }

  /** Append `embeddings` (vec_id, embedding, …) into the bucket-partitioned
    * index at `dir`. */
  def append(embeddings: DataFrame, dir: String): Unit =
    bucketed(embeddings)
      .drop("qv")
      .write.mode("append").partitionBy("bucket").parquet(dir)

  /** Vectors in the probe bucket of `queryEmbedding` — a partition-pruned
    * scan (the filter binds to the partition column, so only
    * `dir/bucket=K` is listed/read). */
  def probe(spark: SparkSession, dir: String, queryBucket: Long): DataFrame =
    spark.read.parquet(dir).filter(col("bucket") === queryBucket)

  /** The bucket a raw float-array embedding hashes to (driver-side helper
    * for single-query probes; the arithmetic mirrors [[bucketed]]). */
  def bucketOf(embedding: Seq[Float]): Long = {
    // SQL round() is HALF_UP away from zero; Math.round is half-up toward
    // +infinity — they disagree at negative exact-.5 products (round(-0.5):
    // SQL → -1, Math.round → 0), which would send a probe to the wrong
    // bucket directory. Mirror the stored arithmetic exactly.
    def sqlRound(v: Double): Long = if (v < 0) -Math.round(-v) else Math.round(v)
    val qv = embedding.map(x => sqlRound(x.toDouble * graft.llm.Similarity.Q))
    graft.llm.Similarity.planes.zipWithIndex.map { case (w, p) =>
      val dot = qv.zip(w).map { case (a, b) => a * b }.sum
      if (dot > 0) 1L << p else 0L
    }.sum
  }
}
