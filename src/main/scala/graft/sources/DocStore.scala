package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental CROSS-BATCH corpus dedup: append only never-seen documents
  * and maintain a compact content-hash index alongside the landed corpus —
  * the production shape for continuous ingestion, where each arriving
  * batch must dedup against the WHOLE history without rescanning it.
  *
  *   baseDir/docs/        the landed, deduplicated corpus
  *   baseDir/hash_index/  one row per landed content hash
  *
  * Scale design: the per-batch work is (batch in-dedup) + one left-anti
  * join of the batch against the index — never against the corpus text.
  * The index is hashes only (~32 B/doc vs KBs of text), so at 100 TB of
  * corpus the index is ~3 orders of magnitude smaller; bucketing it by
  * hash (Store-style bucketBy) would make the anti-join co-located and
  * shuffle-free on the index side. Replay-idempotent by construction: a
  * redelivered batch anti-joins to empty.
  *
  * The single-corpus batch twin is `dedup_exact`; the bounded-horizon
  * streaming twin is [[graft.streaming.DocStream.curate]]. This is the
  * third regime: unbounded history, batch arrivals.
  */
object DocStore {

  /** Append `docs` (doc_id, text, ...) minus already-seen content.
    * Returns the number of newly landed documents. */
  def appendDeduped(spark: SparkSession, docs: DataFrame, baseDir: String): Long = {
    val docsPath = s"$baseDir/docs"
    val indexPath = s"$baseDir/hash_index"

    // in-batch dedup first (keep min doc_id per hash — deterministic
    // under replay), then history dedup via the index
    val hashed = docs
      .withColumn("content_hash", md5(col("text")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content_hash")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).drop("rn")

    val fresh0 =
      if (indexExists(spark, indexPath)) {
        val seen = spark.read.parquet(indexPath)
        hashed.join(seen, Seq("content_hash"), "left_anti")
      } else hashed

    // materialize BEFORE touching the index path: the anti-join reads the
    // same files the index append below rewrites ("Cannot overwrite a
    // path that is also being read from" — same trap as Store.compactChunk)
    val fresh = fresh0.localCheckpoint(eager = true)

    fresh.write.mode(SaveMode.Append).parquet(docsPath)
    fresh.select(col("content_hash")).write.mode(SaveMode.Append).parquet(indexPath)
    fresh.count()
  }

  private def indexExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
