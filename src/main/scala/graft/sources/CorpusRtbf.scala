package graft.sources

import org.apache.spark.sql.SparkSession

/** ONE deletion request, EVERY surface — the orchestrated right-to-be-
  * forgotten for the indexed corpus pipeline. A training-data platform
  * does not hold a document once: the bronze store has its text, the
  * hash index its content digest, the posting index its term statistics
  * and positions, the dedup state its MinHash signatures and cluster
  * membership — every one content-derived, every one personal data
  * under erasure law, and forgetting the bronze row alone leaves a
  * document that still ranks in search results and still anchors a
  * duplicate cluster. This orchestrator drives the same surfaces
  * [[graft.streaming.DocStream.startIndexedIngest]] maintains, each
  * through its own bounded-rewrite erase:
  *
  *  - bronze + hash index — [[DocStore.eraseDocs]] (affected `batch_id=`
  *    partitions only; the hash leaves the suppression index, so
  *    re-submitted content is a new landing, not a suppressed dup);
  *  - posting index — [[PostingLog.eraseDocs]] (affected `tb=` term
  *    buckets + the doc's epoch; BM25 stats decremented in the same
  *    rewrite);
  *  - dedup state — [[graft.llm.DedupLog.eraseDocs]] (signature
  *    partitions + label repair of exactly the touched components).
  *
  * Each surface is idempotent under replay, so the orchestration needs
  * no transaction: a crash mid-request is repaired by re-running the
  * SAME request — completed surfaces no-op, incomplete ones finish.
  * That is the same at-least-once + idempotence discipline the landing
  * path uses, applied to deletion. Returns rows removed per surface
  * (the audit receipt a deletion request legally needs).
  *
  * Residual-retention window: NONE. Every CubeLog-managed surface's
  * erase ends with [[CubeLog.purgeGraceRetained]], so the
  * grace-generation dirs (byte-level copies of PRE-erase state) are
  * deleted in the same request — [[graft.sources.RtbfGraceSpec]]'s
  * on-disk sweep is the proof. The purge costs that store its
  * torn-marker fallback until its next compaction (a loud failure
  * replaces the fallback), which is the correct side of the trade:
  * a fallback that can resurrect erased documents is not a safety
  * feature under erasure law. */
object CorpusRtbf {

  def eraseEverywhere(
      spark: SparkSession,
      ids: Seq[Long],
      bronzeDir: String,
      postingDir: String,
      dedupDir: String): Map[String, Long] =
    Map(
      "bronze_docs" -> DocStore.eraseDocs(spark, bronzeDir, ids),
      "posting_index" -> PostingLog.eraseDocs(spark, postingDir, ids),
      "dedup_state" -> graft.llm.DedupLog.eraseDocs(spark, dedupDir, ids))
}
