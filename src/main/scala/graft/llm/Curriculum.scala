package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curriculum-ordered corpus layout: physically arrange training shards so
  * a reader that streams shard 0, 1, 2, … sees documents in increasing
  * difficulty (curriculum learning, Bengio et al. 2009) — without any
  * global sort bottleneck.
  *
  * `repartitionByRange` samples range boundaries (one tiny job), then
  * range-shuffles once: each shard holds a contiguous score slice, rows
  * sorted within the shard. A global `orderBy(...).coalesce(1)` would
  * serialize 100 TB through one writer; this shape keeps all writers
  * parallel and still yields a totally-ordered shard sequence (shard k's
  * max score ≤ shard k+1's min). The (score, doc_id) key makes boundary
  * placement deterministic under ties.
  */
object Curriculum {

  def writeShards(
      docsScored: DataFrame, dir: String, nShards: Int,
      scoreCol: String = "score"): Unit =
    docsScored
      .repartitionByRange(nShards, col(scoreCol), col("doc_id"))
      .sortWithinPartitions(col(scoreCol), col("doc_id"))
      .write.mode("overwrite").parquet(dir)
}
