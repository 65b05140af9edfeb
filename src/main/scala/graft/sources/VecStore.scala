package graft.sources

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    * index at `dir`. Clustered on the partition key first, so each append
    * writes ONE file per touched bucket instead of one per (task × bucket)
    * — at scale the unclustered form is the classic small-files explosion
    * (tasks × 256 objects per append), and the shuffle this spends is tiny
    * against the write it saves. */
  def append(embeddings: DataFrame, dir: String): Unit = {
    // pinned partition count: an un-numbered repartition lets AQE coalesce
    // the tiny shuffle to ONE task, which then creates every bucket's
    // parquet file serially — writer setup, not data volume, is the cost
    val n = embeddings.sparkSession.sessionState.conf.numShufflePartitions
    bucketed(embeddings)
      .drop("qv")
      .repartition(n, col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(dir)
  }

  /** Vectors in the probe bucket of `queryEmbedding` — a partition-pruned
    * scan (the filter binds to the partition column, so only
    * `dir/bucket=K` is listed/read). */
  def probe(spark: SparkSession, dir: String, queryBucket: Long): DataFrame =
    spark.read.parquet(dir).filter(col("bucket") === queryBucket)

  /** The on-disk index driven end-to-end as a registered query: build the
    * bucket-partitioned index in a scratch dir, then answer a top-k probe
    * set THROUGH the disk layout — queries quantize from the live table,
    * candidates come back off the parquet index, and the bucket equi-join
    * against the broadcast query set triggers DYNAMIC PARTITION PRUNING
    * on the index's partition column (the scan lists only the probed
    * bucket directories — the retrieval regime; at 100 TB the non-probed
    * fraction of the corpus is never read). MULTI-PROBE (Lv et al., VLDB
    * 2007 — the same 1-bit-flip discipline the in-memory banded dedup
    * ships): each query probes its own bucket plus the 8 one-bit-flip
    * neighbors, 9 of 256 directories, ≥96% of the corpus still pruned.
    * A single sign-bucket probe is structurally low-recall for top-k
    * (P[all 8 sign bits agree] = p⁸ ≈ 0.29 even at cosine 0.9; measured
    * 0.01 recall@5 on this corpus's hard cosine-0.32-0.49 neighbor
    * regime, vs 0.13 with the flips — full measured curve in SCALING.md,
    * floor asserted in VecStoreSpec). A candidate's bucket matches exactly
    * one probe key, so the probe join needs no distinct. Exact fixed-point
    * cosine + per-query rank over the probed candidates; `n_cands`
    * records each probe's candidate-set size — the pruning evidence in
    * the result itself. The oracle computes the identical buckets
    * arithmetically, proving on-disk ≡ in-memory (the contract
    * [[VecStoreSpec]] asserts file-level). */
  lazy val probeQuery: GraftQuery = q("vecstore_probe_topk", {
    val bitsSql = graft.llm.Similarity.planes.zipWithIndex.map { case (w, p) =>
      val lit = w.mkString("[", ", ", "]")
      s"(CASE WHEN CAST(list_sum(list_transform(list_zip(qv, $lit), p -> p[1] * p[2])) AS BIGINT) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
    val flips = (Seq(0) ++ (0 until 8).map(1 << _)).mkString("[", ", ", "]")
    s"""WITH qe AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * ${graft.llm.Similarity.Q}) AS BIGINT)) AS qv
       |  FROM embeddings),
       |qn AS (
       |  SELECT vec_id, label, qv,
       |    CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS norm2
       |  FROM qe),
       |bucketed AS (SELECT vec_id, label, qv, norm2, $bitsSql AS bucket FROM qn),
       |probes AS (
       |  SELECT vec_id, qv, norm2, bucket, xor(bucket, f.flip) AS probe_bucket
       |  FROM bucketed, (SELECT unnest($flips) AS flip) f
       |  WHERE vec_id % 50 = 0),
       |scored AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS vec_id, b.label AS label,
       |    CAST(a.bucket AS BIGINT) AS bucket,
       |    CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS BIGINT)
       |      / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) AS cosine
       |  FROM probes a JOIN bucketed b ON a.probe_bucket = b.bucket
       |    AND b.vec_id <> a.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, label, bucket, cosine,
       |    CAST(COUNT(*) OVER (PARTITION BY query_id) AS BIGINT) AS n_cands,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT query_id, vec_id, label, bucket, n_cands, cosine, rank
       |FROM ranked WHERE rank <= 5""".stripMargin
  }) { (s, d) =>
    // per-invocation unique scratch dir: a fixed per-dataset path races
    // delete-against-scan when bench reps overlap a test run. The index is
    // built fresh each call — the timed figure is deliberately BUILD+PROBE
    // end-to-end (the incremental-crawl unit of work) — and the scratch
    // tree is removed at JVM exit.
    val dir = s"${sys.props("java.io.tmpdir")}/graft_vecstore_idx/" +
      s"${new java.io.File(d).getName}-${java.util.UUID.randomUUID()}"
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.deleteOnExit(path)
    append(Tables.embeddingsParallel(s, d), dir)
    val quant = expr(
      s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * ${graft.llm.Similarity.Q}) AS BIGINT))")
    def qn(df: DataFrame): DataFrame = df
      .withColumn("qv", quant)
      .withColumn("norm2", graft.functions.FixedPointDot(col("qv"), col("qv")))
    // multi-probe query set: own bucket + the 8 one-bit flips (a 9× row
    // explode of the tiny broadcast side only — the index side is still
    // directory-pruned to the probed buckets)
    val queries = qn(Tables.embeddings(s, d))
      .filter(col("vec_id") % 50 === 0)
      .withColumn("bucket", graft.functions.PlaneSignMask(col("qv"), 8).cast("int"))
      .select(col("vec_id"), col("qv"), col("norm2"), col("bucket"),
        explode(array((Seq(0) ++ (0 until 8).map(1 << _)).map(lit): _*)).as("flip"))
      .withColumn("probe_bucket", col("bucket").bitwiseXOR(col("flip")))
      .select(col("vec_id"), col("qv"), col("norm2"), col("bucket"), col("probe_bucket"))
    // the index side re-quantizes off the stored floats (bit-identical
    // parquet round trip); its `bucket` is the read-back PARTITION column,
    // so the join's pruning binds to directory listing, not row filtering
    val index = qn(s.read.parquet(dir))
    val scored = index.as("b")
      .join(broadcast(queries.as("a")),
        col("a.probe_bucket") === col("b.bucket") && col("b.vec_id") =!= col("a.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("vec_id"),
        col("b.label").as("label"), col("a.bucket").cast("long").as("bucket"),
        (graft.functions.FixedPointDot(col("a.qv"), col("b.qv")).cast("double")
          / (sqrt(col("a.norm2").cast("double")) * sqrt(col("b.norm2").cast("double"))))
          .as("cosine"))
    scored
      .withColumn("n_cands",
        count(lit(1)).over(Window.partitionBy(col("query_id"))).cast("long"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id"), col("label"), col("bucket"),
        col("n_cands"), col("cosine"), col("rank"))
  }

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
