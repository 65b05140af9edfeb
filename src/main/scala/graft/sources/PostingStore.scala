package graft.sources

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** On-disk INVERTED INDEX, term-bucket partitioned — the text-retrieval
  * twin of [[VecStore]], and the physical layout behind
  * [[graft.llm.Search]]'s scale claim ("at 100 TB the posting relation
  * is partitioned/bucketed BY TERM"). Postings (term, doc_id) land in
  * `tb = h64(term) mod 16` parquet partitions; a query's terms map to
  * their buckets ARITHMETICALLY (the same md5-prefix hash evaluated
  * driver-side on the constant term set — no data touched), so the probe
  * scan carries a static PartitionFilter and only the probed bucket
  * DIRECTORIES are ever listed or read. Hash buckets, not term
  * directories: a real vocabulary is millions of terms (small-files
  * explosion as partition values), while 16-way hashing keeps directory
  * count fixed and per-bucket size balanced; rare-term probes still skip
  * ≥ 15/16 of the index.
  *
  * Reference behavior: the query-side SQL the reference runs over its
  * hypertables is served by (Timescale/Postgres) indexes; this is the
  * lake-native equivalent for the retrieval family.
  */
object PostingStore {

  private val NBuckets = 16L
  /** The query term set — [[graft.llm.Search]]'s AND query, so the
    * result is directly comparable to `search_boolean_and`. */
  private val Terms = Seq("data", "join", "scan")

  /** Driver-side twin of [[graft.functions.Md5Prefix64]]: first 15 hex
    * chars of md5 as a 60-bit long (bit-identical to the engine + oracle
    * definitions — the arithmetic bucket contract). */
  def h64(x: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def scratch(s: SparkSession, d: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_postings/" +
      s"${new java.io.File(d).getName}-${java.util.UUID.randomUUID()}"
    val path = new org.apache.hadoop.fs.Path(dir)
    path.getFileSystem(s.sparkContext.hadoopConfiguration).deleteOnExit(path)
    dir
  }

  /** Build the index: DISTINCT (term, doc_id) postings, clustered on the
    * bucket key before the partitioned write (one file per bucket, not
    * one per task × bucket — the [[VecStore.append]] small-files rule). */
  def build(s: SparkSession, d: String): String = {
    val dir = scratch(s, d)
    val n = s.sessionState.conf.numShufflePartitions
    Tables.documentsParallel(s, d)
      .select(col("doc_id"),
        explode(graft.llm.TextAnalysis.words(col("text"))).as("term"))
      .distinct()
      .withColumn("tb", pmod(graft.functions.Md5Prefix64(col("term")), lit(NBuckets)))
      .repartition(n, col("tb"))
      .write.mode("append").partitionBy("tb").parquet(dir)
    dir
  }

  /** The pruned probe scan: only the query terms' bucket directories are
    * listed (static PartitionFilters — the bucket ids are arithmetic
    * constants of the query, known before any scan). */
  def probe(s: SparkSession, dir: String, terms: Seq[String]): DataFrame = {
    val tbs = terms.map(t => h64(t) % NBuckets).distinct
    s.read.parquet(dir)
      .filter(col("tb").isin(tbs: _*) && col("term").isin(terms: _*))
  }

  /** The on-disk index driven end-to-end as a registered query: build the
    * term-bucketed index, probe it with the boolean-AND term set, and
    * answer through the disk layout. Result ≡ `search_boolean_and` (same
    * oracle), proving the index hop lossless; `ProbeStoreSpec` asserts
    * the scan's PartitionFilters actually prune the directories. */
  lazy val probeQuery: GraftQuery = q("search_index_probe",
    s"""WITH post AS (
       |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
       |  FROM documents),
       |hits AS (
       |  SELECT doc_id, COUNT(*) AS n_terms
       |  FROM post WHERE term IN (${Terms.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY 1)
       |SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms
       |FROM hits WHERE n_terms = ${Terms.size}""".stripMargin) { (s, d) =>
    val dir = build(s, d)
    probe(s, dir, Terms)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === Terms.size)
  }
}
