package graft.sources

import graft.GraftQuery
import graft.GraftQuery.q
import graft.llm.TextHash
import graft.ops.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink FORMAT breadth: the engine's ingest surface beyond parquet —
  * ORC, CSV, and JSON-lines (the three interchange formats a lake ingests
  * from upstream producers; the reference's wire format is JSON, `consumer/
  * meter_consumer.py` parses line-delimited JSON messages). Each query
  * round-trips `documents` through one format and aggregates the read-back
  * side; the oracle computes the same aggregate straight off the parquet,
  * so hash equality IS the losslessness proof for the hop.
  *
  * Scale doctrine: the read side always passes an EXPLICIT schema — schema
  * inference is a full extra scan of the data at 100 TB (and a correctness
  * hazard: CSV/JSON inference can narrow types on a sample). The checksum
  * is bit_xor of the 60-bit text hash: order-independent (commutative),
  * overflow-free (unlike SUM), and sensitive to any corrupted byte.
  */
object Formats {

  /** Per-invocation scratch dir (the VecStore doctrine: fixed paths race
    * delete-against-scan when bench reps overlap a test run). */
  private def scratch(s: SparkSession, d: String, fmt: String): String = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_fmt/" +
      s"$fmt-${new java.io.File(d).getName}-${java.util.UUID.randomUUID()}"
    val path = new org.apache.hadoop.fs.Path(dir)
    path.getFileSystem(s.sparkContext.hadoopConfiguration).deleteOnExit(path)
    dir
  }

  /** The post-hop aggregate (Spark side). */
  private def summarize(df: DataFrame): DataFrame =
    df.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        expr("bit_xor(h)").as("text_checksum"))

  private def withHash(df: DataFrame): DataFrame =
    df.withColumn("h", TextHash.h64(col("text")))

  /** Oracle twin: same aggregate, straight off the parquet table. */
  private val summarySql: String =
    s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  bit_xor(${TextHash.h64Sql("text")}) AS text_checksum
       |FROM documents GROUP BY source""".stripMargin

  private val docSchema =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  val all: Seq[GraftQuery] = Seq(
    // ORC: the columnar sibling — full type fidelity, zero options needed.
    q("src_orc_roundtrip", summarySql) { (s, d) =>
      val dir = scratch(s, d, "orc")
      Tables.documentsParallel(s, d).write.orc(dir)
      summarize(withHash(s.read.schema(docSchema).orc(dir)))
    },

    // CSV: quoted/escaped text fields with embedded quotes, commas, or
    // newlines survive only if writer and reader agree on the dialect —
    // both sides pin it explicitly (never rely on defaults-of-the-day),
    // and multiLine lets a quoted field span lines.
    q("src_csv_roundtrip", summarySql) { (s, d) =>
      val dir = scratch(s, d, "csv")
      val opts = Map("header" -> "true", "quote" -> "\"", "escape" -> "\"",
        "multiLine" -> "true")
      Tables.documentsParallel(s, d).write.options(opts).csv(dir)
      summarize(withHash(s.read.options(opts).schema(docSchema).csv(dir)))
    },

    // JSON lines: the reference's own wire format, as a file hop.
    q("src_jsonl_roundtrip", summarySql) { (s, d) =>
      val dir = scratch(s, d, "jsonl")
      Tables.documentsParallel(s, d).write.json(dir)
      summarize(withHash(s.read.schema(docSchema).json(dir)))
    },

    // Avro: the row-oriented interchange format (the engine already ships
    // the Avro WIRE codec for streaming, Ingest.parseAndValidateAvro; this
    // is the FILE path). The shortName("avro") registration is absent in
    // this offline build, so the format is addressed by provider class —
    // same DataSource V1 path, same result.
    q("src_avro_roundtrip", summarySql) { (s, d) =>
      val fmt = "org.apache.spark.sql.avro.AvroFileFormat"
      val dir = scratch(s, d, "avro")
      Tables.documentsParallel(s, d).write.format(fmt).save(dir)
      summarize(withHash(s.read.schema(docSchema).format(fmt).load(dir)))
    },

    // XML: Spark 4's native XmlFileFormat — element-per-row with explicit
    // rowTag and read schema (XML inference is doubly costly: a full scan
    // AND ambiguous typing).
    q("src_xml_roundtrip", summarySql) { (s, d) =>
      val dir = scratch(s, d, "xml")
      Tables.documentsParallel(s, d).write
        .option("rootTag", "docs").option("rowTag", "doc").xml(dir)
      summarize(withHash(
        s.read.option("rowTag", "doc").schema(docSchema).xml(dir)))
    },

    // SCHEMA EVOLUTION on read: a producer starts emitting an extra column
    // mid-stream (the routine lake event — batch 1 lands without
    // `extra_score`, batch 2 with it), and the reader must see ONE merged
    // schema with NULLs where the old files are silent. mergeSchema=true
    // is the explicit opt-in (at 100 TB footer-merging every file is a
    // cost you pay knowingly, once, not a default). The aggregate counts
    // and sums through the NULL-backfilled column; the oracle recomputes
    // from the parquet source — agreement proves old files surface as
    // NULLs, not dropped rows or wrong values.
    q("src_schema_evolution",
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
        |  CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN (doc_id * 37) % 1000 ELSE 0 END) AS BIGINT)
        |    AS sum_extra
        |FROM documents GROUP BY source""".stripMargin) { (s, d) =>
      val dir = scratch(s, d, "evo")
      val docs = Tables.documentsParallel(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .write.mode("append").parquet(dir)
      docs.filter(col("doc_id") % 2 === 1)
        .withColumn("extra_score", (col("doc_id") * 37) % 1000)
        .write.mode("append").parquet(dir)
      s.read.option("mergeSchema", "true").parquet(dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          count(col("extra_score")).as("n_scored"),
          sum(coalesce(col("extra_score"), lit(0L))).as("sum_extra"))
    },

    // BUCKETED CO-LOCATED JOIN: both sides of a fact⋈dim join written as
    // BUCKETED tables (bucketBy the join key, same bucket count, sortBy
    // for sorted buckets) so the join consumes the on-disk layout —
    // Spark's scan reports the bucket spec as its output partitioning and
    // the SortMergeJoin needs NO Exchange on either side (plan-asserted
    // in FormatsSpec with auto-broadcast off). THE layout technique for a
    // 100 TB fact repeatedly joined on one key: the shuffle is paid once
    // at write time, then every downstream join of any two tables
    // bucketed on that key is exchange-free, round after round. Tables
    // are EXTERNAL (option("path") into per-invocation scratch) with
    // UUID names, so concurrent reps never collide in the catalog or on
    // disk; hash equality with the straight-off-parquet oracle proves the
    // bucketed hop lossless.
    q("src_bucketed_colocated_join",
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val (to, tc) = bucketedPair(s, d)
      s.table(to).join(s.table(tc), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(graft.ops.Tables.cents(col("o_totalprice"))).as("sum_cents"))
    }
  )

  /** Bucket count for the co-located join pair (both sides MUST agree —
    * differing counts reintroduce an Exchange on one side). */
  private val NBuckets = 8

  /** The previous invocation's table pair, dropped (catalog-only — the
    * tables are external; scratch dirs are deleteOnExit-cleaned) when the
    * next pair is created. Dropping the CURRENT pair eagerly would race
    * the lazy evaluation of the DataFrame built on it, so cleanup is
    * one-invocation deferred: a multi-rep bench run holds at most one
    * live pair in the session catalog instead of growing it unboundedly. */
  private var lastPair: Option[(String, String)] = None

  /** Writes orders + customer as external bucketed-by-join-key tables
    * (unique names/paths per invocation) and returns the table names.
    * One file per bucket (repartition on the bucket key first), so the
    * sortBy order survives and the scan needs no per-bucket merge sort. */
  def bucketedPair(s: SparkSession, d: String): (String, String) = synchronized {
    lastPair.foreach { case (po, pc) =>
      s.sql(s"DROP TABLE IF EXISTS $po")
      s.sql(s"DROP TABLE IF EXISTS $pc")
    }
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val (to, tc) = (s"graft_bko_$tag", s"graft_bkc_$tag")
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .repartition(NBuckets, col("o_custkey"))
      .write.bucketBy(NBuckets, "o_custkey").sortBy("o_custkey")
      .option("path", scratch(s, d, "bko")).saveAsTable(to)
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
      .repartition(NBuckets, col("c_custkey"))
      .write.bucketBy(NBuckets, "c_custkey").sortBy("c_custkey")
      .option("path", scratch(s, d, "bkc")).saveAsTable(tc)
    lastPair = Some((to, tc))
    (to, tc)
  }
}
