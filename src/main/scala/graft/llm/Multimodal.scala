package graft.llm

import graft.GraftQuery
import graft.GraftQuery.{q, qNoOracle}
import graft.ops.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder prompt): image/audio/video payloads
  * as opaque `binary` columns with a typed metadata struct, plus a
  * batch-shaped decode/feature-extract stage.
  *
  * The decode itself is STUBBED (this container has no image/audio codecs):
  * `fakeDecode` below produces deterministic pseudo-features from the raw
  * bytes. Everything around it — schema, partition-preserving
  * `mapPartitions` batching, feature column shape — is the real Spark
  * plumbing a codec-backed UDF would drop into. At 100 TB the decode stage
  * is embarrassingly parallel (no shuffle); only the final per-modality
  * aggregate exchanges data.
  */
object Multimodal {

  /** Build a multimodal corpus from `documents`: payload = UTF-8 bytes of
    * the text standing in for a media blob, modality assigned
    * deterministically, metadata derived arithmetically (so stats stay
    * oracle-checkable). */
  def corpus(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("content"),
      struct(
        concat(lit("application/x-fake-"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (col("doc_id") % 3 + 1).cast("int"))).as("mime"),
        length(col("text")).as("size_bytes"),
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height"),
        (col("doc_id") % 30000 + 1000).cast("int").as("duration_ms")).as("meta"))

  case class MMRecord(doc_id: Long, modality: String, content: Array[Byte])
  case class MMFeatures(doc_id: Long, modality: String, n_bytes: Int, checksum: Long,
      features: Array[Float])

  /** STUB decode: a real implementation would decode image/audio frames
    * here (per-partition, batched, no shuffle). The fake emits a
    * deterministic 8-dim feature vector from byte statistics so the
    * pipeline shape is testable end-to-end. */
  def fakeDecode(rows: Iterator[MMRecord]): Iterator[MMFeatures] =
    rows.map { r =>
      val bytes = r.content
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum = sum * 31 + (bytes(i) & 0xff); i += 1 }
      val feats = (0 until 8).map { j =>
        val h = (sum + j * 2654435761L) % 2147483648L
        (h.toDouble / 2147483648.0).toFloat
      }.toArray
      MMFeatures(r.doc_id, r.modality, bytes.length, sum, feats)
    }

  /** The decode stage as a partition-preserving transform. */
  def decodeFeatures(corpus: DataFrame): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col("doc_id"), col("modality"), col("content"))
      .as[MMRecord]
      .mapPartitions(fakeDecode _)
      .toDF()
  }

  case class MMResized(doc_id: Long, modality: String, content: Array[Byte],
      out_width: Int, out_height: Int)

  /** STUB resize: a codec-backed version would decode, scale to
    * (w, h), and re-encode per partition. The fake keeps the byte budget
    * proportional to the target area (deterministic subsampling of the
    * payload) so size-vs-dimension invariants are testable. */
  def resizeStub(corpus: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col("doc_id"), col("modality"), col("content"))
      .as[MMRecord]
      .mapPartitions(_.map { r =>
        val len = r.content.length
        val budget = math.max(1, math.min(len, w * h / 64))
        val out = Array.tabulate(budget)(i => r.content((i.toLong * len / budget).toInt))
        MMResized(r.doc_id, r.modality, out, w, h)
      })
      .toDF()
  }

  case class MMFrame(doc_id: Long, frame_index: Int, frame: Array[Byte])

  /** STUB frame sampling: emits every `everyNth` "frame" (fixed-size byte
    * window of the payload) — the 1→N row shape a real video sampler has
    * (flatMap per partition, no shuffle). */
  def frameSampleStub(corpus: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col("doc_id"), col("modality"), col("content"))
      .as[MMRecord]
      .mapPartitions(_.flatMap { r =>
        val nFrames = math.max(1, r.content.length / frameBytes)
        (0 until nFrames by everyNth).map { f =>
          val from = f * frameBytes
          val until = math.min(r.content.length, from + frameBytes)
          MMFrame(r.doc_id, f, java.util.Arrays.copyOfRange(r.content, from, until))
        }
      })
      .toDF()
  }

  val all: Seq[GraftQuery] = Seq(
    // ---- metadata stats are pure arithmetic -> oracle-checkable
    q("mm_metadata_stats",
      """SELECT
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  COUNT(*) AS n_items,
        |  CAST(SUM(len(text)) AS BIGINT) AS total_bytes,
        |  CAST(SUM(doc_id % 640 + 16) AS BIGINT) AS total_width,
        |  CAST(MAX(doc_id % 30000 + 1000) AS BIGINT) AS max_duration_ms
        |FROM documents
        |GROUP BY CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END""".stripMargin) {
      (s, d) =>
        corpus(s, d).groupBy(col("modality")).agg(
          count(lit(1)).as("n_items"),
          sum(col("meta.size_bytes")).as("total_bytes"),
          sum(col("meta.width")).as("total_width"),
          max(col("meta.duration_ms")).cast("long").as("max_duration_ms"))
    },

    // ---- the multimodal record: text + embedding + metadata fused into
    // one struct column (SURVEY.md §7.1.8 "struct-of-{text, vector,
    // metadata}"), joined on doc_id = vec_id and aggregated per label
    q("mm_fused_record_stats",
      """SELECT e.label,
        |  COUNT(*) AS n,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(CAST(round(CAST(e.embedding[1] AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) AS sum_q_dim0
        |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        |GROUP BY e.label""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val emb = Tables.embeddings(s, d)
      val fused = docs.join(emb, col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("label"),
          struct(
            col("text"),
            col("embedding"),
            struct(col("lang"), col("source"), col("n_chars")).as("meta")).as("record"))
      fused.groupBy(col("label")).agg(
        count(lit(1)).as("n"),
        sum(col("record.meta.n_chars")).as("total_chars"),
        sum(expr("CAST(round(CAST(record.embedding[0] AS DOUBLE) * 1048576) AS BIGINT)"))
          .as("sum_q_dim0"))
    },

    // ---- decode stage, decomposable half: n_decoded/total_bytes survive
    // the mapPartitions stage unchanged (pure documents arithmetic), so the
    // decode path itself gets an oracle check (octet_length(encode(…)) is
    // the UTF-8 byte length the binary payload has)
    q("mm_decode_stats",
      """SELECT
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  COUNT(*) AS n_decoded,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents
        |GROUP BY CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END""".stripMargin) {
      (s, d) =>
        decodeFeatures(corpus(s, d))
          .groupBy(col("modality"))
          .agg(
            count(lit(1)).as("n_decoded"),
            sum(col("n_bytes")).as("total_bytes"))
    },

    // ---- frame-sampling stage through the real mapPartitions path: the
    // kept-frame count per doc is pure arithmetic on the payload length
    // (every 2nd 64-byte window, at least one frame), so the 1→N row
    // explosion shape gets an oracle check even though the frame BYTES
    // stay stub-generated
    q("mm_frame_counts",
      """SELECT
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CAST(SUM((greatest(octet_length(encode(text)) // 64, 1) + 1) // 2) AS BIGINT) AS n_frames,
        |  COUNT(*) AS n_docs
        |FROM documents
        |GROUP BY 1""".stripMargin) { (s, d) =>
      frameSampleStub(corpus(s, d), frameBytes = 64, everyNth = 2)
        .join(corpus(s, d).select(col("doc_id"), col("modality")), Seq("doc_id"))
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(col("doc_id")).as("n_docs"))
    },

    // ---- decode stage, fake-feature half: rows-only check (the feature
    // values come from the stubbed byte-level decode, not SQL-expressible)
    qNoOracle("mm_decode_features") { (s, d) =>
      decodeFeatures(corpus(s, d))
        .groupBy(col("modality"))
        .agg(
          count(lit(1)).as("n_decoded"),
          sum(col("n_bytes")).as("total_bytes"),
          avg(element_at(col("features"), 1)).as("mean_f0"))
    }
  )
}
