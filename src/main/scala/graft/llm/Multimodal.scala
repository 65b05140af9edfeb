package graft.llm

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (builder prompt): image/audio/video payloads
  * as opaque `binary` columns with a typed metadata struct, plus
  * codec-backed decode / resize / frame-sample stages.
  *
  * The payloads are REAL encoded media ([[MediaCodec]]: P6 PPM images,
  * RIFF/WAVE PCM16 audio, a framed PPM video container) and the decode
  * stage parses the actual bytes — header tokenization, chunk walking,
  * frame offsets — never `doc_id`. Because generation is deterministic
  * arithmetic, every decoded statistic has a closed form the DuckDB oracle
  * states independently, so the encoder AND the parser are both verified
  * end-to-end (a byte off in either diverges from the oracle).
  *
  * Scale shape: generation/decode/resize/frame-sample are all
  * partition-preserving `mapPartitions` stages — embarrassingly parallel,
  * no shuffle; only the final per-modality aggregates exchange data. At
  * 100 TB the payload column stays columnar-compressed parquet binary and
  * the decode stage streams batches per partition.
  */
object Multimodal {
  import MediaCodec._

  // ---- oracle-side closed forms (shared CTE text) ----
  /** Per-doc media parameters, exactly [[MediaCodec]]'s formulas. */
  private val paramsCte =
    """m AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |    doc_id % 13 + 2 AS w, doc_id % 7 + 2 AS h,
      |    doc_id % 200 + 50 AS ns, doc_id % 4 + 1 AS nf
      |  FROM documents)""".stripMargin

  /** Byte size of one `P6\n<w> <h>\n255\n` PPM: 9 header constants + the
    * ASCII widths of w and h + 3·w·h pixel bytes. */
  private val ppmSizeSql =
    "9 + len(CAST(w AS VARCHAR)) + len(CAST(h AS VARCHAR)) + 3*w*h"

  /** Closed-form 56-bit dHash of one frame whose pixel byte `idx` is
    * `(base + idx) % 256` (base = `doc_id*31` for images, plus `f*97` per
    * video frame) — mirrors [[MediaCodec.dHash56]] over the `w`/`h`
    * columns in scope. */
  private def dhashSql(base: String): String = {
    def gray(x: String) =
      s"""(($base + (((Y*h)//8)*w + (($x*w)//8))*3) % 256
         | + ($base + (((Y*h)//8)*w + (($x*w)//8))*3 + 1) % 256
         | + ($base + (((Y*h)//8)*w + (($x*w)//8))*3 + 2) % 256) // 3""".stripMargin
    s"""CAST(list_sum(list_transform(range(0, 8), Y ->
       |  list_sum(list_transform(range(0, 7), X ->
       |    CASE WHEN (${gray("(X+1)")}) > (${gray("X")})
       |      THEN (CAST(1 AS BIGINT) << (Y*7 + X)) ELSE 0 END)))) AS BIGINT)""".stripMargin
  }

  /** Encoded payload size per modality (PPM / 44-byte RIFF header + PCM16 /
    * 8-byte GRV0 header + nf frames). */
  private val sizeSql =
    s"""CASE modality
       |    WHEN 'image' THEN $ppmSizeSql
       |    WHEN 'audio' THEN 44 + 2*ns
       |    ELSE 8 + nf * ($ppmSizeSql) END""".stripMargin

  // ---- the corpus: one real media payload per document ----

  case class MMItem(doc_id: Long, modality: String, content: Array[Byte])

  /** Build the multimodal corpus from `documents`: payload = real encoded
    * bytes ([[MediaCodec.mediaFor]]), modality assigned round-robin,
    * metadata struct typed alongside. `meta.size_bytes` is measured from
    * the REAL bytes (`octet_length`), so the metadata oracle checks the
    * encoders' exact wire layout. */
  def corpus(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => MMItem(id, modalityOf(id), mediaFor(id))))
      .toDF()
      .withColumn("meta", struct(
        element_at(
          array(lit("image/x-portable-pixmap"), lit("audio/wav"), lit("video/x-graft-frames")),
          (col("doc_id") % 3 + 1).cast("int")).as("mime"),
        octet_length(col("content")).cast("long").as("size_bytes"),
        when(col("doc_id") % 3 === 1, lit(0L))
          .otherwise(col("doc_id") % 13 + 2).cast("int").as("width"),
        when(col("doc_id") % 3 === 1, lit(0L))
          .otherwise(col("doc_id") % 7 + 2).cast("int").as("height"),
        when(col("doc_id") % 3 === 1, expr(s"(doc_id % 200 + 50) * 1000 div $SampleRateHz"))
          .when(col("doc_id") % 3 === 2, expr(s"(doc_id % 4 + 1) * 1000 div $VideoFps"))
          .otherwise(lit(0L)).cast("int").as("duration_ms")))
  }

  // ---- decode stage: parse the real bytes, per partition ----

  case class MMDecoded(doc_id: Long, modality: String, n_bytes: Long, width: Int,
      height: Int, channels: Int, n_frames: Int, n_values: Long, value_sum: Long)

  /** Decode one record — the single source of truth both the failing and
    * quarantining variants share. */
  private def decodeOne(r: MMItem): MMDecoded = r.modality match {
    case "image" =>
      val (img, _) = decodePpm(r.content, 0)
      MMDecoded(r.doc_id, r.modality, r.content.length, img.width, img.height,
        img.channels, 1, img.values.length.toLong, img.valueSum)
    case "audio" =>
      val a = decodeWav(r.content)
      MMDecoded(r.doc_id, r.modality, r.content.length, 0, 0,
        a.channels, 0, a.samples.length.toLong, a.valueSum)
    case _ =>
      val frames = decodeVideo(r.content)
      val head = frames.head
      MMDecoded(r.doc_id, r.modality, r.content.length, head.width, head.height,
        head.channels, frames.length,
        frames.iterator.map(_.values.length.toLong).sum,
        frames.iterator.map(_.valueSum).sum)
  }

  /** Codec-backed decode: PPM header parse / RIFF chunk walk / GRV0 frame
    * walk on the payload bytes only. Partition-preserving, batch-shaped,
    * shuffle-free — the stage a GPU/codec-backed decoder drops into. */
  def decodeMedia(items: DataFrame): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col("doc_id"), col("modality"), col("content")).as[MMItem]
      .mapPartitions(_.map(decodeOne))
      .toDF()
  }

  // ---- quarantine: the decode stage's dead-letter channel ----

  case class MMDecodeResult(doc_id: Long, modality: String, ok: Boolean,
      err: String, n_bytes: Long, width: Int, height: Int, channels: Int,
      n_frames: Int, n_values: Long, value_sum: Long)

  /** Fault-tolerant decode: parse failures become quarantine rows (ok =
    * false + the parse error) instead of failing the job — the dead-letter
    * channel a 100 TB ingest needs, since at that scale corrupt payloads
    * are a certainty, not an edge case. Same partition-preserving shape as
    * [[decodeMedia]]; one pass, two logical outputs (filter on `ok`). */
  def decodeMediaSafe(items: DataFrame): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col("doc_id"), col("modality"), col("content")).as[MMItem]
      .mapPartitions(_.map { r =>
        try {
          val d = decodeOne(r)
          MMDecodeResult(d.doc_id, d.modality, true, "", d.n_bytes, d.width,
            d.height, d.channels, d.n_frames, d.n_values, d.value_sum)
        } catch {
          case scala.util.control.NonFatal(e) =>
            MMDecodeResult(r.doc_id, r.modality, false,
              Option(e.getMessage).getOrElse(e.getClass.getSimpleName),
              r.content.length, 0, 0, 0, 0, 0L, 0L)
        }
      })
      .toDF()
  }

  /** Deterministically corrupt the payloads of every 101st document
    * (destroy the format magic byte) — the planted-fault harness for the
    * quarantine path. */
  def corruptEvery101st(items: DataFrame): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col("doc_id"), col("modality"), col("content")).as[MMItem]
      .mapPartitions(_.map { r =>
        if (r.doc_id % 101 == 0) {
          val broken = r.content.clone()
          broken(0) = 'X'.toByte
          r.copy(content = broken)
        } else r
      })
      .toDF()
  }

  // ---- perceptual-hash image dedup ----

  case class ImgHash(doc_id: Long, dhash: Long)

  /** Per-image 56-bit dHash over the REAL decoded pixels
    * ([[MediaCodec.dHash56]]): decode → 8×8 grayscale → adjacent-pixel
    * comparison bits. Partition-preserving; no shuffle. */
  def imageDHashes(items: DataFrame): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.filter(col("modality") === "image")
      .select(col("doc_id"), col("modality"), col("content")).as[MMItem]
      .mapPartitions(_.map { r =>
        val (img, _) = decodePpm(r.content, 0)
        ImgHash(r.doc_id, dHash56(img))
      })
      .toDF()
  }

  /** Image near-duplicate pairs by banded hamming join over the dHash:
    * 4×14-bit blocks — by pigeonhole, hamming ≤ 3 over 4 blocks implies
    * at least one identical block, so the block-bucket join is LOSSLESS
    * for the ≤3 threshold (same argument as the SimHash text variant).
    * The only joins are block-key equality buckets; verification is a
    * popcount on the pair. */
  def imagePairsByDHash(items: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x14 blocks are only lossless up to hamming 3")
    val hashed = imageDHashes(items)
    val blockCols = (0 until 4).map { b =>
      struct(lit(b).as("blk"),
        shiftright(col("dhash"), 14 * b).bitwiseAND(16383).as("key"))
    }
    val blocks = hashed
      .select(col("doc_id"), col("dhash"), explode(array(blockCols: _*)).as("bk"))
      .select(col("doc_id"), col("dhash"), col("bk.blk").as("blk"), col("bk.key").as("key"))
    blocks.as("x")
      .join(blocks.as("y"),
        col("x.blk") === col("y.blk") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        col("x.dhash").as("h1"), col("y.dhash").as("h2"))
      .distinct()
      .select(col("d1"), col("d2"),
        expr("bit_count(h1 ^ h2)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ---- resize stage: decode → nearest-neighbor scale → re-encode ----

  case class MMResized(doc_id: Long, modality: String, content: Array[Byte],
      out_width: Int, out_height: Int)

  /** Real image resize: parse the PPM, nearest-neighbor scale to (ow, oh),
    * re-encode as PPM. Output payloads are themselves decodable. */
  def resizeImages(items: DataFrame, ow: Int, oh: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.filter(col("modality") === "image")
      .select(col("doc_id"), col("modality"), col("content")).as[MMItem]
      .mapPartitions(_.map { r =>
        val (img, _) = decodePpm(r.content, 0)
        val out = resize(img, ow, oh)
        MMResized(r.doc_id, "image",
          encodePpm(ow, oh, i => out.values(i.toInt) & 0xff), ow, oh)
      })
      .toDF()
  }

  // ---- frame sampling: walk the container, keep every Nth frame ----

  case class MMFrame(doc_id: Long, frame_index: Int, frame: Array[Byte])

  /** Real video frame sampling: parse the GRV0 container, emit every
    * `everyNth` frame re-encoded as a standalone decodable PPM — the 1→N
    * flatMap row shape of a real sampler, shuffle-free. */
  def frameSample(items: DataFrame, everyNth: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.filter(col("modality") === "video")
      .select(col("doc_id"), col("modality"), col("content")).as[MMItem]
      .mapPartitions(_.flatMap { r =>
        val frames = decodeVideo(r.content)
        (0 until frames.length by everyNth).map { f =>
          val img = frames(f)
          MMFrame(r.doc_id, f,
            encodePpm(img.width, img.height, i => img.values(i.toInt) & 0xff))
        }
      })
      .toDF()
  }

  val all: Seq[GraftQuery] = Seq(
    // ---- metadata stats over the typed struct: size_bytes is measured
    // from the real payloads, the oracle states the wire-layout closed
    // form — a one-byte encoder drift fails this query
    q("mm_metadata_stats",
      s"""WITH $paramsCte,
         |sized AS (
         |  SELECT modality,
         |    $sizeSql AS size_bytes,
         |    CASE WHEN modality = 'audio' THEN 0 ELSE w END AS width,
         |    CASE modality WHEN 'audio' THEN ns * 1000 // $SampleRateHz
         |      WHEN 'video' THEN nf * 1000 // $VideoFps ELSE 0 END AS duration_ms
         |  FROM m)
         |SELECT modality, COUNT(*) AS n_items,
         |  CAST(SUM(size_bytes) AS BIGINT) AS total_bytes,
         |  CAST(SUM(width) AS BIGINT) AS total_width,
         |  CAST(MAX(duration_ms) AS BIGINT) AS max_duration_ms
         |FROM sized GROUP BY modality""".stripMargin) { (s, d) =>
      corpus(s, d).groupBy(col("modality")).agg(
        count(lit(1)).as("n_items"),
        sum(col("meta.size_bytes")).as("total_bytes"),
        sum(col("meta.width")).cast("long").as("total_width"),
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

    // ---- decode, byte/value halves: the parser walks real headers and
    // sums real pixel/sample values; the oracle recomputes both from the
    // generation arithmetic — full encoder∘decoder verification
    q("mm_decode_stats",
      s"""WITH $paramsCte,
         |vals AS (
         |  SELECT modality,
         |    $sizeSql AS size_bytes,
         |    CASE modality WHEN 'image' THEN 3*w*h WHEN 'audio' THEN ns
         |      ELSE nf*3*w*h END AS n_values,
         |    CASE modality
         |      WHEN 'image' THEN list_sum(list_transform(range(0, 3*w*h),
         |        i -> (doc_id*31 + i) % 256))
         |      WHEN 'audio' THEN list_sum(list_transform(range(0, ns),
         |        i -> (doc_id*7 + i*13) % 4096 - 2048))
         |      ELSE list_sum(list_transform(range(0, nf), f ->
         |        list_sum(list_transform(range(0, 3*w*h),
         |          i -> (doc_id*31 + f*97 + i) % 256)))) END AS value_sum
         |  FROM m)
         |SELECT modality, COUNT(*) AS n_decoded,
         |  CAST(SUM(size_bytes) AS BIGINT) AS total_bytes,
         |  CAST(SUM(n_values) AS BIGINT) AS total_values,
         |  CAST(SUM(value_sum) AS BIGINT) AS total_value_sum
         |FROM vals GROUP BY modality""".stripMargin) { (s, d) =>
      decodeMedia(corpus(s, d))
        .groupBy(col("modality"))
        .agg(
          count(lit(1)).as("n_decoded"),
          sum(col("n_bytes")).as("total_bytes"),
          sum(col("n_values")).as("total_values"),
          sum(col("value_sum")).as("total_value_sum"))
    },

    // ---- decode, dimension half: widths/heights/channels/frame counts as
    // PARSED from the payload headers (PPM ASCII dims, RIFF fmt chunk,
    // GRV0 frame count) vs the oracle's closed form
    q("mm_decode_dims",
      s"""WITH $paramsCte,
         |dims AS (
         |  SELECT modality,
         |    CASE WHEN modality = 'audio' THEN 0 ELSE w END AS width,
         |    CASE WHEN modality = 'audio' THEN 0 ELSE h END AS height,
         |    CASE WHEN modality = 'audio' THEN 1 ELSE 3 END AS channels,
         |    CASE modality WHEN 'image' THEN 1 WHEN 'audio' THEN 0 ELSE nf END AS n_frames
         |  FROM m)
         |SELECT modality,
         |  CAST(SUM(width) AS BIGINT) AS sum_width,
         |  CAST(SUM(height) AS BIGINT) AS sum_height,
         |  CAST(MAX(channels) AS BIGINT) AS channels,
         |  CAST(SUM(n_frames) AS BIGINT) AS total_frames
         |FROM dims GROUP BY modality""".stripMargin) { (s, d) =>
      decodeMedia(corpus(s, d))
        .groupBy(col("modality"))
        .agg(
          sum(col("width")).as("sum_width"),
          sum(col("height")).as("sum_height"),
          max(col("channels")).cast("long").as("channels"),
          sum(col("n_frames")).cast("long").as("total_frames"))
    },

    // ---- frame sampling through the real container walk: every 2nd frame
    // kept and re-encoded as a standalone PPM; counts AND re-encoded byte
    // sizes have closed forms
    q("mm_frame_counts",
      s"""WITH $paramsCte,
         |v AS (SELECT doc_id, w, h, nf, (nf + 1) // 2 AS kept
         |  FROM m WHERE modality = 'video')
         |SELECT COUNT(*) AS n_docs,
         |  CAST(SUM(kept) AS BIGINT) AS n_frames,
         |  CAST(SUM(kept * ($ppmSizeSql)) AS BIGINT) AS total_frame_bytes
         |FROM v""".stripMargin) { (s, d) =>
      frameSample(corpus(s, d), everyNth = 2)
        .agg(
          countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_frames"),
          sum(octet_length(col("frame"))).cast("long").as("total_frame_bytes"))
    },

    // ---- the dead-letter channel under planted faults: every 101st
    // payload has its magic byte destroyed; the safe decoder must route
    // EXACTLY those rows to quarantine and still produce the correct
    // value sums over the healthy rest (the oracle states both halves)
    q("mm_decode_quarantine",
      s"""WITH $paramsCte,
         |vals AS (
         |  SELECT modality, doc_id % 101 = 0 AS corrupt,
         |    CASE modality
         |      WHEN 'image' THEN list_sum(list_transform(range(0, 3*w*h),
         |        i -> (doc_id*31 + i) % 256))
         |      WHEN 'audio' THEN list_sum(list_transform(range(0, ns),
         |        i -> (doc_id*7 + i*13) % 4096 - 2048))
         |      ELSE list_sum(list_transform(range(0, nf), f ->
         |        list_sum(list_transform(range(0, 3*w*h),
         |          i -> (doc_id*31 + f*97 + i) % 256)))) END AS value_sum
         |  FROM m)
         |SELECT modality,
         |  CAST(SUM(CASE WHEN corrupt THEN 0 ELSE 1 END) AS BIGINT) AS n_ok,
         |  CAST(SUM(CASE WHEN corrupt THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
         |  CAST(SUM(CASE WHEN corrupt THEN 0 ELSE value_sum END) AS BIGINT) AS ok_value_sum
         |FROM vals GROUP BY modality""".stripMargin) { (s, d) =>
      decodeMediaSafe(corruptEvery101st(corpus(s, d)))
        .groupBy(col("modality"))
        .agg(
          sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
          sum(when(col("ok"), 0L).otherwise(1L)).as("n_quarantined"),
          sum(when(col("ok"), col("value_sum")).otherwise(0L)).as("ok_value_sum"))
    },

    // ---- perceptual hash over real decoded pixels: the oracle restates
    // the whole decode→8×8-resize→grayscale→comparison-bit chain as
    // closed-form arithmetic — a drift anywhere in codec, scaler, or bit
    // packing diverges. Block keys are the banded-hamming-join bucketing
    // columns ([[imagePairsByDHash]])
    q("mm_image_dhash", {
      s"""WITH $paramsCte,
         |img AS (SELECT doc_id, w, h FROM m WHERE modality = 'image'),
         |hashed AS (
         |  SELECT doc_id, ${dhashSql("doc_id*31")} AS dhash
         |  FROM img)
         |SELECT doc_id, dhash,
         |  CAST((dhash >> 0) & 16383 AS BIGINT) AS b0,
         |  CAST((dhash >> 14) & 16383 AS BIGINT) AS b1,
         |  CAST((dhash >> 28) & 16383 AS BIGINT) AS b2,
         |  CAST((dhash >> 42) & 16383 AS BIGINT) AS b3
         |FROM hashed""".stripMargin
    }) { (s, d) =>
      imageDHashes(corpus(s, d)).select(
        col("doc_id"), col("dhash"),
        shiftright(col("dhash"), 0).bitwiseAND(16383).cast("long").as("b0"),
        shiftright(col("dhash"), 14).bitwiseAND(16383).cast("long").as("b1"),
        shiftright(col("dhash"), 28).bitwiseAND(16383).cast("long").as("b2"),
        shiftright(col("dhash"), 42).bitwiseAND(16383).cast("long").as("b3"))
    },

    // ---- video near-dup by shared frame hashes: every decoded frame gets
    // a dHash; videos sharing any frame hash become candidate pairs with
    // their shared-frame count — the frame-level containment signal video
    // dedup pipelines use. Only joins on the frame-hash bucket (cost
    // tracks true collisions, never all video pairs)
    q("mm_video_framehash_overlap",
      s"""WITH $paramsCte,
         |vid AS (SELECT doc_id, w, h, nf FROM m WHERE modality = 'video'),
         |vf AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS f FROM vid),
         |hashed AS (
         |  SELECT doc_id, f, ${dhashSql("(doc_id*31 + f*97)")} AS fh
         |  FROM vf)
         |SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS n_shared_frames
         |FROM hashed x JOIN hashed y ON x.fh = y.fh AND x.doc_id < y.doc_id
         |GROUP BY x.doc_id, y.doc_id""".stripMargin) { (s, d) =>
      val spark0 = s
      import spark0.implicits._
      val frames = corpus(s, d).filter(col("modality") === "video")
        .select(col("doc_id"), col("modality"), col("content")).as[MMItem]
        .mapPartitions(_.flatMap { r =>
          decodeVideo(r.content).zipWithIndex.map { case (img, f) =>
            (r.doc_id, f, dHash56(img))
          }
        })
        .toDF("doc_id", "f", "fh")
      frames.as("x")
        .join(frames.as("y"),
          col("x.fh") === col("y.fh") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .agg(count(lit(1)).as("n_shared_frames"))
    },

    // ---- audio fingerprint over real decoded PCM: the energy-envelope
    // hash ([[MediaCodec.audioFingerprint28]]) restated closed-form by the
    // oracle — windows, |sample| energies, and comparison bits all exact
    // integer arithmetic
    q("mm_audio_fingerprint", {
      def energy(b: String) =
        s"""list_sum(list_transform(
           |  range(($b)*ns//29, least(($b)*ns//29 + 8, ns)),
           |  j -> abs((doc_id*7 + j*13) % 4096 - 2048)))""".stripMargin
      s"""WITH $paramsCte,
         |aud AS (SELECT doc_id, ns FROM m WHERE modality = 'audio'),
         |fp AS (
         |  SELECT doc_id,
         |    CAST(list_sum(list_transform(range(0, 28), b ->
         |      CASE WHEN (${energy("b+1")}) > (${energy("b")})
         |        THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)) AS BIGINT) AS afp
         |  FROM aud)
         |SELECT doc_id, afp,
         |  CAST((afp >> 0) & 127 AS BIGINT) AS b0,
         |  CAST((afp >> 7) & 127 AS BIGINT) AS b1,
         |  CAST((afp >> 14) & 127 AS BIGINT) AS b2,
         |  CAST((afp >> 21) & 127 AS BIGINT) AS b3
         |FROM fp""".stripMargin
    }) { (s, d) =>
      val spark0 = s
      import spark0.implicits._
      corpus(s, d).filter(col("modality") === "audio")
        .select(col("doc_id"), col("modality"), col("content")).as[MMItem]
        .mapPartitions(_.map { r =>
          ImgHash(r.doc_id, audioFingerprint28(decodeWav(r.content)))
        })
        .toDF("doc_id", "afp")
        .select(col("doc_id"), col("afp"),
          shiftright(col("afp"), 0).bitwiseAND(127).cast("long").as("b0"),
          shiftright(col("afp"), 7).bitwiseAND(127).cast("long").as("b1"),
          shiftright(col("afp"), 14).bitwiseAND(127).cast("long").as("b2"),
          shiftright(col("afp"), 21).bitwiseAND(127).cast("long").as("b3"))
    },

    // ---- the full chain: generate → decode → nearest-neighbor resize to
    // 8×6 → re-encode → decode AGAIN → aggregate. The oracle states the
    // nearest-neighbor source-index arithmetic directly; any error in
    // either codec direction or the scaler diverges
    q("mm_resize_stats",
      s"""WITH $paramsCte,
         |img AS (SELECT doc_id, w, h FROM m WHERE modality = 'image'),
         |rs AS (
         |  SELECT doc_id,
         |    list_sum(list_transform(range(0, 6), y ->
         |      list_sum(list_transform(range(0, 8), x ->
         |        list_sum(list_transform(range(0, 3), c ->
         |          (doc_id*31 + (((y*h)//6*w + (x*w)//8)*3 + c)) % 256)))))) AS value_sum
         |  FROM img)
         |SELECT COUNT(*) AS n_images,
         |  CAST(COUNT(*) * (9 + 1 + 1 + 3*8*6) AS BIGINT) AS total_bytes,
         |  CAST(SUM(value_sum) AS BIGINT) AS total_value_sum
         |FROM rs""".stripMargin) { (s, d) =>
      decodeMedia(resizeImages(corpus(s, d), ow = 8, oh = 6))
        .agg(
          count(lit(1)).as("n_images"),
          sum(col("n_bytes")).as("total_bytes"),
          sum(col("value_sum")).as("total_value_sum"))
    }
  )
}
