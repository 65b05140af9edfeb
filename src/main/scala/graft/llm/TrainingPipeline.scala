package graft.llm

import graft.GraftQuery
import graft.GraftQuery.q
import graft.meter.MeterGen
import graft.ops.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data assembly operators over `documents` (builder prompt):
  * context-window sequence packing, deterministic train/test splits,
  * stratified sampling, and PII redaction — the steps between a deduped
  * corpus and actual training batches.
  *
  * Determinism doctrine (same as the meter generators): anywhere the
  * reference pipeline would use `random()`, these use the Knuth-hash
  * uniform [[graft.meter.MeterGen.u]] so every engine computes identical
  * rows and the DuckDB oracle checks the whole operator, not a statistic.
  */
object TrainingPipeline {

  /** Tokens per context window for [[packSequences]]. */
  private val PackBudget = 2048L

  /** Bloom decontamination geometry: [[BloomWords]]×63-bit bitmap (64 KiB
    * broadcast regardless of bench size), [[BloomProbes]] probes/shingle —
    * ~2-4% false positives at the sf0.1 fill rate, all removed by the
    * exact verify join. */
  private val BloomWords = 8192
  private val BloomProbes = 3

  /** k-anonymity class-size floor (the conventional k=5 audit bar). */
  private val KAnonThreshold = 5L

  /** Temporal-split cutoff: the generated events span 2024-01-01..30 at
    * every shipped SF, so this lands a ~80/20 train/eval split. */
  private val TemporalCutoff = "2024-01-25 00:00:00"
  /** l-diversity floor: distinct sensitive values required per QID class. */
  private val LDiversityL = 3L

  /** t-closeness threshold in ppm (t = 0.2). */
  private val TClosenessPpm = 200000L

  // sliding-window segmentation geometry shared by chunk_documents and
  // dedup_chunks_cross_doc — ONE definition (Scala + SQL twins below) so
  // the two queries cannot silently disagree about what a "chunk" is
  private val WindowWords = 64
  private val WindowStride = 48

  /** (doc_id, chunk_id, chunk) rows: overlapping word windows over the
    * corpus. Narrow projection + explode — no shuffle. */
  private def chunkRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
      .select(col("doc_id"),
        explode(expr(s"sequence(0, (size(ws) - 1) div $WindowStride)")).as("chunk_id"),
        col("ws"))
      .withColumn("chunk", expr(s"slice(ws, chunk_id * $WindowStride + 1, $WindowWords)"))
      .select(col("doc_id"), col("chunk_id"), col("chunk"))

  /** Oracle CTE twin of [[chunkRows]]: produces c(doc_id, kk, chunk). */
  private val chunkCtes: String =
    s"""w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |k AS (SELECT doc_id, ws,
       |        unnest(generate_series(0, (len(ws) - 1) // $WindowStride)) AS kk
       |      FROM w),
       |c AS (SELECT doc_id, kk,
       |        ws[kk * $WindowStride + 1 : kk * $WindowStride + $WindowWords] AS chunk
       |      FROM k)""".stripMargin
  private val ChunkSize = 100L

  val all: Seq[GraftQuery] = Seq(
    // ---- sequence packing: assign docs (in doc_id order) to fixed
    // token-budget bins by prefix sum — the distributed formulation is a
    // two-level scan: per-chunk token totals (one small aggregate), chunk
    // offsets via a window over the tiny chunk frame, then a
    // partition-local cumulative sum per chunk. No global single-partition
    // window anywhere: the only per-row window is partitioned by chunk, so
    // state per task is bounded by ChunkSize docs — the shape that
    // survives 100 TB (a global ORDER BY window would serialize the
    // corpus through one task). The oracle states the same semantics as
    // the plain global window DuckDB can afford at test scale.
    q("pack_sequences",
      s"""WITH toks AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
         |cum AS (
         |  SELECT doc_id, n,
         |    SUM(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
         |  FROM toks)
         |SELECT CAST((c - n) // $PackBudget AS BIGINT) AS bin_id,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(n) AS BIGINT) AS total_tokens,
         |  CAST(MIN(doc_id) AS BIGINT) AS first_doc_id,
         |  CAST(MAX(doc_id) AS BIGINT) AS last_doc_id
         |FROM cum GROUP BY 1""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("n"),
          expr(s"doc_id div $ChunkSize").as("chunk"))
      // level 1: token total per chunk; cumulative offset over the chunk
      // frame (cardinality n/ChunkSize — trivially small). chunk % 1 ≡ 0
      // is a NON-FOLDABLE constant partition key: it states the
      // single-task intent explicitly (the chunk frame is MEANT to flow
      // through one task) where a literal would be constant-folded out of
      // the partition spec back into WindowExec's warned empty-spec path.
      val chunkTotals = toks.groupBy(col("chunk"))
        .agg(sum(col("n")).as("chunk_tokens"))
        .withColumn("chunk_end", sum(col("chunk_tokens")).over(
          Window.partitionBy(pmod(col("chunk"), lit(1))).orderBy(col("chunk"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("chunk"), (col("chunk_end") - col("chunk_tokens")).as("offset"))
      // level 2: partition-local cumulative sum + broadcast chunk offsets
      val wChunk = Window.partitionBy(col("chunk")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks
        .join(broadcast(chunkTotals), Seq("chunk"))
        .withColumn("c", sum(col("n")).over(wChunk) + col("offset"))
        .withColumn("bin_id", expr(s"(c - n) div $PackBudget"))
        .groupBy(col("bin_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n")).as("total_tokens"),
          min(col("doc_id")).as("first_doc_id"),
          max(col("doc_id")).as("last_doc_id"))
    },

    // ---- deterministic train/validation/test split: hash-uniform on
    // doc_id (90/5/5), reproducible on any engine / any partitioning
    q("split_train_test",
      s"""WITH labeled AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS n,
         |    CASE WHEN ${MeterGen.uSql("doc_id * 13 + 5")} < 0.90 THEN 'train'
         |         WHEN ${MeterGen.uSql("doc_id * 13 + 5")} < 0.95 THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |SELECT split, COUNT(*) AS n_docs,
         |  CAST(SUM(n) AS BIGINT) AS total_words,
         |  CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
         |FROM labeled GROUP BY split""".stripMargin) { (s, d) =>
      val u = MeterGen.u(col("doc_id") * 13 + 5)
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("n"),
          when(u < 0.90, "train").when(u < 0.95, "valid").otherwise("test").as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_words"),
          min(col("doc_id")).as("min_doc_id"))
    },

    // ---- TEMPORAL train/eval split: everything before the cutoff
    // trains, everything after evaluates — the split a time-stamped
    // corpus needs for leakage-free evaluation (a hash split like
    // `split_train_test` lets the model peek at the future). Emits per
    // split the event/user counts, the hour-truncated time extent (the
    // gap evidence: max train hour <= min eval hour by construction),
    // and the cross-split user overlap — users active on both sides are
    // the remaining leakage surface for user-level features, which is a
    // property of the DATA a temporal split surfaces rather than hides.
    // Scale shape: one scan, a map-side split tag, one combinable
    // aggregate; the overlap is a distinct-key self-join (keys ≪ events)
    // broadcast back as a 1-row frame.
    q("split_temporal",
      s"""WITH e AS (
         |  SELECT ts, user_id,
         |    CASE WHEN ts < TIMESTAMP '$TemporalCutoff' THEN 'train' ELSE 'eval' END
         |      AS split
         |  FROM events),
         |o AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS overlap_users FROM (
         |    SELECT DISTINCT user_id FROM e WHERE split = 'train'
         |    INTERSECT
         |    SELECT DISTINCT user_id FROM e WHERE split = 'eval'))
         |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         |  CAST(epoch(date_trunc('hour', MIN(ts))) AS BIGINT) AS min_hour_epoch,
         |  CAST(epoch(date_trunc('hour', MAX(ts))) AS BIGINT) AS max_hour_epoch,
         |  o.overlap_users
         |FROM e, o GROUP BY split, o.overlap_users""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select(col("ts"), col("user_id"),
        when(col("ts") < lit(TemporalCutoff).cast("timestamp"), "train")
          .otherwise("eval").as("split"))
        .localCheckpoint(eager = false) // one scan feeds splits + overlap
      val tr = e.filter(col("split") === "train").select(col("user_id")).distinct()
      val ev = e.filter(col("split") === "eval").select(col("user_id")).distinct()
      val overlap = tr.join(ev, Seq("user_id"))
        .agg(count(lit(1)).as("overlap_users"))
      e.groupBy(col("split"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          unix_timestamp(date_trunc("hour", min(col("ts")))).as("min_hour_epoch"),
          unix_timestamp(date_trunc("hour", max(col("ts")))).as("max_hour_epoch"))
        .crossJoin(broadcast(overlap))
    },

    // ---- stratified sampling: per-language keep-fractions (downsample
    // the dominant classes, keep the rare ones) — the class-balancing step
    // of corpus assembly, as a row-level operator returning the kept rows
    q("sample_stratified",
      s"""SELECT doc_id, lang
         |FROM documents
         |WHERE ${MeterGen.uSql("doc_id * 7 + 3")} <
         |  CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.5 ELSE 1.0 END""".stripMargin) {
      (s, d) =>
        val keep = MeterGen.u(col("doc_id") * 7 + 3) <
          when(col("lang") === "en", 0.25).when(col("lang") === "de", 0.5).otherwise(1.0)
        Tables.documents(s, d).filter(keep).select(col("doc_id"), col("lang"))
    },

    // ---- per-domain cap (C4 / RefinedWeb-style per-host limits): keep at
    // most K documents per source, chosen by a deterministic hash PRIORITY
    // (md5 of doc_id) — the distributed equivalent of a uniform reservoir
    // sample per key, but reproducible on any engine and any partitioning.
    // One shuffle on the source key; the window is per-source, never global.
    // A hot domain at 100 TB would swap row_number for the native
    // [[graft.plans.TopKPerKey]] operator (map-side bounded-heap pruning),
    // which has identical semantics on (priority, doc_id) order.
    q("sample_cap_per_source",
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) WHERE rn <= 15""".stripMargin) { (s, d) =>
      val pri = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"))
        .withColumn("rn", row_number().over(pri))
        .filter(col("rn") <= 15).drop("rn")
    },

    // ---- CONSISTENT-HASH sampling: each doc flips a deterministic coin
    // (hash of its identity) against its source's keep-rate — the
    // shuffle-free sampling workhorse of repeated pipeline runs: verdicts
    // are stable across runs/partitionings/machines, a rate change only
    // flips docs whose coin sits between old and new rate (no global
    // reshuffle of the sample), and the filter is pure map-side (the
    // per-source rate table is a tiny agg broadcast back). Contrast with
    // sample_cap_per_source's per-source ranking window, which must
    // shuffle by source; this op touches no corpus-wide key at all.
    q("sample_consistent_hash",
      s"""WITH rates AS (
         |  SELECT source,
         |    ${TextHash.h64Sql("source || ':rate:v1'")} % 500001 + 100000 AS keep_ppm
         |  FROM (SELECT DISTINCT source FROM documents)),
         |coins AS (
         |  SELECT doc_id, source,
         |    ${TextHash.h64Sql("CAST(doc_id AS VARCHAR) || ':' || source")} % 1000000 AS coin
         |  FROM documents)
         |SELECT c.doc_id, c.source, CAST(r.keep_ppm AS BIGINT) AS keep_ppm,
         |  CAST(c.coin AS BIGINT) AS coin
         |FROM coins c JOIN rates r USING (source)
         |WHERE c.coin < r.keep_ppm""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      // per-source keep rates in [100000, 600000] ppm, themselves derived
      // by hash so the query is self-contained and fully deterministic
      val rates = docs.select(col("source")).distinct()
        .withColumn("keep_ppm",
          pmod(TextHash.h64(concat(col("source"), lit(":rate:v1"))), lit(500001L)) + 100000L)
      docs
        .withColumn("coin",
          pmod(TextHash.h64(concat(col("doc_id").cast("string"), lit(":"), col("source"))),
            lit(1000000L)))
        .join(broadcast(rates), Seq("source"))
        .filter(col("coin") < col("keep_ppm"))
        .select(col("doc_id"), col("source"), col("keep_ppm"), col("coin"))
    },

    // ---- systematic sampling PROPORTIONAL TO SIZE (PPS): K = 50 evenly
    // spaced token positions over the corpus prefix-sum line; a doc is
    // drawn once per sample point inside its cumulative-token interval,
    // so inclusion probability is exactly proportional to its token count
    // and a doc longer than the step draws multiple times (n_hits ≥ 2) —
    // the weighted-without-replacement workhorse (Madow 1949), all in
    // exact BIGINT floor arithmetic (no transcendental priority keys, so
    // the whole draw — not a statistic of it — is oracle-checkable).
    // Spark side reuses pack_sequences' two-level prefix sum: per-chunk
    // totals + a tiny offset window, then a per-chunk window — no global
    // single-task ORDER BY window at any scale. The oracle states the
    // same prefix sum as the plain global window DuckDB can afford.
    q("sample_weighted_systematic",
      """WITH t AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n,
        |    SUM(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t),
        |s AS (SELECT CAST(SUM(n) AS BIGINT) // 50 AS step FROM t)
        |SELECT doc_id, n AS n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
        |  CAST(cum // step - (cum - n) // step AS BIGINT) AS n_hits
        |FROM c CROSS JOIN s
        |WHERE cum // step > (cum - n) // step""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextAnalysis.words(col("text"))).cast("long").as("n"),
          expr(s"doc_id div $ChunkSize").as("chunk"))
      val chunkTotals = toks.groupBy(col("chunk"))
        .agg(sum(col("n")).as("chunk_tokens"))
        .withColumn("chunk_end", sum(col("chunk_tokens")).over(
          Window.partitionBy(pmod(col("chunk"), lit(1))).orderBy(col("chunk"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("chunk"), (col("chunk_end") - col("chunk_tokens")).as("offset"))
      // integer div, not /-then-cast: exact at any corpus size
      val step = toks.agg(expr("sum(n) div 50").as("step"))
      val wChunk = Window.partitionBy(col("chunk")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks
        .join(broadcast(chunkTotals), Seq("chunk"))
        .withColumn("cum", sum(col("n")).over(wChunk) + col("offset"))
        .crossJoin(broadcast(step))
        .filter(expr("cum div step > (cum - n) div step"))
        .select(col("doc_id"), col("n").as("n_tokens"),
          col("cum").as("cum_tokens"),
          expr("cum div step - (cum - n) div step").as("n_hits"))
    },

    // ---- IMPORTANCE-WEIGHTED resampling: systematic PPS where the size
    // measure is the corpus QUALITY SCORE ([[TextAnalysis.qualityScore]]
    // — the one shared definition keeper-selection and the Gopher gate
    // already use) instead of token count: inclusion probability becomes
    // proportional to quality, the "sample the training set toward the
    // good documents" curation op (the deterministic-integer cousin of
    // DSIR-style importance resampling). The per-doc double quantizes to
    // ppm BIGINT first, so every prefix sum and every draw is exact
    // integer arithmetic — the whole SAMPLE, not a statistic of it, is
    // the oracle check. Spark side reuses the two-level prefix sum (per-
    // chunk totals + tiny offset window): no global single-task window.
    q("sample_quality_pps",
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(round((${TextAnalysis.qualityScoreSql("text")}) * 1000000) AS BIGINT) AS w
         |  FROM documents WHERE n_chars > 0),
         |c AS (
         |  SELECT doc_id, w,
         |    SUM(w) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM t),
         |s AS (SELECT CAST(SUM(w) AS BIGINT) // 40 AS step FROM t)
         |SELECT doc_id, w AS weight_ppm, CAST(cum AS BIGINT) AS cum_weight,
         |  CAST(cum // step - (cum - w) // step AS BIGINT) AS n_hits
         |FROM c CROSS JOIN s
         |WHERE cum // step > (cum - w) // step""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d)
        .filter(col("n_chars") > 0)
        .select(col("doc_id"),
          round(TextAnalysis.qualityScore(col("text")) * 1000000).cast("long").as("w"),
          expr(s"doc_id div $ChunkSize").as("chunk"))
      val chunkTotals = toks.groupBy(col("chunk"))
        .agg(sum(col("w")).as("chunk_w"))
        .withColumn("chunk_end", sum(col("chunk_w")).over(
          Window.partitionBy(pmod(col("chunk"), lit(1))).orderBy(col("chunk"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("chunk"), (col("chunk_end") - col("chunk_w")).as("offset"))
      val step = toks.agg(expr("sum(w) div 40").as("step"))
      val wChunk = Window.partitionBy(col("chunk")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks
        .join(broadcast(chunkTotals), Seq("chunk"))
        .withColumn("cum", sum(col("w")).over(wChunk) + col("offset"))
        .crossJoin(broadcast(step))
        .filter(expr("cum div step > (cum - w) div step"))
        .select(col("doc_id"), col("w").as("weight_ppm"),
          col("cum").as("cum_weight"),
          expr("cum div step - (cum - w) div step").as("n_hits"))
    },

    // ---- domain mixing: resample sources toward target mix weights.
    // Unlike [[sample_stratified]]'s fixed fractions, the keep-fraction is
    // DERIVED FROM THE DATA: frac(source) = min(1, target_share · N_total
    // / N_source). Two-pass shape: one tiny counts aggregate (broadcast
    // back), then a map-side deterministic filter — the corpus never
    // shuffles. Weights: equal thirds across the three sources.
    q("mix_domains",
      s"""WITH counts AS (
         |  SELECT source, COUNT(*) AS n_source,
         |    SUM(COUNT(*)) OVER () AS n_total
         |  FROM documents GROUP BY source),
         |fracs AS (
         |  SELECT source,
         |    least(1.0, (1.0 / 3.0) * n_total / n_source) AS keep_frac
         |  FROM counts),
         |kept AS (
         |  SELECT d.doc_id, d.source
         |  FROM documents d JOIN fracs f ON d.source = f.source
         |  WHERE ${MeterGen.uSql("d.doc_id * 17 + 11")} < f.keep_frac)
         |SELECT source, COUNT(*) AS n_kept,
         |  CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
         |FROM kept GROUP BY source""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_source"))
      val total = counts.agg(sum(col("n_source")).as("n_total"))
      val fracs = counts.join(broadcast(total))
        .select(col("source"),
          least(lit(1.0), lit(1.0 / 3.0) * col("n_total") / col("n_source"))
            .as("keep_frac"))
      docs
        .join(broadcast(fracs), Seq("source"))
        .filter(MeterGen.u(col("doc_id") * 17 + 11) < col("keep_frac"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_doc_id"))
    },

    // ---- temperature-scaled mixing weights (Arivazhagan et al. 2019,
    // arXiv:1907.05019 §4: sample language l ∝ p_l^(1/T); T=2 ⇒ ∝ √p):
    // the REWEIGHTING TABLE a data loader consumes — flattens the source
    // distribution so head sources stop drowning the tail. √n via
    // floor(sqrt(BIGINT)) is exact on both engines for any realistic
    // count (doubles are correctly-rounded and n ≪ 2^52, so the floor
    // can't straddle a perfect square). Pure two-level aggregate over the
    // tiny source frame; the corpus is touched once for counts.
    q("mix_temperature_weights",
      """WITH counts AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
        |w AS (SELECT source, n_docs,
        |        CAST(floor(sqrt(n_docs)) AS BIGINT) AS w FROM counts),
        |t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw, CAST(SUM(n_docs) AS BIGINT) AS tn FROM w)
        |SELECT source, n_docs,
        |  CAST((n_docs * 1000000) // (SELECT tn FROM t) AS BIGINT) AS raw_share_ppm,
        |  CAST((w * 1000000) // (SELECT tw FROM t) AS BIGINT) AS temp_share_ppm
        |FROM w""".stripMargin) { (s, d) =>
      val counts = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .withColumn("w", floor(sqrt(col("n_docs"))).cast("long"))
      val t = counts.agg(sum(col("w")).as("tw"), sum(col("n_docs")).as("tn"))
      counts.crossJoin(broadcast(t))
        .select(col("source"), col("n_docs"),
          expr("(n_docs * 1000000) div tn").as("raw_share_ppm"),
          expr("(w * 1000000) div tw").as("temp_share_ppm"))
    },

    // ---- token-budget corpus selection: greedy per-language prefix
    // under a fixed token budget — the "give me N tokens per language"
    // op every mixture recipe needs. Docs are ranked by a deterministic
    // hash-uniform priority (a budget-capped stratified sample; swap the
    // priority for a quality score to get quality-ranked selection), then
    // a running token total per language admits the longest prefix that
    // fits. One window cumsum per lang; at 100 TB the hot-language
    // partition would use the same two-level chunked prefix sum
    // `pack_sequences` already implements.
    q("select_token_budget",
      s"""WITH t AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    ${MeterGen.uSql("doc_id * 23 + 5")} AS pr
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY pr, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM t)
         |SELECT doc_id, lang, n_tokens, cum_tokens
         |FROM c WHERE cum_tokens <= 5000""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("pr"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ", -1)).cast("long").as("n_tokens"),
          MeterGen.u(col("doc_id") * 23 + 5).as("pr"))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w).cast("long"))
        .filter(col("cum_tokens") <= 5000)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_tokens"))
    },

    // ---- capstone: the full corpus-assembly chain as ONE composed
    // operator — exact-dup keeper (md5 window), length quality gate,
    // language allowlist, deterministic split, per-(split, lang) stats.
    // Each stage is individually verified elsewhere; this query checks the
    // composition end-to-end (filters commute into the scan, the window is
    // the only wide stage before the final aggregate).
    q("corpus_assembly",
      s"""WITH kept AS (
         |  SELECT doc_id, lang, text,
         |    len(string_split(text, ' ')) AS n_words,
         |    min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
         |  FROM documents),
         |filtered AS (
         |  SELECT doc_id, lang, n_words,
         |    CASE WHEN ${MeterGen.uSql("doc_id * 13 + 5")} < 0.90 THEN 'train'
         |         WHEN ${MeterGen.uSql("doc_id * 13 + 5")} < 0.95 THEN 'valid'
         |         ELSE 'test' END AS split
         |  FROM kept
         |  WHERE doc_id = keeper AND n_words >= 50
         |    AND lang IN ('en', 'de', 'fr', 'es'))
         |SELECT split, lang, COUNT(*) AS n_docs,
         |  CAST(SUM(n_words) AS BIGINT) AS total_words
         |FROM filtered GROUP BY split, lang""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(md5(col("text")))
      val u = MeterGen.u(col("doc_id") * 13 + 5)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ", -1)).cast("long").as("n_words"),
          min(col("doc_id")).over(w).as("keeper"))
        .filter(col("doc_id") === col("keeper") && col("n_words") >= 50 &&
          col("lang").isin("en", "de", "fr", "es"))
        .withColumn("split",
          when(u < 0.90, "train").when(u < 0.95, "valid").otherwise("test"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("total_words"))
    },

    // ---- PII redaction: regex scrub of emails/phones before training.
    // The corpus has no real PII, so each doc gets a deterministic planted
    // contact line; the operator counts and strips it. Patterns are kept
    // to the Java-regex ∩ RE2 common subset so Spark and DuckDB agree.
    q("pii_redact", {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+1-555-[0-9]{4}"
      s"""WITH planted AS (
         |  SELECT doc_id,
         |    text || ' contact: user' || doc_id || '@example.com or +1-555-0199' AS t
         |  FROM documents),
         |scrubbed AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(t, '$emailRe')) AS n_emails,
         |    len(regexp_extract_all(t, '$phoneRe')) AS n_phones,
         |    regexp_replace(regexp_replace(t, '$emailRe', '[EMAIL]', 'g'),
         |                   '$phoneRe', '[PHONE]', 'g') AS clean
         |  FROM planted)
         |SELECT doc_id, n_emails, n_phones,
         |  len(clean) AS clean_len, right(clean, 34) AS clean_tail
         |FROM scrubbed""".stripMargin
    }) { (s, d) =>
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+1-555-[0-9]{4}"
      val planted = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"), lit(" contact: user"), col("doc_id"),
          lit("@example.com or +1-555-0199")).as("t"))
      planted.select(
        col("doc_id"),
        regexp_count(col("t"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("t"), lit(phoneRe)).cast("long").as("n_phones"),
        regexp_replace(regexp_replace(col("t"), emailRe, "[EMAIL]"), phoneRe, "[PHONE]")
          .as("clean"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          length(col("clean")).cast("long").as("clean_len"),
          substring(col("clean"), -34, 34).as("clean_tail"))
    },

    // ---- sliding-window document chunking: split each doc into
    // overlapping word windows (size 64, stride 48 — the context-window
    // segmentation step for long documents, upstream of packing). One
    // narrow projection + one explode; no shuffle at all before the
    // harness sink. The chunk CONTENT is verified, not just counts: each
    // chunk row carries the 60-bit hash of its joined text, which the
    // oracle recomputes from its own slice arithmetic.
    q("chunk_documents", {
      s"""WITH $chunkCtes
         |SELECT doc_id, CAST(kk AS BIGINT) AS chunk_id,
         |  CAST(kk * $WindowStride AS BIGINT) AS start_word,
         |  CAST(len(chunk) AS BIGINT) AS n_chunk_words,
         |  ${TextHash.h64Sql("array_to_string(chunk, ' ')")} AS chunk_hash
         |FROM c""".stripMargin
    }) { (s, d) =>
      chunkRows(Tables.documents(s, d))
        .select(
          col("doc_id"),
          col("chunk_id").cast("long").as("chunk_id"),
          (col("chunk_id") * WindowStride).cast("long").as("start_word"),
          size(col("chunk")).cast("long").as("n_chunk_words"),
          TextHash.h64(array_join(col("chunk"), " ")).as("chunk_hash"))
    },

    // ---- cross-document SPAN dedup: the C4 / suffix-array-style
    // "remove repeated passages" analogue at corpus scale, composed from
    // the chunk_documents chain. Chunks (64-word windows, stride 48) are
    // content-hashed; a chunk is a cross-doc duplicate when its hash
    // occurs in MORE THAN ONE document. Per-doc verdict: chunk counts,
    // duplicated-chunk count, dup ratio. Scale shape: chunking is a
    // narrow explode; the only shuffles are the chunk-hash aggregate
    // (map-side combined) and the join-back on the hash — candidate
    // volume tracks corpus size, never n² (the suffix-array alternative
    // needs a global sort; this is the shuffle-native form).
    q("dedup_chunks_cross_doc", {
      s"""WITH $chunkCtes,
         |h AS (SELECT doc_id,
         |        ${TextHash.h64Sql("array_to_string(chunk, ' ')")} AS chunk_hash
         |      FROM c),
         |df AS (SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs FROM h GROUP BY chunk_hash)
         |SELECT h.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |  CAST(SUM(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         |  CAST(SUM(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) * 1.0 / COUNT(*) AS dup_chunk_ratio
         |FROM h JOIN df ON h.chunk_hash = df.chunk_hash
         |GROUP BY h.doc_id""".stripMargin
    }) { (s, d) =>
      // hash each chunk ONCE: aggregate to per-(doc, hash) occurrence
      // counts first (lazily checkpointed — the md5 chunk hashing is the
      // CPU hot path and must not run once per consumer), derive the
      // cross-doc document frequency from that small frame, and join the
      // tiny df table back to the aggregate, never to the raw chunk rows.
      val pairs = chunkRows(Tables.documentsParallel(s, d))
        .select(col("doc_id"),
          TextHash.h64(array_join(col("chunk"), " ")).as("chunk_hash"))
        .groupBy(col("doc_id"), col("chunk_hash"))
        .agg(count(lit(1)).as("n_occ"))
        .localCheckpoint(eager = false)
      // one row per (doc, hash) in `pairs` => COUNT(*) = distinct docs
      val df = pairs.groupBy(col("chunk_hash"))
        .agg(count(lit(1)).as("n_docs"))
      pairs
        .join(df, Seq("chunk_hash"))
        .groupBy(col("doc_id"))
        .agg(
          sum(col("n_occ")).as("n_chunks"),
          sum(when(col("n_docs") > 1, col("n_occ")).otherwise(0L)).as("n_dup_chunks"),
          (sum(when(col("n_docs") > 1, col("n_occ")).otherwise(0L)) * 1.0
            / sum(col("n_occ"))).as("dup_chunk_ratio"))
    },

    // ---- benchmark decontamination: flag training docs sharing any
    // character shingle with the held-out eval set (doc_id % 97 = 0 stands
    // in for the benchmark). The n-gram-overlap contamination check every
    // serious pretraining pipeline runs before training. Scale shape: the
    // benchmark side is tiny relative to the corpus (evals are KBs, the
    // corpus is TBs), so its shingle set BROADCASTS — the train side never
    // shuffles for the join, only for its own per-doc aggregate. Inner
    // join ⇒ output rows are exactly the contaminated docs.
    q("decontaminate",
      s"""WITH shs AS (${TextHash.shinglesSql()}),
         |sh AS (SELECT doc_id, ${TextHash.h64Sql("sh")} AS sh FROM shs),
         |bench AS (SELECT doc_id AS bench_doc_id, sh FROM sh WHERE doc_id % 97 = 0),
         |train AS (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0)
         |SELECT t.doc_id,
         |  COUNT(DISTINCT t.sh) AS n_shared_shingles,
         |  COUNT(DISTINCT b.bench_doc_id) AS n_bench_docs
         |FROM train t JOIN bench b ON t.sh = b.sh
         |GROUP BY t.doc_id""".stripMargin) { (s, d) =>
      val shingled = Tables.documentsParallel(s, d)
        .select(col("doc_id"),
          explode(TextHash.shingleHashArray(col("text"))).as("sh"))
      val bench = shingled.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("bench_doc_id"), col("sh"))
      shingled.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), Seq("sh"))
        .groupBy(col("doc_id"))
        .agg(
          countDistinct(col("sh")).as("n_shared_shingles"),
          countDistinct(col("bench_doc_id")).as("n_bench_docs"))
    },

    // ---- Bloom-prefiltered decontamination (Bloom, CACM 1970): the
    // benchmark's shingle set is folded into a CONSTANT-SIZE bitmap
    // ([[BloomWords]]×63 bits; 63, not 64 — a shift into the BIGINT sign
    // bit overflows in the oracle engine), and the corpus probes that
    // broadcast bitmap instead of the bench set itself. Membership is
    // all-[[BloomProbes]]-bits-set; survivors (true hits + a few % false
    // positives at ~30% fill) then hit the EXACT bench-set join, so the
    // output is exactly `decontaminate`'s doc set — the bloom only prunes.
    // Why it matters at 100 TB: `decontaminate` broadcasts the whole bench
    // shingle set to every probe task, which for a full eval-suite (many
    // GBs of shingles) stops fitting; the bitmap is O(1) (64 KiB here
    // regardless of bench size), and the expensive exact join now touches
    // only the bloom-surviving sliver of the corpus. Probe positions use
    // Kirsch-Mitzenmacher double hashing (ESA 2006): pos_j = (h1 + j·h2)
    // mod M with h1/h2 the two halves of the ALREADY-computed 60-bit
    // shingle hash — zero additional digests per probe (md5 cost dominates
    // a bloom pass at corpus scale; K-M is the published fix, and the
    // asymptotic FP rate is unchanged). h2 is forced odd so its stride
    // cycles the full table. All arithmetic is exact BIGINT, identical in
    // both engines. Output per contaminated-candidate doc: bloom-candidate
    // vs exact-confirmed shingle counts (the gap IS the measured FP rate).
    q("decontaminate_bloom", {
      val M = BloomWords * 63
      val probeK = s"CROSS JOIN (SELECT unnest(generate_series(1, $BloomProbes)) AS k)"
      val posSql = s"((sh // 1073741824) + k * (2 * (sh % 1073741824) + 1)) % $M"
      s"""WITH shs AS (${TextHash.shinglesSql()}),
         |sh AS (SELECT doc_id, ${TextHash.h64Sql("sh")} AS sh FROM shs),
         |bsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0),
         |bpos AS (SELECT $posSql AS pos FROM bsh $probeK),
         |bloom AS (
         |  SELECT pos // 63 AS word, bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS bits
         |  FROM bpos GROUP BY 1),
         |probes AS (
         |  SELECT doc_id, sh, $posSql AS pos
         |  FROM (SELECT doc_id, sh FROM sh WHERE doc_id % 97 <> 0) $probeK),
         |hits AS (
         |  SELECT p.doc_id, p.sh,
         |    MIN(CASE WHEN (COALESCE(b.bits, 0) &
         |          (CAST(1 AS BIGINT) << CAST(p.pos % 63 AS INT))) <> 0
         |        THEN 1 ELSE 0 END) AS all_hit
         |  FROM probes p LEFT JOIN bloom b ON b.word = p.pos // 63
         |  GROUP BY p.doc_id, p.sh),
         |cand AS (SELECT doc_id, sh FROM hits WHERE all_hit = 1)
         |SELECT c.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_bloom_candidates,
         |  CAST(SUM(CASE WHEN b.sh IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_confirmed_shingles
         |FROM cand c LEFT JOIN bsh b ON c.sh = b.sh
         |GROUP BY c.doc_id""".stripMargin
    }) { (s, d) =>
      val M = BloomWords * 63L
      // K-M double hashing off the existing shingle hash: h1 = top 30
      // bits, h2 = odd stride from the low 30 bits — no md5 here
      val pos = (expr("(sh div 1073741824) + k * (2 * (sh % 1073741824) + 1)") % M)
        .as("pos")
      val sh = Tables.documentsParallel(s, d)
        .select(col("doc_id"),
          explode(TextHash.shingleHashArray(col("text"))).as("sh"))
      // bench shingle set: feeds the bloom build AND the exact verify —
      // truncate once; both consumers broadcast it
      val bsh = sh.filter(col("doc_id") % 97 === 0).select(col("sh")).distinct()
        .localCheckpoint(eager = false)
      val bloom = bsh
        .select(col("sh"), explode(expr(s"sequence(1, $BloomProbes)")).as("k"))
        .select(pos)
        .select(expr("pos div 63").as("word"),
          expr("shiftleft(cast(1 as bigint), cast(pos % 63 as int))").as("mask"))
        .groupBy(col("word")).agg(expr("bit_or(mask)").as("bits"))
      // probe side: NO row inflation and NO (doc, sh) re-aggregate — each
      // of the 3 probe positions is its own column, membership is 3
      // narrow BROADCAST lookups + one conjunctive filter, all map-side
      // (the explode→groupBy formulation paid a corpus-scale exchange to
      // reassemble the per-shingle verdict; this shape never takes the
      // shingle rows apart)
      def posJ(j: Int) =
        expr(s"((sh div 1073741824) + $j * (2 * (sh % 1073741824) + 1)) % $M")
      val withPos = (1 to BloomProbes).foldLeft(
        sh.filter(col("doc_id") % 97 =!= 0)) { (df, j) =>
        df.withColumn(s"p$j", posJ(j))
      }
      val joined = (1 to BloomProbes).foldLeft(withPos) { (df, j) =>
        df.join(broadcast(bloom.select(col("word").as(s"w$j"), col("bits").as(s"b$j"))),
          expr(s"p$j div 63") === col(s"w$j"), "left")
      }
      val allHit = (1 to BloomProbes).map(j =>
        expr(s"coalesce(b$j, cast(0 as bigint)) & " +
          s"shiftleft(cast(1 as bigint), cast(p$j % 63 as int))") =!= 0)
        .reduce(_ && _)
      val cand = joined.filter(allHit).select(col("doc_id"), col("sh"))
      cand
        .join(broadcast(bsh.select(col("sh").as("bsh"))),
          col("sh") === col("bsh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bloom_candidates"),
          sum(when(col("bsh").isNull, 0L).otherwise(1L)).as("n_confirmed_shingles"))
    },

    // ---- k-ANONYMITY audit (Sweeney, IJUFKS 2002) — the privacy
    // governance twin of pii_redact: before user-derived tables feed a
    // training corpus, every quasi-identifier equivalence class must hold
    // at least k individuals, or its rows re-identify people by linkage.
    // QIDs here: (nation, market segment, account balance generalized to
    // $500 bands — the standard generalization step). Output: one row per
    // equivalence class with its size and an at_risk flag (class smaller
    // than k ⇒ those rows need suppression or coarser generalization).
    // Scale shape: ONE map-side-combinable groupBy on the QID tuple — the
    // cheapest possible plan, and the class-size histogram it produces is
    // exactly what a 100 TB anonymization sweep computes per table.
    q("privacy_k_anonymity",
      s"""SELECT c_nationkey, c_mktsegment,
         |  CAST(FLOOR(CAST(round(c_acctbal * 100) AS BIGINT) / 50000.0) AS BIGINT)
         |    AS bal_band,
         |  CAST(COUNT(*) AS BIGINT) AS class_size,
         |  CAST(CASE WHEN COUNT(*) < $KAnonThreshold THEN 1 ELSE 0 END AS BIGINT)
         |    AS at_risk
         |FROM customer
         |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(Tables.cents(col("c_acctbal")) / 50000.0).as("bal_band"))
        .agg(count(lit(1)).as("class_size"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("bal_band"),
          col("class_size"),
          when(col("class_size") < KAnonThreshold, 1L).otherwise(0L).as("at_risk"))
    },

    // ---- l-DIVERSITY audit (Machanavajjhala et al., ICDE 2006) — the
    // k-anonymity companion: a quasi-identifier class can be LARGE yet
    // still leak if every member shares the same sensitive value, so the
    // class must also contain ≥ l distinct sensitive values. QIDs here
    // are (nation, segment); the sensitive attribute is the $500 balance
    // band the k-anonymity audit treats as quasi-identifying — the same
    // column plays either role depending on the threat model, which is
    // exactly why both audits exist. ONE map-side-combinable aggregate
    // (count + exact count-distinct per class); classes are
    // domain-bounded (|nations|×|segments|), so the audit output is tiny
    // at any corpus size.
    q("privacy_l_diversity",
      s"""SELECT c_nationkey, c_mktsegment,
         |  CAST(COUNT(*) AS BIGINT) AS class_size,
         |  CAST(COUNT(DISTINCT CAST(FLOOR(
         |    CAST(round(c_acctbal * 100) AS BIGINT) / 50000.0) AS BIGINT)) AS BIGINT)
         |    AS n_sensitive,
         |  CAST(CASE WHEN COUNT(DISTINCT CAST(FLOOR(
         |    CAST(round(c_acctbal * 100) AS BIGINT) / 50000.0) AS BIGINT))
         |      < $LDiversityL THEN 1 ELSE 0 END AS BIGINT) AS below_l
         |FROM customer
         |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val band = floor(Tables.cents(col("c_acctbal")) / 50000.0)
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("class_size"),
          countDistinct(band).as("n_sensitive"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
          col("n_sensitive"),
          when(col("n_sensitive") < LDiversityL, 1L).otherwise(0L).as("below_l"))
    },

    // ---- t-CLOSENESS audit (Li, Li & Venkatasubramanian, ICDE 2007) —
    // completing the anonymity trio: a class can be k-large and
    // l-diverse yet still leak when its sensitive-value DISTRIBUTION
    // skews far from the table's (e.g. a class holding only the top
    // balance bands). For the ordered sensitive attribute the distance
    // is the Earth Mover's Distance in its closed form — the mean
    // absolute difference of cumulative distributions, normalized by
    // m−1. All arithmetic is exact integer rationals: the per-band
    // cumulative difference accumulates n_cb·N − g_b·N_c (common
    // denominator N_c·N), and one final floor division lands the EMD in
    // ppm. Scale shape: the corpus pays ONE (class, band) map-side-
    // combinable count; the class×band grid, the cumulative windows and
    // the rollup all run on domain-bounded frames (|classes|×|bands|) —
    // tiny at any table size.
    q("privacy_t_closeness",
      s"""WITH bands AS (
         |  SELECT c_nationkey, c_mktsegment,
         |    CAST(FLOOR(CAST(round(c_acctbal * 100) AS BIGINT) / 50000.0) AS BIGINT)
         |      AS band
         |  FROM customer),
         |g AS (SELECT band, CAST(COUNT(*) AS BIGINT) AS gn FROM bands GROUP BY 1),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |               CAST(COUNT(DISTINCT band) AS BIGINT) AS m FROM bands),
         |cls AS (SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS nc
         |        FROM bands GROUP BY 1, 2),
         |cb AS (SELECT c_nationkey, c_mktsegment, band, CAST(COUNT(*) AS BIGINT) AS ncb
         |       FROM bands GROUP BY 1, 2, 3),
         |grid AS (
         |  SELECT c.c_nationkey, c.c_mktsegment, c.nc, g.band, g.gn,
         |    COALESCE(cb.ncb, 0) AS ncb
         |  FROM cls c CROSS JOIN g
         |  LEFT JOIN cb ON cb.c_nationkey = c.c_nationkey
         |    AND cb.c_mktsegment = c.c_mktsegment AND cb.band = g.band),
         |cum AS (
         |  SELECT c_nationkey, c_mktsegment, nc, t.n, t.m,
         |    SUM(ncb * t.n - gn * nc) OVER (
         |      PARTITION BY c_nationkey, c_mktsegment ORDER BY band
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cd
         |  FROM grid, tot t)
         |SELECT c_nationkey, c_mktsegment, CAST(nc AS BIGINT) AS class_size,
         |  CAST(SUM(ABS(cd)) * 1000000 // (nc * n * (m - 1)) AS BIGINT) AS emd_ppm,
         |  CAST(CASE WHEN SUM(ABS(cd)) * 1000000 // (nc * n * (m - 1))
         |            > $TClosenessPpm THEN 1 ELSE 0 END AS BIGINT) AS above_t
         |FROM cum GROUP BY 1, 2, nc, n, m""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val bands = Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(Tables.cents(col("c_acctbal")) / 50000.0).as("band"))
        .localCheckpoint(eager = false) // one scan feeds all four aggregates
      val g = bands.groupBy(col("band")).agg(count(lit(1)).as("gn"))
      val tot = bands.agg(count(lit(1)).as("n"), countDistinct(col("band")).as("m"))
      val cls = bands.groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("nc"))
      val cb = bands.groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
        .agg(count(lit(1)).as("ncb"))
      val byClass = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
        .orderBy(col("band"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cls.crossJoin(broadcast(g))
        .join(cb, Seq("c_nationkey", "c_mktsegment", "band"), "left")
        .withColumn("ncb", coalesce(col("ncb"), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("cd", sum(col("ncb") * col("n") - col("gn") * col("nc")).over(byClass))
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          col("nc"), col("n"), col("m"))
        .agg(sum(abs(col("cd"))).as("sad"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("nc").as("class_size"),
          expr("sad * 1000000L div (nc * n * (m - 1))").as("emd_ppm"),
          when(expr("sad * 1000000L div (nc * n * (m - 1))") > TClosenessPpm, 1L)
            .otherwise(0L).as("above_t"))
    },

    // ---- RANDOMIZED RESPONSE (Warner, JASA 1965 — the local-DP
    // mechanism): each individual reports their sensitive bit honestly
    // with p = 3/4, else a fair coin, giving plausible deniability
    // (P(report=1|b=1) = 3/4 + 1/8 = 7/8, P(report=1|b=0) = 1/8, so
    // ε = ln(7/8 ÷ 1/8) = ln 7 local differential privacy); the
    // aggregate recovers an unbiased prevalence estimate
    // π̂ = (mean(report) − 1/8) / (3/4). Completes the anonymity family
    // with the COLLECTION-side mechanism the k/l/t audits assume was
    // absent. Both coins derive from the same md5-keyed hash the
    // consistent-sampling family uses, so the mechanism is deterministic
    // per individual (and therefore oracle-checkable): honest ⇔
    // h mod 4 < 3, coin = bit 2 of h. The estimator is exact-integer
    // rationals floored to ppm and clamped to [0, 1e6]; the within_5pp
    // verdict is the bounded-assertion pattern the sketch queries
    // established (measured diff ≤ 2.9 pp at every shipped SF). Scale
    // shape: ONE map-side-combinable aggregate, no shuffle wider than
    // three partial sums.
    q("privacy_randomized_response",
      s"""WITH f AS (
         |  SELECT CASE WHEN CAST(round(c_acctbal * 100) AS BIGINT) > 500000
         |      THEN 1 ELSE 0 END AS b,
         |    ${TextHash.h64Sql("'rr:v1:' || CAST(c_custkey AS VARCHAR)")} AS h
         |  FROM customer),
         |rep AS (
         |  SELECT b, CASE WHEN h % 4 < 3 THEN b ELSE (h // 4) % 2 END AS r FROM f),
         |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(r) AS BIGINT) AS s,
         |  CAST(SUM(b) AS BIGINT) AS true_yes FROM rep),
         |est AS (SELECT n, s, true_yes,
         |  CAST(LEAST(GREATEST(8 * s - n, 0) * 1000000 // (6 * n), 1000000) AS BIGINT)
         |    AS est_ppm,
         |  CAST(true_yes * 1000000 // n AS BIGINT) AS true_ppm FROM agg)
         |SELECT n, s AS reported_yes, true_yes, est_ppm, true_ppm,
         |  CAST(CASE WHEN ABS(est_ppm - true_ppm) <= 50000 THEN 1 ELSE 0 END
         |    AS BIGINT) AS within_5pp
         |FROM est""".stripMargin) { (s, d) =>
      val f = Tables.customer(s, d).select(
        when(Tables.cents(col("c_acctbal")) > 500000L, 1L).otherwise(0L).as("b"),
        TextHash.h64(concat(lit("rr:v1:"), col("c_custkey").cast("string"))).as("h"))
      // h is a nonnegative 60-bit value, so % ≡ pmod and // ≡ div here
      val rep = f.select(col("b"),
        when(pmod(col("h"), lit(4L)) < 3, col("b"))
          .otherwise(pmod(expr("h div 4"), lit(2L))).as("r"))
      rep.agg(count(lit(1)).as("n"), sum(col("r")).as("s"),
          sum(col("b")).as("true_yes"))
        .select(col("n"), col("s"), col("true_yes"),
          least(expr("greatest(8 * s - n, 0L) * 1000000L div (6 * n)"),
            lit(1000000L)).as("est_ppm"),
          expr("true_yes * 1000000L div n").as("true_ppm"))
        .select(col("n"), col("s").as("reported_yes"), col("true_yes"),
          col("est_ppm"), col("true_ppm"),
          when(abs(col("est_ppm") - col("true_ppm")) <= 50000L, 1L)
            .otherwise(0L).as("within_5pp"))
    },

    // ---- DP RELEASE of a histogram (central model): per-(day, type)
    // cell counts released with BINOMIAL-mechanism noise (Dwork,
    // Kenthapadi, McSherry, Mironov, Naor, EUROCRYPT 2006): noise =
    // Binomial(60, 1/2) − 30, i.e. `bit_count` of the cell's 60-bit
    // md5-keyed hash — σ² = 15, and by the Gaussian-mechanism analysis
    // (Δ=1 for event-level privacy, σ = √15) the release is
    // ≈ (1.25, 1e-5)-DP per cell; the (day,type) cells partition the
    // rows, so parallel composition keeps that budget for the WHOLE
    // histogram. Only the noisy counts are published (no exact column —
    // the release IS the output), yet the query is hash-exact: the noise
    // is a pure integer function of the cell key, reproduced verbatim by
    // the oracle. Caveats stated, not hidden: privacy unit is one EVENT
    // (a user with many events composes), empty domain cells are not
    // padded, and a deterministic keyed draw is a HARNESS device standing
    // in for a secret random draw — the mechanism's algebra, sensitivity,
    // and noise distribution are what is being engineered and verified.
    // Scale shape: one map-side-combinable count + a per-cell hash — no
    // second pass, no join.
    q("privacy_dp_counts",
      s"""WITH c AS (
         |  SELECT CAST(ts AS DATE) AS day, event_type,
         |    CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2)
         |SELECT day, event_type,
         |  n + CAST(bit_count(${TextHash.h64Sql(
               "'dp:v1:' || CAST(day AS VARCHAR) || ':' || event_type")}) AS BIGINT)
         |    - 30 AS noisy_n
         |FROM c""".stripMargin) { (s, d) =>
      val h = TextHash.h64(concat(lit("dp:v1:"),
        col("day").cast("string"), lit(":"), col("event_type")))
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("day"), col("event_type"),
          (col("n") + bit_count(h).cast("long") - 30L).as("noisy_n"))
    }
  )
}
