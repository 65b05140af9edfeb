package graft.llm

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT SUBSTRING span dedup — the span-level complement of the document-
  * level near-dup family ([[Dedup]]): find runs of text that are duplicated
  * VERBATIM across different documents and report, per document, the maximal
  * duplicated spans (count, word mass, ratio). This is the operator behind
  * "remove any substring repeated across the corpus" training-data curation
  * (suffix-array substring dedup, re-expressed relationally): document-level
  * dedup misses boilerplate — headers, license blocks, navigation chrome —
  * pasted into otherwise-unique documents; span dedup is what catches it.
  *
  * Relational re-expression (no suffix array; Spark-first):
  *   1. positional word n-grams: one row per (doc, pos), keyed by the 60-bit
  *      md5 hash of the n-gram text ([[TextHash.h64]]) — grams never travel
  *      as strings, so the shuffled relation is 16 bytes/row regardless of
  *      n-gram width;
  *   2. cross-doc filter: gram hashes seen in ≥ 2 distinct documents (one
  *      hash-partitioned aggregate — THE shuffle of the operator);
  *   3. island merge per document: overlapping/adjacent hit intervals
  *      [pos, pos+n−1] merge into maximal spans via the classic
  *      running-max-end window — keyed by doc_id, so span assembly is
  *      embarrassingly parallel.
  *
  * At 100 TB: step 2 partitions by gram hash (uniform by construction);
  * nothing ever joins the corpus against itself row-by-row — a doc's
  * positions meet only the tiny duplicated-hash set (semi join). The
  * window in step 3 is per-document state, bounded by document length.
  * A true suffix automaton finds arbitrary-length duplicates; the n-gram
  * relaxation finds every duplicate of length ≥ [[SpanDedup.SpanN]] words
  * (shorter ones are below the boilerplate floor by construction).
  */
object SpanDedup {
  import TextHash.h64Sql

  /** Span resolution: the minimum duplicated run, in words. 8 words ≈ 45
    * chars of this corpus — long enough that chance n-gram collisions
    * across synthetic docs are meaningful duplication, short enough to
    * catch one pasted sentence. */
  val SpanN = 8

  /** Intra-document repetition resolution, in words: the within-doc twin
    * operates at trigram grain (Gopher-style repetition filters bound
    * 2-4-gram repeats) — a doc repeating itself is a much lower-floor
    * signal than cross-doc boilerplate. */
  val IntraN = 3

  /** Per-doc word arrays (split on ' ', the shared tokenizer). */
  private def docWords(docsRaw: org.apache.spark.sql.DataFrame) =
    docsRaw.select(col("doc_id"), TextAnalysis.words(col("text")).as("ws"))

  /** Positional `n`-gram hashes: one 16-byte (doc_id, pos, gh) row per
    * gram — the relation every span operator shuffles.
    *
    * r15: the hashes come from ONE [[graft.functions.PosGramHashes]] pass
    * per document (value-identical to the per-position
    * h64(array_join(slice(…)))), and the compact per-doc hash array is
    * lazily checkpointed BEFORE the explode — every span operator consumes
    * posGrams twice (the dup-gram aggregate and the hit join), which
    * re-ran the whole gram-hash computation per consumer (profiled: the
    * two gram stages were ~8.6 cpu-s of dedup_span_exact's 2.2 s). */
  private def posGramsOf(docs: org.apache.spark.sql.DataFrame, n: Int) =
    // size(ws) >= n matches the former explode bounds (sequence(1, 0)
    // steps DOWN — the ANSI out-of-bounds trap the filter guards)
    docs
      .filter(size(col("ws")) >= n)
      .select(col("doc_id"),
        graft.functions.PosGramHashes(col("ws"), n).as("ghs"))
      .localCheckpoint(eager = false)
      .select(col("doc_id"), posexplode(col("ghs")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("pos"), col("col").as("gh"))

  /** Island merge: maximal contiguous spans (doc_id, span_id, s, e) from
    * hit intervals (doc_id, pos, end_pos) — the classic running-max-end
    * window, per-document state only. */
  private def islandsOf(hits: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevMaxEnd = max(col("end_pos"))
      .over(byPos.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("new_span",
        when(col("pos") > coalesce(prevMaxEnd, lit(-1L)) + 1, 1).otherwise(0))
      .withColumn("span_id", sum(col("new_span"))
        .over(byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(min(col("pos")).as("s"), max(col("end_pos")).as("e"))
  }

  /** The operator over any (doc_id, text) frame — the registered query
    * binds it to the driver corpus; specs feed planted documents. */
  private[llm] def spanReport(docsRaw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val docs = docWords(docsRaw)
    val posGrams = posGramsOf(docs, SpanN)
    val dupGrams = posGrams
      .groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("gh"))
    val hits = posGrams
      .join(dupGrams, Seq("gh"), "left_semi")
      .select(col("doc_id"), col("pos"), (col("pos") + (SpanN - 1)).as("end_pos"))
    val spans = islandsOf(hits)
    val perDoc = spans
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("e") - col("s") + 1).as("dup_words"))
    docs
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_words"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_words"), lit(0L)).as("dup_words"),
        (coalesce(col("dup_words"), lit(0L)) * 1.0 / col("n_words")).as("dup_ratio"))
  }

  /** Span REMOVAL — the curation step after [[spanReport]]: emit the
    * CLEANED corpus with every cross-doc duplicated span cut, keeping the
    * first occurrence corpus-wide. "First" is per gram: the smallest
    * doc_id holding the gram keeps it; any later doc's occurrence is a cut
    * hit. Hits island-merge exactly as the report does, then the cut is a
    * map-side array filter against each doc's (small) span list — the
    * corpus never joins itself row-by-row, and reassembly is per-doc local
    * (same 100 TB shape as the report: one gram-hash shuffle + doc-keyed
    * windows). */
  private[llm] def spanRemove(docsRaw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val docs = docWords(docsRaw)
    val posGrams = posGramsOf(docs, SpanN)
    val dupKeep = posGrams
      .groupBy(col("gh"))
      .agg(countDistinct(col("doc_id")).as("nd"), min(col("doc_id")).as("keeper"))
      .filter(col("nd") >= 2)
      .select(col("gh"), col("keeper"))
    val hits = posGrams
      .join(dupKeep, Seq("gh"))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"), col("pos"), (col("pos") + (SpanN - 1)).as("end_pos"))
    cutAndEmit(docs, islandsOf(hits))
  }

  /** Cut the (disjoint, island-merged) removal spans out of each doc and
    * emit counts + reassembled text. Map-side: each doc meets only its own
    * small span list (broadcast-size per row), positions are cut at most
    * once, so kept_words = n_words − Σ(e − s + 1) by construction. */
  private def cutAndEmit(docs: org.apache.spark.sql.DataFrame,
      spans: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val perDocSpans = spans
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("spans"))
    docs
      .join(perDocSpans, Seq("doc_id"), "left")
      .withColumn("kept", expr(
        """filter(zip_with(ws, sequence(1, size(ws)), (w, i) -> named_struct('w', w, 'i', i)),
          |  p -> spans IS NULL OR NOT exists(spans, sp -> p.i >= sp.s AND p.i <= sp.e))""".stripMargin))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        (size(col("ws")) - size(col("kept"))).cast("long").as("removed_words"),
        size(col("kept")).cast("long").as("kept_words"),
        array_join(expr("transform(kept, p -> p.w)"), " ").as("cleaned_text"))
  }

  /** INTRA-document repetition removal — the within-doc twin of
    * [[spanRemove]] (Gopher-style repetition curation): a position is a
    * cut hit when its [[IntraN]]-gram already occurred EARLIER in the same
    * document (the first occurrence keeps). Everything is doc-keyed — the
    * (doc, gram) first-occurrence window and the island merge both
    * partition by document, so the operator needs NO corpus-wide shuffle
    * key at all: at 100 TB it repartitions by doc_id once and every later
    * stage is partition-local. */
  private[llm] def spanIntradoc(docsRaw: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val docs = docWords(docsRaw)
    val posGrams = posGramsOf(docs, IntraN)
    val byDocGram = Window.partitionBy(col("doc_id"), col("gh"))
    val hits = posGrams
      .withColumn("minpos", min(col("pos")).over(byDocGram))
      .filter(col("pos") > col("minpos"))
      .select(col("doc_id"), col("pos"), (col("pos") + (IntraN - 1)).as("end_pos"))
    cutAndEmit(docs, islandsOf(hits))
  }

  /** Oracle CTE tail shared by both removal queries: island merge of a
    * `hits(doc_id, pos, end_pos)` CTE, position anti-join reassembly over
    * `t(doc_id, ws)`, final per-doc counts + cleaned text. */
  private val removalSqlTail: String =
    s"""flagged AS (
       |  SELECT doc_id, pos, end_pos,
       |    CASE WHEN pos > COALESCE(MAX(end_pos) OVER (
       |        PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
       |      THEN 1 ELSE 0 END AS new_span
       |  FROM hits),
       |islands AS (
       |  SELECT doc_id, pos, end_pos,
       |    SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
       |  FROM flagged),
       |spans AS (
       |  SELECT doc_id, span_id, MIN(pos) AS s, MAX(end_pos) AS e
       |  FROM islands GROUP BY 1, 2),
       |posw AS (
       |  SELECT doc_id, i AS pos, ws[i] AS w
       |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM t)),
       |cut AS (
       |  SELECT p.doc_id, p.pos FROM posw p
       |  JOIN spans sp ON p.doc_id = sp.doc_id AND p.pos BETWEEN sp.s AND sp.e),
       |kept AS (SELECT p.* FROM posw p ANTI JOIN cut c USING (doc_id, pos)),
       |cleaned AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_words,
       |    string_agg(w, ' ' ORDER BY pos) AS cleaned_text
       |  FROM kept GROUP BY 1)
       |SELECT t.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
       |  CAST(len(ws) AS BIGINT) - COALESCE(kept_words, 0) AS removed_words,
       |  COALESCE(kept_words, 0) AS kept_words,
       |  COALESCE(cleaned_text, '') AS cleaned_text
       |FROM t LEFT JOIN cleaned USING (doc_id)""".stripMargin

  private def posGramsSql(n: Int): String = {
    val g = h64Sql(s"array_to_string(list_slice(ws, i, i + ${n - 1}), ' ')")
    s"""t AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |pg AS (
       |  SELECT doc_id, i AS pos, $g AS gh
       |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${n - 1})) AS i
       |        FROM t WHERE len(ws) >= $n))""".stripMargin
  }

  val all: Seq[GraftQuery] = Seq(
    // ---- per-doc duplicated-span report. Docs shorter than SpanN words
    // cannot host a span and report zeros (LEFT join from the corpus).
    // Island rule: a hit at pos extends the current span when it overlaps
    // it or touches it (pos ≤ prev_max_end + 1) — merged spans are maximal
    // contiguous duplicated regions, so dup_words is the exact word mass
    // a span-removal pass would cut.
    q("dedup_span_exact", {
      val g = h64Sql(s"array_to_string(list_slice(ws, i, i + ${SpanN - 1}), ' ')")
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |pg AS (
         |  SELECT doc_id, i AS pos, $g AS gh
         |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - ${SpanN - 1})) AS i
         |        FROM t WHERE len(ws) >= $SpanN)),
         |dup AS (SELECT gh FROM pg GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
         |hits AS (
         |  SELECT doc_id, pos, pos + ${SpanN - 1} AS end_pos
         |  FROM pg JOIN dup USING (gh)),
         |flagged AS (
         |  SELECT doc_id, pos, end_pos,
         |    CASE WHEN pos > COALESCE(MAX(end_pos) OVER (
         |        PARTITION BY doc_id ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
         |      THEN 1 ELSE 0 END AS new_span
         |  FROM hits),
         |islands AS (
         |  SELECT doc_id, pos, end_pos,
         |    SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
         |  FROM flagged),
         |spans AS (
         |  SELECT doc_id, span_id, MIN(pos) AS s, MAX(end_pos) AS e
         |  FROM islands GROUP BY 1, 2),
         |per_doc AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         |    CAST(SUM(e - s + 1) AS BIGINT) AS dup_words
         |  FROM spans GROUP BY 1)
         |SELECT t.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
         |  COALESCE(n_spans, 0) AS n_spans,
         |  COALESCE(dup_words, 0) AS dup_words,
         |  COALESCE(dup_words, 0) * 1.0 / len(ws) AS dup_ratio
         |FROM t LEFT JOIN per_doc USING (doc_id)""".stripMargin
    }) { (s, d) => spanReport(Tables.documentsParallel(s, d)) },

    // ---- span REMOVAL: the cleaned corpus itself. Keeper rule: per gram,
    // the smallest doc_id keeps its occurrence; later docs' hits merge
    // into removal islands and are cut. The oracle rebuilds cleaned text
    // by position anti-join + ordered string_agg — same word sequence as
    // the engine's map-side array filter, compared verbatim (so the hash
    // gate covers the reassembled TEXT, not just the counts).
    q("dedup_span_remove",
      s"""WITH ${posGramsSql(SpanN)},
         |dup AS (
         |  SELECT gh, MIN(doc_id) AS keeper FROM pg
         |  GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
         |hits AS (
         |  SELECT pg.doc_id, pos, pos + ${SpanN - 1} AS end_pos
         |  FROM pg JOIN dup USING (gh) WHERE pg.doc_id <> dup.keeper),
         |$removalSqlTail""".stripMargin
    ) { (s, d) => spanRemove(Tables.documentsParallel(s, d)) },

    // ---- INTRA-doc repetition removal (Gopher-style): cut every later
    // occurrence of a trigram already seen in the same document, then
    // island-merge and reassemble — the within-doc twin of
    // dedup_span_remove, entirely doc-keyed (no corpus-wide shuffle key).
    q("dedup_span_intradoc",
      s"""WITH ${posGramsSql(IntraN)},
         |firsts AS (
         |  SELECT doc_id, gh, MIN(pos) AS minpos FROM pg GROUP BY 1, 2),
         |hits AS (
         |  SELECT pg.doc_id, pos, pos + ${IntraN - 1} AS end_pos
         |  FROM pg JOIN firsts USING (doc_id, gh) WHERE pos > minpos),
         |$removalSqlTail""".stripMargin
    ) { (s, d) => spanIntradoc(Tables.documentsParallel(s, d)) })
}
