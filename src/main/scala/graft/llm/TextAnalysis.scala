package graft.llm

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline over `documents`
  * (builder prompt / BASELINE.json north star): quality scoring,
  * language-ID heuristic, token counting, document fingerprinting.
  * All run as narrow per-row transforms + one hash aggregation — no
  * shuffles besides the final groupBy, so they scale linearly with corpus
  * size.
  */
object TextAnalysis {
  import TextHash._

  // shared with TextPolicy — these are oracle-critical constants/shapes
  // (the stopword list and the split-on-single-space convention must stay
  // in lockstep with every SQL twin that uses them)
  private[llm] val stopwords = Seq("the", "a", "of", "and")

  // graft-wide: the one canonical tokenization (streaming twins reuse it)
  private[graft] def words(c: Column): Column = split(c, " ", -1)

  private[llm] def countIn(c: Column, xs: Seq[String]): Column =
    size(filter(words(c), w => xs.map(x => w === x).reduce(_ || _)))

  private[llm] def countInSql(e: String, xs: Seq[String]): String = {
    val list = xs.map(x => s"'$x'").mkString(", ")
    s"len(list_filter(string_split($e, ' '), w -> w IN ($list)))"
  }

  /** The corpus quality score (length / stopword / word-shape mix) as one
    * reusable column — `text_quality_score`'s formula verbatim, shared with
    * the dedup keeper-selection query so "quality" means one thing. */
  private[graft] def qualityScore(text: Column): Column = {
    val nw = size(words(text))
    val mwl = length(regexp_replace(text, " ", "")) * 1.0 / nw
    val stopRatio = countIn(text, stopwords) * 1.0 / nw
    lit(0.4) * least(nw / 100.0, lit(1.0)) +
      lit(0.4) * (lit(1.0) - stopRatio) +
      lit(0.2) * least(mwl / 8.0, lit(1.0))
  }

  private[graft] def qualityScoreSql(e: String): String =
    s"""0.4 * least(len(string_split($e, ' ')) / 100.0, 1.0)
       |    + 0.4 * (1.0 - ${countInSql(e, stopwords)} * 1.0 / len(string_split($e, ' ')))
       |    + 0.2 * least(len(replace($e, ' ', '')) * 1.0 / len(string_split($e, ' ')) / 8.0, 1.0)""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    // ---- quality scoring: length / stopword / word-shape heuristics
    q("text_quality_score",
      s"""SELECT doc_id,
         |  len(string_split(text, ' ')) AS n_words,
         |  len(replace(text, ' ', '')) AS n_chars_nospace,
         |  len(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')) AS mean_word_len,
         |  ${countInSql("text", stopwords)} * 1.0 / len(string_split(text, ' ')) AS stopword_ratio,
         |  ${qualityScoreSql("text")}
         |    AS quality_score
         |FROM documents""".stripMargin) { (s, d) =>
      val nw = size(words(col("text")))
      val nc = length(regexp_replace(col("text"), " ", ""))
      val mwl = nc * 1.0 / nw
      val stopRatio = countIn(col("text"), stopwords) * 1.0 / nw
      Tables.documents(s, d).select(
        col("doc_id"),
        nw.as("n_words"),
        nc.as("n_chars_nospace"),
        mwl.as("mean_word_len"),
        stopRatio.as("stopword_ratio"),
        qualityScore(col("text")).as("quality_score"))
    },

    // ---- language-ID heuristic: per-language marker-word hit counts,
    // deterministic argmax (priority order on ties)
    q("text_lang_id", {
      val en = countInSql("text", Seq("the", "a", "of", "and"))
      val de = countInSql("text", Seq("der", "die", "und", "ist"))
      val fr = countInSql("text", Seq("le", "la", "et", "est"))
      val es = countInSql("text", Seq("el", "los", "y", "es"))
      s"""SELECT doc_id, lang AS labeled_lang,
         |  CASE WHEN $en >= $de AND $en >= $fr AND $en >= $es AND $en > 0 THEN 'en'
         |       WHEN $de >= $fr AND $de >= $es AND $de > 0 THEN 'de'
         |       WHEN $fr >= $es AND $fr > 0 THEN 'fr'
         |       WHEN $es > 0 THEN 'es'
         |       ELSE 'unknown' END AS predicted_lang,
         |  $en AS en_hits, $de AS de_hits, $fr AS fr_hits, $es AS es_hits
         |FROM documents""".stripMargin
    }) { (s, d) =>
      val en = countIn(col("text"), Seq("the", "a", "of", "and"))
      val de = countIn(col("text"), Seq("der", "die", "und", "ist"))
      val fr = countIn(col("text"), Seq("le", "la", "et", "est"))
      val es = countIn(col("text"), Seq("el", "los", "y", "es"))
      Tables.documents(s, d).select(
        col("doc_id"), col("lang").as("labeled_lang"),
        when(en >= de && en >= fr && en >= es && en > 0, "en")
          .when(de >= fr && de >= es && de > 0, "de")
          .when(fr >= es && fr > 0, "fr")
          .when(es > 0, "es")
          .otherwise("unknown").as("predicted_lang"),
        en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"), es.as("es_hits"))
    },

    // ---- token counting: whitespace words, letter-run "BPE-ish" regex
    // tokens, chars/4 estimator — aggregated per (lang, source)
    q("text_token_counts",
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
        |  CAST(SUM(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS total_letter_tokens,
        |  CAST(SUM(CAST(ceil(len(text) / 4.0) AS BIGINT)) AS BIGINT) AS total_est_bpe_tokens
        |FROM documents GROUP BY lang, source""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(words(col("text")))).as("total_words"),
          sum(regexp_count(col("text"), lit("[a-z]+"))).as("total_letter_tokens"),
          sum(ceil(length(col("text")) / 4.0).cast("long")).as("total_est_bpe_tokens"))
    },

    // ---- corpus-relative novelty: how much of a document's shingle set
    // is unique / rare across the corpus (df = shingle document
    // frequency) — the cheap signal dedup pipelines use to spot boilerplate
    // vs fresh content; integer counts keep it exact
    q("text_df_novelty",
      s"""WITH sh AS (${shinglesSql()}),
         |dfreq AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh)
         |SELECT s.doc_id, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |  CAST(SUM(CASE WHEN df <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
         |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1.0 / COUNT(*) AS unique_ratio
         |FROM sh s JOIN dfreq USING (sh)
         |GROUP BY s.doc_id""".stripMargin) { (s, d) =>
      // key the exchanges on the 60-bit shingle HASH, not the 14-char
      // string: set-equivalent up to md5-prefix collisions (P ≈ 1e-9
      // corpus-wide, same contract as the whole dedup family), and both
      // shuffles move fixed-width BIGINTs instead of strings
      // localCheckpoint (r15): the shingle frame feeds dfreq AND the join
      // back — un-cached, the ~10M-md5 shingling pass ran twice; the
      // compact per-doc hash arrays are cached once and exploded per
      // consumer (explode is cheap, the digests are not)
      val ds = Tables.documentsParallel(s, d)
        .select(col("doc_id"), shingleHashArray(col("text")).as("hsa"))
        .localCheckpoint(eager = false)
      val sh = ds.select(col("doc_id"), explode(col("hsa")).as("sh"))
      val dfreq = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      sh.join(dfreq, "sh")
        .groupBy(col("doc_id"))
        .agg(
          count(lit(1)).as("n_shingles"),
          sum(when(col("df") === 1, 1).otherwise(0)).as("n_unique"),
          sum(when(col("df") <= 5, 1).otherwise(0)).as("n_rare"))
        .select(col("doc_id"), col("n_shingles"), col("n_unique"), col("n_rare"),
          (col("n_unique") * 1.0 / col("n_shingles")).as("unique_ratio"))
    },

    // ---- document fingerprinting: whole-text 60-bit md5 fingerprint +
    // min-shingle sketch (the 1-hash special case of MinHash)
    q("text_fingerprint", {
      s"""WITH sh AS (${shinglesSql()}),
         |mins AS (
         |  SELECT doc_id, min(${h64Sql("sh")}) AS min_shingle_hash,
         |         COUNT(*) AS n_shingles
         |  FROM sh GROUP BY doc_id)
         |SELECT d.doc_id, ${h64Sql("d.text")} AS fingerprint,
         |       m.min_shingle_hash, m.n_shingles
         |FROM documents d JOIN mins m ON d.doc_id = m.doc_id""".stripMargin
    }) { (s, d) =>
      // fully map-side: whole-text hash + min/size over the per-doc
      // shingle-hash array — no explode, no groupBy, no join
      Tables.documentsParallel(s, d)
        .select(col("doc_id"), h64(col("text")).as("fingerprint"),
          shingleHashArray(col("text")).as("hsa"))
        .select(col("doc_id"), col("fingerprint"),
          array_min(col("hsa")).as("min_shingle_hash"),
          size(col("hsa")).cast("long").as("n_shingles"))
    },

    // ---- WINNOWING fingerprint selection (Schleimer, Wilkerson & Aiken,
    // SIGMOD 2003 — the MOSS algorithm): from the positional rolling-hash
    // sequence, keep the MINIMUM hash of every 8-hash window (leftmost on
    // ties). Guarantees: any shared run of ≥ ShingleLen+7 chars yields a
    // shared fingerprint (detection threshold), density ≈ 2/(W+1) — the
    // robust, position-stable sketch `text_fingerprint`'s global min can't
    // give. Fully map-side: nested array HOFs per document, the only
    // exchange is the caller's (e.g. a group-by-fingerprint join, which
    // would partition by the 60-bit hash exactly like [[SpanDedup]]).
    q("text_winnow_fingerprints", {
      val k = ShingleLen
      val h = s"CAST('0x' || substr(md5(substr(text, i, $k)), 1, 15) AS BIGINT)"
      s"""WITH hs AS (
         |  SELECT doc_id,
         |    list_transform(generate_series(1, len(text) - ${k - 1}), i -> $h) AS ha
         |  FROM documents WHERE len(text) >= ${k + 7}),
         |wins AS (
         |  SELECT doc_id, ha, unnest(generate_series(1, len(ha) - 7)) AS j
         |  FROM hs),
         |sel AS (
         |  SELECT doc_id,
         |    list_min(ha[j : j + 7]) AS fp_hash,
         |    j - 1 + list_position(ha[j : j + 7], list_min(ha[j : j + 7])) AS p
         |  FROM wins)
         |SELECT DISTINCT doc_id, fp_hash, CAST(p AS BIGINT) AS pos
         |FROM sel""".stripMargin
    }) { (s, d) =>
      val k = ShingleLen
      // positional (NOT distinct) rolling hashes — the winnow needs the
      // in-order sequence, so shingleHashArray's set form does not apply
      val ha = transform(
        sequence(lit(1), length(col("text")) - (k - 1)),
        i => h64(substring(col("text"), i, lit(k))))
      // window-min selection through the native one-pass deque kernel
      // (r15, guide §1.2-2) — value-identical to the former
      // array_distinct(transform(…array_min(slice(…))…)) chain, which was
      // O(n·w) interpreted lambdas (48 process-cpu s of a 1.8 s query)
      Tables.documentsParallel(s, d)
        .filter(length(col("text")) >= k + 7)
        .select(col("doc_id"), ha.as("ha"))
        .select(col("doc_id"),
          explode(graft.functions.WinnowFingerprints(col("ha"), 8)).as("fp"))
        .select(col("doc_id"), col("fp.fp_hash").as("fp_hash"), col("fp.pos").as("pos"))
    },

    // ---- intra-document repetition: duplicate-word mass and the
    // most-repeated word's share — the quality signal that catches
    // keyword-stuffed / boilerplate-looped documents dedup can't (they
    // are unique ACROSS the corpus, degenerate WITHIN). Fully map-side:
    // per-row array ops, no explode, no join; only the trivial final
    // projection. top_word_share ties are broken identically on both
    // engines by taking the max (count, word) pair lexicographically.
    q("text_repetition",
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_words,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
        |  1.0 - len(list_distinct(string_split(text, ' '))) * 1.0
        |    / len(string_split(text, ' ')) AS dup_word_ratio,
        |  (SELECT MAX(cnt) FROM (
        |     SELECT COUNT(*) AS cnt FROM unnest(string_split(text, ' ')) AS u(w)
        |     GROUP BY w)) * 1.0 / len(string_split(text, ' ')) AS top_word_share
        |FROM documents""".stripMargin) { (s, d) =>
      val ws = words(col("text"))
      val nw = size(ws)
      val nd = size(array_distinct(ws))
      // max per-word count map-side in O(n log n): sort the word array,
      // then one aggregate pass tracking the longest equal-run (the
      // distinct×filter formulation is O(n_distinct · n_words) — quadratic
      // on exactly the long boilerplate docs this signal targets)
      val topCnt = expr(
        """aggregate(array_sort(split(text, ' ', -1)),
          |  named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
          |  (a, x) -> named_struct(
          |    'prev', x,
          |    'run', IF(x <=> a.prev, a.run + 1, 1),
          |    'best', GREATEST(a.best, IF(x <=> a.prev, a.run + 1, 1))),
          |  a -> a.best)""".stripMargin)
      Tables.documents(s, d).select(
        col("doc_id"),
        nw.as("n_words"),
        nd.as("n_distinct_words"),
        (lit(1.0) - nd * 1.0 / nw).as("dup_word_ratio"),
        (topCnt * 1.0 / nw).as("top_word_share"))
    }
  )
}
