package graft.llm

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Named corpus-filtering POLICIES a production training-data pipeline
  * applies before anything else touches the corpus — re-expressions of the
  * published Gopher (Rae et al. 2021, arXiv:2112.11446 §A1.1) and C4
  * (Raffel et al. 2020, arXiv:1910.10683 §2.2) cleaning rules over the
  * `documents` table. These differ from [[TextAnalysis]]'s free-form
  * quality *scores*: a policy emits per-rule boolean verdicts plus one
  * composite keep/drop decision, which is what downstream mixing /
  * packing stages consume.
  *
  * Scale design: every rule is a narrow per-row expression (no shuffle at
  * all for Gopher; C4's exact-dup rule is one hash shuffle on the text
  * key, the same shape as `dedup_exact`). All flags are BIGINT 0/1 — not
  * BOOLEAN — so the driver's pandas dtype comparison is byte-stable
  * across engines.
  */
object TextPolicy {
  // canonical split convention + stopword list live in TextAnalysis —
  // one definition keeps both modules' Spark and SQL sides in lockstep
  import TextAnalysis.{stopwords, words}

  private val banned = Seq("slow", "broken")

  private def inListSql(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ", ", ")")

  /** The Gopher rule metrics over a text column — one definition shared
    * by the batch query below and the streaming curate path
    * ([[graft.streaming.DocStream]]), so online and offline filtering can
    * never disagree. All narrow per-row expressions. */
  private[graft] final case class GopherCols(
      nWords: Column, meanWordLen: Column, stopFrac: Column,
      alphaFrac: Column, distinctFrac: Column) {
    def fWordCount: Column = nWords.between(50, 100000)
    def fMeanWordLen: Column = meanWordLen.between(3, 10)
    def fStopwords: Column = stopFrac >= 0.02
    def fAlpha: Column = alphaFrac >= 0.8
    def fDistinct: Column = distinctFrac >= 0.3
    def pass: Column = fWordCount && fMeanWordLen && fStopwords && fAlpha && fDistinct
  }

  private[graft] def gopher(text: Column): GopherCols = {
    val w = words(text)
    GopherCols(
      nWords = size(w).cast("long"),
      meanWordLen = length(regexp_replace(text, " ", "")) * 1.0 / size(w),
      stopFrac = size(filter(w, x => stopwords.map(v => x === v).reduce(_ || _)))
        .cast("long") * 1.0 / size(w),
      alphaFrac = size(filter(w, _.rlike("^[a-z]+$"))).cast("long") * 1.0 / size(w),
      distinctFrac = size(array_distinct(w)).cast("long") * 1.0 / size(w))
  }

  val all: Seq[GraftQuery] = Seq(
    // ---- Gopher quality rules: word-count bounds, mean word length
    // bounds, stop-word fraction, alphabetic-word fraction, distinct-word
    // fraction (repetition proxy). Fully map-side — the 100 TB shape is a
    // single pass that never shuffles.
    q("text_gopher_rules",
      s"""WITH m AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |    len(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')) AS mean_word_len,
         |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ${inListSql(stopwords)})) AS BIGINT)
         |      * 1.0 / len(string_split(text, ' ')) AS stop_frac,
         |    CAST(len(list_filter(string_split(text, ' '), w -> regexp_matches(w, '^[a-z]+$$'))) AS BIGINT)
         |      * 1.0 / len(string_split(text, ' ')) AS alpha_frac,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         |      * 1.0 / len(string_split(text, ' ')) AS distinct_frac
         |  FROM documents)
         |SELECT doc_id, lang, n_words, mean_word_len, stop_frac, alpha_frac, distinct_frac,
         |  CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS f_word_count,
         |  CAST(CASE WHEN mean_word_len BETWEEN 3 AND 10 THEN 1 ELSE 0 END AS BIGINT) AS f_mean_word_len,
         |  CAST(CASE WHEN stop_frac >= 0.02 THEN 1 ELSE 0 END AS BIGINT) AS f_stopwords,
         |  CAST(CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END AS BIGINT) AS f_alpha,
         |  CAST(CASE WHEN distinct_frac >= 0.3 THEN 1 ELSE 0 END AS BIGINT) AS f_distinct,
         |  CAST(CASE WHEN n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3 AND 10
         |            AND stop_frac >= 0.02 AND alpha_frac >= 0.8 AND distinct_frac >= 0.3
         |       THEN 1 ELSE 0 END AS BIGINT) AS pass_gopher
         |FROM m""".stripMargin) { (s, d) =>
      val g = gopher(col("text"))
      def flag(c: Column): Column = when(c, 1L).otherwise(0L)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          g.nWords.as("n_words"), g.meanWordLen.as("mean_word_len"),
          g.stopFrac.as("stop_frac"), g.alphaFrac.as("alpha_frac"),
          g.distinctFrac.as("distinct_frac"))
        .withColumn("f_word_count", flag(col("n_words").between(50, 100000)))
        .withColumn("f_mean_word_len", flag(col("mean_word_len").between(3, 10)))
        .withColumn("f_stopwords", flag(col("stop_frac") >= 0.02))
        .withColumn("f_alpha", flag(col("alpha_frac") >= 0.8))
        .withColumn("f_distinct", flag(col("distinct_frac") >= 0.3))
        .withColumn("pass_gopher", flag(
          col("n_words").between(50, 100000) && col("mean_word_len").between(3, 10) &&
            col("stop_frac") >= 0.02 && col("alpha_frac") >= 0.8 &&
            col("distinct_frac") >= 0.3))
    },

    // ---- C4-style policy: minimum length, bad-word list, keep only the
    // FIRST copy of an exact-duplicate text (C4 dedups at the span level;
    // with no line structure in this corpus the analogue is whole-text).
    // One shuffle, on md5(text) — identical shape to `dedup_exact`: the
    // exchange keys (and sorts) on a fixed-width 32-char digest, never on
    // full document bodies (KBs per row of shuffle key at 100 TB).
    q("text_c4_policy",
      s"""WITH m AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |    CAST(CASE WHEN len(list_filter(string_split(text, ' '),
         |        w -> w IN ${inListSql(banned)})) > 0 THEN 1 ELSE 0 END AS BIGINT) AS has_banned,
         |    CAST(row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS BIGINT) AS copy_rank,
         |    CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS n_copies
         |  FROM documents)
         |SELECT doc_id, source, n_words, has_banned, copy_rank, n_copies,
         |  CAST(CASE WHEN n_words >= 5 AND has_banned = 0 AND copy_rank = 1
         |       THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM m""".stripMargin) { (s, d) =>
      val w = words(col("text"))
      val byText = Window.partitionBy(md5(col("text")))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"),
          size(w).cast("long").as("n_words"),
          when(size(filter(w, x => banned.map(v => x === v).reduce(_ || _))) > 0, 1L)
            .otherwise(0L).as("has_banned"))
        .withColumn("copy_rank",
          row_number().over(byText.orderBy(col("doc_id"))).cast("long"))
        .withColumn("n_copies", count(lit(1)).over(byText).cast("long"))
        .withColumn("keep",
          when(col("n_words") >= 5 && col("has_banned") === 0 && col("copy_rank") === 1, 1L)
            .otherwise(0L))
        .drop("text")
    },

    // ---- token-length histogram: power-of-two buckets per language.
    // Bucket exponent via the binary-representation length (exact integer
    // arithmetic on both engines — no float log2 at bucket boundaries).
    q("text_length_histogram",
      """SELECT lang,
        |  CAST(length(bin(len(string_split(text, ' ')))) - 1 AS BIGINT) AS bucket_pow2,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words
        |FROM documents
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val nw = size(words(col("text")))
      Tables.documents(s, d)
        .groupBy(col("lang"),
          (length(bin(nw.cast("long"))) - 1).cast("long").as("bucket_pow2"))
        .agg(count(lit(1)).as("n_docs"),
          sum(nw.cast("long")).as("total_words"))
    },

    // ---- corpus-frequency top tokens: the classic distributed word
    // count, then a deterministic global top-20. At 100 TB this is one
    // map-side-combined hash aggregation on the token key followed by a
    // top-k over |vocab| rows — never a global sort of the corpus.
    q("text_top_tokens",
      """WITH counts AS (
        |  SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY 1),
        |ranked AS (
        |  SELECT token, n,
        |    CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank
        |  FROM counts)
        |SELECT token, n, rank FROM ranked WHERE rank <= 20""".stripMargin) { (s, d) =>
      Tables.documentsParallel(s, d)
        .select(explode(words(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        // tiny post-agg frame (|vocab| rows) — the single-partition window
        // ranks ~100s of rows, not the corpus. n % 1 ≡ 0 is a non-foldable
        // constant key: explicit single-task intent that survives constant
        // folding (a literal key is folded away → warned empty-spec path).
        .withColumn("rank",
          row_number().over(
            Window.partitionBy(pmod(col("n"), lit(1L)))
              .orderBy(col("n").desc, col("token"))).cast("long"))
        .filter(col("rank") <= 20)
    },

    // ---- normalization-canonical dedup: casefold, strip non-alphanumerics,
    // collapse whitespace, THEN keep-first — catches trivially-mutated
    // copies ("Hello, World!" vs "hello world") that exact-hash dedup
    // misses. Same shuffle shape as dedup_exact: ONE exchange keyed by the
    // fixed-width 60-bit hash of the normalized form (never the raw text).
    q("dedup_normalized", {
      val normSql = "trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
      s"""WITH t AS (
         |  SELECT doc_id, ${TextHash.h64Sql(normSql)} AS nh FROM documents)
         |SELECT doc_id,
         |  CAST(min(doc_id) OVER (PARTITION BY nh) AS BIGINT) AS keeper_doc_id,
         |  CAST(COUNT(*) OVER (PARTITION BY nh) AS BIGINT) AS group_size,
         |  CAST(CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY nh)
         |       THEN 1 ELSE 0 END AS BIGINT) AS is_duplicate
         |FROM t""".stripMargin
    }) { (s, d) =>
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      val w = Window.partitionBy(TextHash.h64(norm))
      Tables.documents(s, d).select(
        col("doc_id"),
        min(col("doc_id")).over(w).as("keeper_doc_id"),
        count(lit(1)).over(w).as("group_size"),
        when(col("doc_id") =!= min(col("doc_id")).over(w), 1L).otherwise(0L)
          .as("is_duplicate"))
    },

    // ---- CURATION FUNNEL: survival counts through the sequential gates a
    // real pipeline applies — raw → Gopher policy → keep-first exact dedup
    // (among survivors) → benchmark-decontaminated train split. One output
    // row per stage makes regressions visible at a glance (a policy change
    // that nukes half the corpus shows up as a cliff between rows). Each
    // stage reuses the SAME definitions as its standalone query (gopher
    // cols, md5 keep-first, %97 bench split + shingle overlap), so funnel
    // and per-stage queries can never disagree.
    q("curation_funnel",
      s"""WITH m AS (
         |  SELECT doc_id, text,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |    len(replace(text, ' ', '')) * 1.0 / len(string_split(text, ' ')) AS mwl,
         |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ${inListSql(stopwords)})) AS BIGINT)
         |      * 1.0 / len(string_split(text, ' ')) AS stopf,
         |    CAST(len(list_filter(string_split(text, ' '), w -> regexp_matches(w, '^[a-z]+$$'))) AS BIGINT)
         |      * 1.0 / len(string_split(text, ' ')) AS alphaf,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         |      * 1.0 / len(string_split(text, ' ')) AS distf
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, text FROM m
         |  WHERE n_words BETWEEN 50 AND 100000 AND mwl BETWEEN 3 AND 10
         |    AND stopf >= 0.02 AND alphaf >= 0.8 AND distf >= 0.3),
         |k AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM p)
         |  WHERE doc_id = keeper),
         |shs AS (${TextHash.shinglesSql()}),
         |sh AS (SELECT doc_id, ${TextHash.h64Sql("sh")} AS sh FROM shs),
         |bench AS (SELECT sh FROM sh WHERE doc_id % 97 = 0),
         |cont AS (
         |  SELECT DISTINCT t.doc_id FROM sh t JOIN bench b ON t.sh = b.sh
         |  WHERE t.doc_id % 97 <> 0),
         |clean AS (
         |  SELECT doc_id FROM k
         |  WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont))
         |SELECT CAST(1 AS BIGINT) AS stage, 'raw' AS stage_name,
         |  CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs
         |UNION ALL SELECT CAST(2 AS BIGINT), 'policy_pass',
         |  CAST((SELECT COUNT(*) FROM p) AS BIGINT)
         |UNION ALL SELECT CAST(3 AS BIGINT), 'dedup_keep_first',
         |  CAST((SELECT COUNT(*) FROM k) AS BIGINT)
         |UNION ALL SELECT CAST(4 AS BIGINT), 'decontaminated_train',
         |  CAST((SELECT COUNT(*) FROM clean) AS BIGINT)""".stripMargin) { (s, d) =>
      val docs = Tables.documentsParallel(s, d)
      val passing = docs.filter(gopher(col("text")).pass)
      val wKeep = Window.partitionBy(md5(col("text")))
      val kept = passing
        .withColumn("keeper", min(col("doc_id")).over(wKeep))
        .filter(col("doc_id") === col("keeper"))
        .select(col("doc_id"))
      val sh = docs.select(col("doc_id"),
        explode(TextHash.shingleHashArray(col("text"))).as("sh"))
      val bench = sh.filter(col("doc_id") % 97 === 0).select(col("sh")).distinct()
      val contaminated = sh.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), Seq("sh"))
        .select(col("doc_id")).distinct()
      val clean = kept.filter(col("doc_id") % 97 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
      def stageRow(i: Int, name: String, frame: org.apache.spark.sql.DataFrame) =
        frame.agg(count(lit(1)).as("n_docs"))
          .select(lit(i.toLong).as("stage"), lit(name).as("stage_name"), col("n_docs"))
      stageRow(1, "raw", docs)
        .unionByName(stageRow(2, "policy_pass", passing))
        .unionByName(stageRow(3, "dedup_keep_first", kept))
        .unionByName(stageRow(4, "decontaminated_train", clean))
    },

    // ---- MODEL-BASED quality filter TRAINED IN-ENGINE: a nearest-
    // centroid (Rocchio 1971; Han & Karypis, PKDD 2000) linear text
    // classifier over fixed-point per-doc features, learning the
    // Gopher-style keep rule from its own corpus — the classic
    // "train a quality scorer on your heuristic labels, then apply it"
    // curation step, with BOTH phases inside the engine. Everything is
    // exact BIGINT, so both engines land on bit-identical weights:
    //  - features are ppm/milli-scaled count ratios (the rule's own
    //    decision variables), bounded ≤ 1e6 per component;
    //  - the direction is the integer class-mean difference
    //    d_j = ⌊Σ⁺f_j/n⁺⌋ − ⌊Σ⁻f_j/n⁻⌋ (each term nonnegative, so
    //    DuckDB // ≡ Spark div), bounded ≤ 1e6 INDEPENDENT OF CORPUS
    //    SIZE — projections stay ≤ 5e12 at any row count, which is the
    //    100 TB overflow story a raw n⁻Σ⁺−n⁺Σ⁻ direction (O(n²)) lacks;
    //  - the decision threshold is the EXACT empirical-risk minimizer
    //    over the projection (the optimal 1-D split, i.e. a decision
    //    stump on the centroid direction), found by counting
    //    per-projection-value class totals and prefix-summing them.
    // An iterative batch perceptron was measured first and rejected: the
    // conjunctive target is non-separable, so the full-batch update
    // oscillates between near-degenerate states (train acc 0.49-0.51 at
    // two of three SFs vs 0.90-0.93 here, consistent at every SF).
    // Scale shape: one map-side-combinable aggregate for the class sums;
    // one narrow scan against the broadcast 1-row direction for the
    // projections; the threshold scan is the repo's banded two-level
    // prefix-sum idiom — per-band windows partition freely and the
    // band-total rollup is ≤ 4097 rows BY CONSTRUCTION (value-range
    // bands), so no corpus-sized single-task window exists; the argmin
    // is a distributed TakeOrderedAndProject.
    q("quality_classifier_centroid",
      s"""WITH $classifierSqlCtes
         |SELECT w.n AS n_docs, w.np AS n_pos,
         |  CAST(w.d1 AS BIGINT) AS w_words, CAST(w.d2 AS BIGINT) AS w_mwl,
         |  CAST(w.d3 AS BIGINT) AS w_stop, CAST(w.d4 AS BIGINT) AS w_alpha,
         |  CAST(w.d5 AS BIGINT) AS w_distinct,
         |  CAST(best.t AS BIGINT) AS threshold, CAST(best.errs AS BIGINT) AS n_errors,
         |  CAST(best.errs * 1000000 // w.n AS BIGINT) AS error_ppm
         |FROM w CROSS JOIN best""".stripMargin) { (s, d) =>
      val f = classifierFeatures(s, d).localCheckpoint(eager = false)
      val (w, best) = classifierTrain(f)
      w.crossJoin(broadcast(best))
        .select(col("n").as("n_docs"), col("np").as("n_pos"),
          col("d1").as("w_words"), col("d2").as("w_mwl"),
          col("d3").as("w_stop"), col("d4").as("w_alpha"),
          col("d5").as("w_distinct"),
          col("t").as("threshold"), col("errs").as("n_errors"),
          expr("errs * 1000000L div n").as("error_ppm"))
    },

    // ---- The trained filter APPLIED per document: project every doc on
    // the learned direction and emit prediction vs rule label — the frame
    // a curation pipeline joins against to route docs, plus the agreement
    // evidence for how well the linear model captures the conjunctive
    // rule (0.90-0.93 train accuracy, vs 0.48-0.52 majority class). One
    // corpus scan against two broadcast 1-row frames after training;
    // per-row work is a 5-term dot product and a compare.
    q("quality_classifier_apply", classifierApplySql) { (s, d) =>
      val f = classifierFeatures(s, d).localCheckpoint(eager = false)
      val (w, best) = classifierTrain(f)
      classifierScore(f, w.crossJoin(broadcast(best)))
    },

    // ---- The trained filter applied from PERSISTED weights — the
    // sim_ivfpq_probe_topk amortized-offline doctrine applied to the
    // classifier (r8 trained per invocation; doctrinally inconsistent):
    // training runs ONCE per (JVM, dataset) and lands the 1-row
    // weights+threshold as parquet; the registered query LOADS that row
    // (broadcast) and only scores — the apply-time cost a 100 TB curation
    // pass actually pays (train offline on a sample, score the corpus
    // with a 5-term integer dot product per row). Same oracle head as
    // quality_classifier_apply: the hash gate proves the persisted
    // weights reproduce the inline-trained decision bit-exactly.
    q("quality_classifier_probe", classifierApplySql) { (s, d) =>
      val wts = broadcast(s.read.parquet(classifierWeightsDir(s, d)))
      classifierScore(classifierFeatures(s, d), wts)
    }
  )

  // ---- nearest-centroid classifier building blocks (shared by the
  // train + apply queries and their oracles; feature order: capped word
  // count, mean word length, stopword ppm, alpha ppm, distinct ppm) ----

  /** d·f with the direction and feature columns in one flat frame. */
  private def classifierProj: Column =
    (1 to 5).map(j => col(s"d$j") * col(s"f$j")).reduce(_ + _)

  /** Shared apply/probe oracle: project on the trained direction, emit
    * prediction vs rule label + agreement. */
  private lazy val classifierApplySql: String =
    s"""WITH $classifierSqlCtes
       |SELECT f.doc_id, CAST(f.y AS BIGINT) AS y_rule,
       |  CAST(CASE WHEN ${classifierProjSql} > best.t THEN 1 ELSE -1 END AS BIGINT)
       |    AS y_pred,
       |  CAST(CASE WHEN f.y * (CASE WHEN ${classifierProjSql} > best.t
       |    THEN 1 ELSE -1 END) > 0 THEN 1 ELSE 0 END AS BIGINT) AS agree
       |FROM f CROSS JOIN w CROSS JOIN best""".stripMargin

  /** Score a feature frame against a 1-row weights frame (columns
    * d1..d5 + t): per-row work is a 5-term integer dot product and a
    * compare — the whole apply path. The broadcast hint lives HERE (on
    * the frame that crosses the corpus) so a composed weights frame
    * cannot silently degrade to a shuffle cartesian — a hint on an input
    * of a join does not survive the join's own plan node. */
  private def classifierScore(f: org.apache.spark.sql.DataFrame,
      weights: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val pred = when(classifierProj > col("t"), 1L).otherwise(-1L)
    f.crossJoin(broadcast(weights))
      .select(col("doc_id"), col("y").as("y_rule"), pred.as("y_pred"),
        when(col("y") * pred > 0, 1L).otherwise(0L).as("agree"))
  }

  /** Per-JVM scratch root for persisted classifier weights — unique per
    * process so concurrent JVMs never race, removed at JVM exit. */
  private lazy val classifierRoot: String =
    s"${sys.props("java.io.tmpdir")}/graft_qcls/${java.util.UUID.randomUUID()}"
  private val classifierBuilt = scala.collection.mutable.Map.empty[String, String]

  /** Train-once-per-(JVM, dataset): run [[classifierTrain]] and persist
    * the single (weights ⨯ threshold) row as parquet; later calls load
    * it untouched — the offline-training artifact the probe query reads. */
  private def classifierWeightsDir(s: org.apache.spark.sql.SparkSession,
      d: String): String =
    classifierBuilt.synchronized {
      classifierBuilt.getOrElseUpdate(d, {
        val dir = s"$classifierRoot/${new java.io.File(d).getName}/weights"
        val path = new org.apache.hadoop.fs.Path(dir)
        path.getFileSystem(s.sparkContext.hadoopConfiguration).deleteOnExit(path)
        val f = classifierFeatures(s, d).localCheckpoint(eager = false)
        val (w, best) = classifierTrain(f)
        w.crossJoin(broadcast(best)).coalesce(1)
          .write.mode("overwrite").parquet(dir)
        dir
      })
    }

  private lazy val classifierProjSql: String =
    (1 to 5).map(j => s"w.d$j * f.f$j").mkString(" + ")

  /** Fixed-point integer features + integer rule label. f1 capped word
    * count (milli), f2 mean word length (milli), f3 stopword ppm, f4
    * alpha ppm, f5 distinct-word ppm — the rule's own decision variables
    * on a common ~1e6 scale (raw counts span 4 orders of magnitude and
    * drown the ratio features); every floor division has nonnegative
    * operands, so DuckDB // and Spark div agree. The label is the
    * Gopher-style conjunction with every fraction threshold
    * cross-multiplied into BIGINT form (stop ≥ 1/50, alpha ≥ 4/5,
    * distinct ≥ 3/10 of words) — measured ~50% positive on this corpus. */
  private def classifierFeatures(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val w = words(col("text"))
    Tables.documentsParallel(s, d).select(
      col("doc_id"),
      size(w).cast("long").as("x1"),
      length(col("text")).cast("long").as("x2"),
      size(filter(w, x => stopwords.map(v => x === v).reduce(_ || _)))
        .cast("long").as("x3"),
      size(filter(w, _.rlike("^[a-z]+$"))).cast("long").as("x4"),
      size(array_distinct(w)).cast("long").as("x5"))
      .select(col("doc_id"),
        (least(col("x1"), lit(1000L)) * 1000L).as("f1"),
        expr("x2 * 1000L div x1").as("f2"),
        expr("x3 * 1000000L div x1").as("f3"),
        expr("x4 * 1000000L div x1").as("f4"),
        expr("x5 * 1000000L div x1").as("f5"),
        when(col("x1").between(50L, 100000L) &&
          col("x3") * 50 >= col("x1") && col("x4") * 5 >= col("x1") * 4 &&
          col("x5") * 10 >= col("x1") * 3, 1L).otherwise(-1L).as("y"))
  }

  private lazy val classifierFeatureSql: String =
    s"""f0 AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
       |    CAST(len(text) AS BIGINT) AS x2,
       |    CAST(len(list_filter(string_split(text, ' '), w -> w IN ${inListSql(stopwords)})) AS BIGINT) AS x3,
       |    CAST(len(list_filter(string_split(text, ' '), w -> regexp_matches(w, '^[a-z]+$$'))) AS BIGINT) AS x4,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS x5
       |  FROM documents),
       |f AS (SELECT doc_id,
       |  LEAST(x1, 1000) * 1000 AS f1, x2 * 1000 // x1 AS f2,
       |  x3 * 1000000 // x1 AS f3, x4 * 1000000 // x1 AS f4,
       |  x5 * 1000000 // x1 AS f5,
       |  CASE WHEN x1 BETWEEN 50 AND 100000 AND x3 * 50 >= x1
       |    AND x4 * 5 >= x1 * 4 AND x5 * 10 >= x1 * 3 THEN 1 ELSE -1 END AS y
       |  FROM f0)""".stripMargin

  /** The training CTE chain: class sums → integer-mean direction →
    * projections → banded prefix-sum threshold scan → argmin. The
    * sentinel row (t = lo − 1, errs = n⁻) is the predict-everything-
    * positive candidate the scan's "threshold = some projection value"
    * form cannot express. */
  private lazy val classifierSqlCtes: String = {
    val sp = (1 to 5).map(j => s"CAST(SUM(CASE WHEN y = 1 THEN f$j ELSE 0 END) AS BIGINT) AS sp$j").mkString(",\n  ")
    val sn = (1 to 5).map(j => s"CAST(SUM(CASE WHEN y = -1 THEN f$j ELSE 0 END) AS BIGINT) AS sn$j").mkString(",\n  ")
    val dj = (1 to 5).map(j => s"sp$j // np - sn$j // (n - np) AS d$j").mkString(", ")
    s"""$classifierFeatureSql,
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS np,
       |  $sp,
       |  $sn
       |  FROM f),
       |w AS (SELECT n, np, n - np AS nn, $dj FROM st),
       |p AS (SELECT f.y, $classifierProjSql AS proj FROM f CROSS JOIN w),
       |bounds AS (SELECT MIN(proj) AS lo, MAX(proj) AS hi FROM p),
       |pv AS (SELECT proj,
       |  CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
       |  CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS cn
       |  FROM p GROUP BY proj),
       |pb AS (SELECT proj, cp, cn,
       |  (proj - b.lo) // ((b.hi - b.lo) // 4096 + 1) AS band
       |  FROM pv, bounds b),
       |l1 AS (SELECT proj, band,
       |  SUM(cp) OVER (PARTITION BY band ORDER BY proj
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wcp,
       |  SUM(cn) OVER (PARTITION BY band ORDER BY proj
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wcn
       |  FROM pb),
       |bt AS (SELECT band, SUM(cp) AS tcp, SUM(cn) AS tcn FROM pb GROUP BY band),
       |bo AS (SELECT band,
       |  COALESCE(SUM(tcp) OVER (ORDER BY band
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ocp,
       |  COALESCE(SUM(tcn) OVER (ORDER BY band
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ocn
       |  FROM bt),
       |cand AS (
       |  SELECT l1.proj AS t, (bo.ocp + l1.wcp) + (w.nn - (bo.ocn + l1.wcn)) AS errs
       |  FROM l1 JOIN bo USING (band) CROSS JOIN w
       |  UNION ALL SELECT b.lo - 1, w.nn FROM bounds b CROSS JOIN w),
       |best AS (SELECT t, errs FROM cand ORDER BY errs, t LIMIT 1)""".stripMargin
  }

  /** Train on a feature frame: returns (direction row `w`: n/np/nn/d1-d5,
    * argmin row `best`: threshold t + its training error count). Spark
    * twin of [[classifierSqlCtes]]; the band-offset window's
    * `pmod(band, 1)` key is the repo's bounded-single-task idiom — the
    * band-total frame is ≤ 4097 rows by construction. */
  private def classifierTrain(f: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val stAggs: Seq[Column] =
      sum(when(col("y") === 1L, 1L).otherwise(0L)).as("np") +:
        ((1 to 5).map(j => sum(when(col("y") === 1L, col(s"f$j")).otherwise(0L)).as(s"sp$j")) ++
          (1 to 5).map(j => sum(when(col("y") === -1L, col(s"f$j")).otherwise(0L)).as(s"sn$j")))
    val st = f.agg(count(lit(1)).as("n"), stAggs: _*)
    val w = st.select(col("n") +: col("np") +: (col("n") - col("np")).as("nn") +:
      (1 to 5).map(j => expr(s"sp$j div np - sn$j div (n - np)").as(s"d$j")): _*)
    val p = f.crossJoin(broadcast(w)).select(col("y"), classifierProj.as("proj"))
    val bounds = p.agg(min(col("proj")).as("lo"), max(col("proj")).as("hi"))
    val pv = p.groupBy(col("proj")).agg(
      sum(when(col("y") === 1L, 1L).otherwise(0L)).as("cp"),
      sum(when(col("y") === -1L, 1L).otherwise(0L)).as("cn"))
    val pb = pv.crossJoin(broadcast(bounds))
      .withColumn("band", expr("(proj - lo) div ((hi - lo) div 4096 + 1)"))
    val inBand = Window.partitionBy(col("band")).orderBy(col("proj"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val l1 = pb
      .withColumn("wcp", sum(col("cp")).over(inBand))
      .withColumn("wcn", sum(col("cn")).over(inBand))
      .select(col("proj"), col("band"), col("wcp"), col("wcn"))
    val bt = pb.groupBy(col("band"))
      .agg(sum(col("cp")).as("tcp"), sum(col("cn")).as("tcn"))
    val overBands = Window.partitionBy(pmod(col("band"), lit(1L)))
      .orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bo = bt.select(col("band"),
      coalesce(sum(col("tcp")).over(overBands), lit(0L)).as("ocp"),
      coalesce(sum(col("tcn")).over(overBands), lit(0L)).as("ocn"))
    val nn1 = w.select(col("nn"))
    val cand = l1.join(bo, Seq("band")).crossJoin(broadcast(nn1))
      .select(col("proj").as("t"),
        (col("ocp") + col("wcp") + (col("nn") - (col("ocn") + col("wcn")))).as("errs"))
      .unionByName(bounds.crossJoin(broadcast(nn1))
        .select((col("lo") - 1L).as("t"), col("nn").as("errs")))
    val best = cand.orderBy(col("errs"), col("t")).limit(1)
    (w, best)
  }
}
