package graft.llm

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-relative SIGNAL operators for training-data curation: term
  * weighting (TF-IDF), target-domain importance weighting (DSIR,
  * Xie et al. 2023, arXiv:2302.03169 re-expressed), out-of-vocabulary
  * rates against a corpus-derived vocabulary, and per-language length
  * deciles. These differ from [[TextAnalysis]] (per-document features) and
  * [[TextPolicy]] (fixed published rules): every signal here is *relative
  * to corpus statistics*, so each operator is a two-phase shape — a
  * corpus-level aggregate that is orders of magnitude smaller than the
  * corpus, broadcast (or token-key joined) back onto the documents.
  *
  * Determinism doctrine: all scores are scaled BIGINT with floor division
  * (never floats), so results are bit-identical on any engine and any
  * partitioning, and every query is DuckDB-oracle-checkable end to end.
  */
object CorpusSignals {

  /** TF-IDF idf scale: idf_scaled(t) = (N_docs * 1e6) div df(t). */
  private val IdfScale = 1000000L

  /** DSIR hashed-feature bucket count. 512 buckets ⇒ the per-bucket
    * weight table is ~512 rows regardless of corpus size — it always
    * broadcasts; the corpus itself never joins anything its own size. */
  private val DsirBuckets = 512L

  /** DSIR weight scale (per-bucket target/corpus ratio in millionths). */
  private val DsirScale = 1000000L

  /** Fully-unrolled BPE learn+apply rounds for `bpe_tokenize`. */
  private val BpeRounds = 6
  /** Co-occurrence lift: vocabulary head size (broadcast; bounds the
    * per-doc pair fan-out at K²) and minimum pair doc count. */
  private val LiftVocabK = 40
  private val LiftMinSupport = 5

  /** Oracle CTE chain `wf, t0 … t$BpeRounds` learning and applying the
    * [[BpeRounds]] merge rules on the word-frequency table — shared by
    * `bpe_tokenize` (per-round merge statistics) and
    * `bpe_compression_rate` (per-doc tokens under the final vocab). */
  private def bpeLearnCtes: String = {
    val sb = new StringBuilder(
      """WITH wf AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS f
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY w),
        |t0 AS (SELECT w, f,
        |  list_transform(generate_series(1, len(w)), i -> substr(w, i, 1)) AS t
        |  FROM wf)""".stripMargin)
    for (r <- 1 to BpeRounds) {
      sb.append(s""",
         |p$r AS (
         |  SELECT t[i] AS pa, t[i+1] AS pb, CAST(SUM(f) AS BIGINT) AS n
         |  FROM (SELECT f, t, unnest(generate_series(1, len(t)-1)) AS i
         |        FROM t${r - 1} WHERE len(t) >= 2)
         |  GROUP BY 1, 2),
         |m$r AS (SELECT pa, pb, n FROM p$r ORDER BY n DESC, pa, pb LIMIT 1),
         |t$r AS (
         |  SELECT w, f, string_split(list_reduce(t, (acc, x) ->
         |    CASE WHEN x = m$r.pb AND (acc = m$r.pa OR ends_with(acc, chr(31) || m$r.pa))
         |         THEN acc || x ELSE acc || chr(31) || x END), chr(31)) AS t
         |  FROM t${r - 1}, m$r)""".stripMargin)
    }
    sb.toString
  }

  /** Driver-regime bound for the BPE learn loop (r15, guide §1.2-1):
    * classic BPE folds over the word-FREQUENCY table — vocab-sized, not
    * corpus-sized — so below this word count the collected (w, f) rows
    * run the merge rounds locally ([[BpeDriver.learn]]) instead of
    * `rounds × (pair-agg + limit-1 + fold + eager checkpoint)` sequential
    * stage barriers. 1 M vocab rows ≈ tens of MB, the broadcast
    * small-side budget (the Dedup.DriverCcEdges doctrine). */
  private[llm] val DriverBpeVocab = 1000000L

  /** The shared word-frequency aggregate (the one corpus-wide pass). */
  private def wfFrame(s: SparkSession, d: String): DataFrame =
    Tables.documentsParallel(s, d)
      .select(explode(TextAnalysis.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("f"))

  /** Collected (w, f) when the vocabulary is provably small; None above
    * the bound (or for an empty corpus — the distributed loop owns the
    * degenerate shapes). */
  private def wfCollected(s: SparkSession, d: String): Option[Array[(String, Long)]] = {
    val wf = wfFrame(s, d).localCheckpoint(eager = false)
    val n = wf.count()
    if (n == 0 || n > DriverBpeVocab) None
    else Some(wf.collect().map(r => (r.getString(0), r.getLong(1))))
  }

  /** The final BPE word→tokens frame (w, f, t) after [[BpeRounds]] learned
    * merges — driver regime below [[DriverBpeVocab]], else the
    * distributed fold loop. */
  private def bpeLearnedToks(s: SparkSession, d: String): DataFrame =
    wfCollected(s, d) match {
      case Some(wf) =>
        import s.implicits._
        s.createDataset(BpeDriver.learn(wf, BpeRounds).toks).toDF("w", "f", "t")
      case None => bpeLearnedToksDistributed(s, d)
    }

  /** The distributed BPE learn loop (unchanged; BpeDriverRegimeSpec pins
    * it value-identical to [[BpeDriver.learn]]). */
  private[llm] def bpeLearnedToksDistributed(s: SparkSession, d: String): DataFrame = {
    val wf = wfFrame(s, d)
    var toks = wf
      .withColumn("t", expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .localCheckpoint()
    for (_ <- 1 to BpeRounds) {
      val m = toks.filter(size(col("t")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS pa, t[i] AS pb))")).as("pr"))
        .groupBy(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
        .agg(sum(col("f")).as("n"))
        .orderBy(col("n").desc, col("pa"), col("pb"))
        .limit(1)
        .localCheckpoint()
      toks = toks
        .crossJoin(broadcast(m.select(col("pa").as("ma"), col("pb").as("mb"))))
        .withColumn("t", expr(
          """split(aggregate(t, CAST(NULL AS STRING), (acc, x) ->
            |  CASE WHEN acc IS NULL THEN x
            |       WHEN x = mb AND (acc = ma OR endswith(acc, chr(31) || ma))
            |       THEN acc || x ELSE acc || chr(31) || x END), chr(31))""".stripMargin))
        .drop("ma", "mb")
        .localCheckpoint()
    }
    toks
  }

  /** The distributed per-round BPE learn for `bpe_tokenize` (unchanged
    * loop; the regime spec pins it value-identical to
    * [[BpeDriver.learn]]'s merge rows). */
  private[llm] def bpeTokenizeDistributed(s: SparkSession, d: String): DataFrame = {
    val wf = wfFrame(s, d)
    var toks = wf
      .withColumn("t", expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .localCheckpoint()
    val rounds = (1 to BpeRounds).map { r =>
      val m = toks.filter(size(col("t")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS pa, t[i] AS pb))")).as("pr"))
        .groupBy(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
        .agg(sum(col("f")).as("n"))
        .orderBy(col("n").desc, col("pa"), col("pb"))
        .limit(1)
        .localCheckpoint()
      toks = toks
        .crossJoin(broadcast(m.select(col("pa").as("ma"), col("pb").as("mb"))))
        .withColumn("t", expr(
          """split(aggregate(t, CAST(NULL AS STRING), (acc, x) ->
            |  CASE WHEN acc IS NULL THEN x
            |       WHEN x = mb AND (acc = ma OR endswith(acc, chr(31) || ma))
            |       THEN acc || x ELSE acc || chr(31) || x END), chr(31))""".stripMargin))
        .drop("ma", "mb")
        .localCheckpoint()
      val after = toks.agg(sum(col("f") * size(col("t"))).as("corpus_tokens_after"))
      m.select(lit(r).cast("long").as("round"), col("pa").as("a"),
          col("pb").as("b"), col("n").as("pair_n"))
        .crossJoin(broadcast(after))
    }
    rounds.reduce(_ union _)
  }

  /** Keep threshold for [[DsirScale]]-scaled per-token scores: a document
    * whose average token weight exceeds the *overall* target share is
    * "more target-like than the corpus average". The overall share is
    * data-derived (target tokens vs corpus tokens), not a magic constant. */

  val all: Seq[GraftQuery] = Seq(
    // ---- per-document top terms by integer TF-IDF. Shape: one hash agg
    // on (doc_id, token) [the only corpus-sized shuffle], a re-agg of THAT
    // frame on token for document frequencies (map-side combinable), a
    // token-keyed join back, then a per-doc window for top-3. N_docs rides
    // in via a broadcast 1-row aggregate, never a collect.
    q("text_tfidf_top_terms",
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
         |tf AS (
         |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
         |df AS (
         |  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.token, tf.tf,
         |    tf.tf * ((n.n_docs * $IdfScale) // df.df) AS score
         |  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
         |ranked AS (
         |  SELECT doc_id, token, tf, CAST(score AS BIGINT) AS score,
         |    CAST(row_number() OVER (
         |      PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT doc_id, token, tf, score, rank FROM ranked WHERE rank <= 3""".stripMargin) {
      (s, d) =>
      val docs = Tables.documentsParallel(s, d)
      // localCheckpoint (r15): tf feeds the df re-agg AND the score join —
      // un-cached, the tokenize + (doc, token) agg ran twice
      val tf = docs
        .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
        .localCheckpoint(eager = false)
      val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val wDoc = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("token"))
      tf.join(dfreq, "token")
        .crossJoin(broadcast(nDocs))
        .withColumn("score",
          col("tf") * expr(s"(n_docs * $IdfScale) div df"))
        .withColumn("rank", row_number().over(wDoc).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("token"), col("tf"), col("score"), col("rank"))
    },

    // ---- DSIR-style target-domain importance weights (Xie et al. 2023):
    // hashed n-gram (here unigram) features, per-bucket weight =
    // target-frequency / corpus-frequency, document score = weighted mean
    // token weight. The published method samples with probability ∝
    // exp(score); the deterministic engine twin emits the exact scaled
    // scores plus a keep flag against the corpus-average target share, so
    // the selection step is reproducible on any engine. Shape: one
    // corpus-sized agg on (doc_id, bucket); bucket stats re-agg to ≤512
    // rows → broadcast back; final per-doc agg. The corpus NEVER joins
    // anything corpus-sized — this is exactly why DSIR scales where
    // classifier-based selection doesn't.
    q("dsir_importance",
      s"""WITH tok AS (
         |  SELECT doc_id, lang,
         |    ${TextHash.h64Sql("unnest(string_split(text, ' '))")} % $DsirBuckets AS b
         |  FROM documents),
         |docb AS (
         |  SELECT doc_id, lang, b, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1, 2, 3),
         |bw AS (
         |  SELECT b, SUM(n) AS cn,
         |    SUM(CASE WHEN lang = 'en' THEN n ELSE 0 END) AS tn
         |  FROM docb GROUP BY 1),
         |tot AS (
         |  SELECT (SUM(tn) * $DsirScale) // SUM(cn) AS avg_w FROM bw),
         |scored AS (
         |  SELECT d.doc_id, d.lang,
         |    CAST(SUM(d.n) AS BIGINT) AS n_tokens,
         |    CAST(SUM(d.n * ((b.tn * $DsirScale) // b.cn)) AS BIGINT) AS score
         |  FROM docb d JOIN bw b ON d.b = b.b
         |  GROUP BY 1, 2)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(score // n_tokens AS BIGINT) AS score_per_token,
         |  CAST(CASE WHEN score // n_tokens >= (SELECT avg_w FROM tot)
         |       THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM scored""".stripMargin) { (s, d) =>
      // localCheckpoint (r15): docb feeds the bucket re-agg AND the score
      // join — un-cached, the tokenize + md5-bucket + agg pass ran twice
      val docb = Tables.documentsParallel(s, d)
        .select(col("doc_id"), col("lang"),
          explode(TextAnalysis.words(col("text"))).as("token"))
        .withColumn("b", TextHash.h64(col("token")) % DsirBuckets)
        .groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(eager = false)
      val bw = docb.groupBy(col("b"))
        .agg(sum(col("n")).as("cn"),
          sum(when(col("lang") === "en", col("n")).otherwise(0L)).as("tn"))
        .withColumn("w", expr(s"(tn * $DsirScale) div cn"))
      val avgW = bw.agg(expr(s"(sum(tn) * $DsirScale) div sum(cn)").as("avg_w"))
      docb.join(broadcast(bw.select(col("b"), col("w"))), "b")
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("n")).as("n_tokens"),
          sum(col("n") * col("w")).as("score"))
        .crossJoin(broadcast(avgW))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          expr("score div n_tokens").as("score_per_token"),
          when(expr("score div n_tokens") >= col("avg_w"), 1L).otherwise(0L)
            .as("keep"))
    },

    // ---- out-of-vocabulary rate against a corpus-derived vocabulary
    // (tokens seen in at least n_docs/25 documents — a relative threshold
    // so the same query is meaningful at every scale factor). Shape: the
    // (doc,token) agg reused for tf and df; the over-threshold vocab is a
    // small frame (broadcast); OOV mass re-aggregates per document. At
    // 100 TB the vocab stays bounded by the threshold (rare tokens are
    // exactly the ones dropped), so the broadcast never grows unbounded.
    q("text_oov_rate",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (
        |  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        |vocab AS (
        |  SELECT token FROM tf GROUP BY 1
        |  HAVING CAST(COUNT(*) AS BIGINT) >= greatest((SELECT n_docs FROM n) // 25, 1)),
        |perdoc AS (
        |  SELECT tf.doc_id,
        |    CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
        |    CAST(SUM(CASE WHEN v.token IS NULL THEN tf.tf ELSE 0 END) AS BIGINT) AS oov_tokens
        |  FROM tf LEFT JOIN vocab v ON tf.token = v.token
        |  GROUP BY 1)
        |SELECT doc_id, n_tokens, oov_tokens,
        |  CAST((oov_tokens * 1000) // n_tokens AS BIGINT) AS oov_permille
        |FROM perdoc""".stripMargin) { (s, d) =>
      val docs = Tables.documentsParallel(s, d)
      // localCheckpoint (r15): tf feeds the vocab re-agg AND the OOV join
      val tf = docs
        .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
        .localCheckpoint(eager = false)
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val vocab = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .filter(col("df") >= greatest(expr("n_docs div 25"), lit(1L)))
        .select(col("token"), lit(1L).as("in_vocab"))
      tf.join(broadcast(vocab), Seq("token"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_tokens"),
          sum(when(col("in_vocab").isNull, col("tf")).otherwise(0L)).as("oov_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("oov_tokens"),
          expr("(oov_tokens * 1000) div n_tokens").as("oov_permille"))
    },

    // ---- bigram typicality: score each document by the corpus-average
    // conditional probability of its word transitions — the fixed-point
    // integer re-expression of n-gram-LM perplexity scoring (the classic
    // cheap fluency gate before a neural quality model). p(w2|w1) is
    // (c2 * 1e9) div c1 in parts-per-billion; a doc's score is the
    // tf-weighted mean over its transitions. Shape: one corpus-sized agg
    // on (doc, w1, w2); the global bigram/left-marginal tables re-agg
    // from that frame (map-side combinable, ≪ corpus) and join back on
    // the bigram key; final per-doc agg. No float anywhere ⇒ bit-stable.
    q("text_bigram_typicality",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |p AS (
        |  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w)),
        |dp AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf FROM p GROUP BY 1, 2, 3),
        |c2 AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS c2 FROM dp GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        |scored AS (
        |  SELECT dp.doc_id,
        |    CAST(SUM(dp.tf) AS BIGINT) AS n_pairs,
        |    CAST(SUM(dp.tf * ((c2.c2 * 1000000000) // c1.c1)) AS BIGINT) AS s
        |  FROM dp JOIN c2 ON dp.w1 = c2.w1 AND dp.w2 = c2.w2
        |  JOIN c1 ON dp.w1 = c1.w1
        |  GROUP BY 1)
        |SELECT doc_id, n_pairs, CAST(s // n_pairs AS BIGINT) AS typicality_ppb
        |FROM scored""".stripMargin) { (s, d) =>
      val dp = Tables.documentsParallel(s, d)
        .select(col("doc_id"), TextAnalysis.words(col("text")).as("ws"))
        // single-word docs have no transitions — and must not reach the
        // transform: sequence(1, 0) steps DOWN to [1, 0], so ws[1] would be
        // out of bounds (an ANSI INVALID_ARRAY_INDEX failure). The oracle's
        // generate_series(1, 0) is empty, so the filter matches it exactly.
        .filter(size(col("ws")) >= 2)
        .select(col("doc_id"),
          explode(expr(
            "transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS w1, ws[i] AS w2))"))
            .as("pr"))
        .select(col("doc_id"), col("pr.w1"), col("pr.w2"))
        .groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("tf"))
        // localCheckpoint (r15): dp feeds c2 AND the scoring join — the
        // profiled plan tokenized + bigram-aggregated the corpus twice
        // (two identical 4.9 MB exchanges, ~11 cpu-s of a 1.6 s query);
        // the ~5 MB (doc, w1, w2, tf) frame is cached once instead
        .localCheckpoint(eager = false)
      val c2 = dp.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("c2"))
      val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
      dp.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_pairs"),
          sum(col("tf") * expr("(c2 * 1000000000) div c1")).as("s"))
        .select(col("doc_id"), col("n_pairs"),
          expr("s div n_pairs").as("typicality_ppb"))
    },

    // ---- token co-occurrence LIFT (the PMI family's exact-integer
    // member: lift = P(a,b)/(P(a)P(b)) = n_both·N / (n_a·n_b), here ×1e6
    // floor-divided — PMI is just its log, so the RANKING is identical
    // and no transcendental enters the hash). The collocation-mining /
    // phrase-vocabulary step of corpus prep. Shape: postings are DISTINCT
    // (doc, term) pairs restricted to the top-[[LiftVocabK]] vocabulary
    // BY DOC FREQUENCY — the vocab table is a TakeOrderedAndProject head
    // that BROADCASTS into the posting filter, so the pair self-join
    // fans out ≤ min(doclen, K)² per doc key and the only corpus-wide
    // exchange is the final pair count (map-side combinable). N and the
    // per-term doc counts ride the same broadcast vocab row set; a
    // min-support gate kills the noise tail before ranking.
    q("text_pair_lift", {
      s"""WITH post AS (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |dfreq AS (
         |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY 1),
         |vocab AS (
         |  SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT $LiftVocabK),
         |p AS (SELECT post.doc_id, post.term, v.df
         |      FROM post JOIN vocab v ON v.term = post.term),
         |pairs AS (
         |  SELECT a.term AS term_a, b.term AS term_b,
         |    CAST(COUNT(*) AS BIGINT) AS n_both,
         |    MIN(a.df) AS df_a, MIN(b.df) AS df_b
         |  FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.term < b.term
         |  GROUP BY 1, 2)
         |SELECT term_a, term_b, n_both,
         |  CAST((n_both * (SELECT n FROM n) * 1000000) // (df_a * df_b) AS BIGINT)
         |    AS lift_ppm
         |FROM pairs WHERE n_both >= $LiftMinSupport
         |ORDER BY lift_ppm DESC, term_a, term_b LIMIT 25""".stripMargin
    }) { (s, d) =>
      val docs = Tables.documentsParallel(s, d)
      val nRow = broadcast(docs.agg(count(lit(1)).as("n")))
      val post = docs
        .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("term"))
        .distinct()
        // consumed twice (df aggregate + the pair pass) — truncate the
        // explode+distinct lineage instead of recomputing it
        .localCheckpoint(eager = false)
      val vocab = broadcast(
        post.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .orderBy(col("df").desc, col("term"))
          .limit(LiftVocabK))
      // pair generation via the doc-keyed posting self-join: both legs
      // are the same checkpointed frame co-partitioned on doc_id, and the
      // whole-stage-codegen'd join beats the collect_list + array-HOF
      // expansion variant by ~1.7× here (ObjectHashAggregate + interpreted
      // lambda structs lose to codegen — measured, BenchOne ×4)
      val p = post.join(vocab, "term")
      p.as("a")
        .join(p.as("b"),
          col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
        .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"))
        .agg(count(lit(1)).as("n_both"),
          min(col("a.df")).as("df_a"), min(col("b.df")).as("df_b"))
        .filter(col("n_both") >= LiftMinSupport)
        .crossJoin(nRow)
        .select(col("term_a"), col("term_b"), col("n_both"),
          expr("(n_both * n * 1000000L) div (df_a * df_b)").as("lift_ppm"))
        .orderBy(col("lift_ppm").desc, col("term_a"), col("term_b"))
        .limit(25)
    },

    // ---- VOCABULARY GROWTH curve (Heaps' law: V(n) ~ K·n^β — the
    // corpus-scaling question "how much new vocabulary does the next
    // shard buy?"). The unit is the character 8-GRAM, not the word: the
    // synthetic corpus has a closed 31-word lexicon, but its shingle
    // space is open, so the curve is non-degenerate — and shingle
    // novelty is the same unit the dedup family measures, making this
    // the corpus-level twin of text_df_novelty. New-vocabulary
    // attribution needs no ordered scan: each distinct gram's FIRST
    // document is one min-aggregate, buckets of 16 docs histogram those
    // first occurrences, and the cumulative curve is a running sum over
    // the ≤ N/16 bucket frame — the corpus is touched exactly once (the
    // min-agg); the global-ordered window reads only the tiny bucket
    // histogram (pmod(…,1) is the repo's non-foldable constant key for a
    // deliberately-global window over a bounded frame). Decaying
    // new_grams across buckets is the measured Heaps exponent — in
    // exact integers.
    q("text_vocab_growth",
      """WITH post AS (
        |  SELECT doc_id,
        |    unnest(list_transform(generate_series(1, len(text) - 7),
        |      i -> substr(text, i, 8))) AS g
        |  FROM documents),
        |f AS (SELECT g, MIN(doc_id) AS first_doc FROM post GROUP BY 1),
        |b AS (
        |  SELECT first_doc // 16 AS bucket, CAST(COUNT(*) AS BIGINT) AS new_grams
        |  FROM f GROUP BY 1)
        |SELECT CAST(bucket AS BIGINT) AS bucket, new_grams,
        |  CAST(SUM(new_grams) OVER (ORDER BY bucket) AS BIGINT) AS cum_vocab
        |FROM b""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(pmod(col("bucket"), lit(1))).orderBy(col("bucket"))
      Tables.documentsParallel(s, d)
        .filter(length(col("text")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, length(text) - 7), i -> substring(text, i, 8))"))
          .as("g"))
        .groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
        .groupBy(expr("first_doc div 16").as("bucket"))
        .agg(count(lit(1)).as("new_grams"))
        .withColumn("cum_vocab", sum(col("new_grams")).over(w))
    },

    // ---- the first BPE merge decisions: corpus-wide adjacent character
    // pair frequencies inside words (Sennrich et al. 2016's statistic for
    // merge round 1). Fully map-side until one hash agg on a 2-char key;
    // the top-10 ranking runs on the tiny |alphabet|² post-agg frame.
    q("bpe_first_merges",
      """WITH wds AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |pr AS (
        |  SELECT substr(w, i, 2) AS pair
        |  FROM (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
        |        FROM wds WHERE len(w) >= 2)),
        |cnt AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pr GROUP BY 1),
        |rk AS (
        |  SELECT pair, n,
        |    CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rank
        |  FROM cnt)
        |SELECT pair, n, rank FROM rk WHERE rank <= 10""".stripMargin) { (s, d) =>
      Tables.documentsParallel(s, d)
        .select(explode(TextAnalysis.words(col("text"))).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("n"))
        // n % 1 ≡ 0: non-foldable constant key — single-task ranking of the
        // tiny |alphabet|² frame without WindowExec's empty-spec warning
        .withColumn("rank", row_number().over(
          Window.partitionBy(pmod(col("n"), lit(1L)))
            .orderBy(col("n").desc, col("pair"))).cast("long"))
        .filter(col("rank") <= 10)
    },

    // ---- repetition-aware epoch scheduling (Muennighoff et al. 2023,
    // arXiv:2305.16264: repeating good data up to ~4 epochs is nearly as
    // good as new data): docs earn 1-3 epochs by quality tier, the
    // schedule EXPANDS to one row per (doc, epoch), and each epoch gets a
    // different deterministic presentation order via an epoch-salted hash
    // shard — same data, different order per epoch, reproducible on any
    // engine. Shape: narrow per-row tiering + explode; the only wide op
    // downstream is whatever sorts/routes on (epoch, shard).
    q("schedule_epochs",
      s"""WITH tiers AS (
         |  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_words,
         |    CASE WHEN lang = 'en' AND len(string_split(text, ' ')) >= 60 THEN 3
         |         WHEN len(string_split(text, ' ')) >= 40 THEN 2
         |         ELSE 1 END AS n_epochs
         |  FROM documents)
         |SELECT doc_id, CAST(n_epochs AS BIGINT) AS n_epochs,
         |  CAST(epoch AS BIGINT) AS epoch,
         |  ${TextHash.h64Sql("doc_id || '@' || epoch")} % 64 AS shard
         |FROM (SELECT doc_id, n_epochs,
         |        unnest(generate_series(1, n_epochs)) AS epoch
         |      FROM tiers)""".stripMargin) { (s, d) =>
      val nw = size(TextAnalysis.words(col("text")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(col("lang") === "en" && nw >= 60, 3L)
            .when(nw >= 40, 2L).otherwise(1L).as("n_epochs"))
        .select(col("doc_id"), col("n_epochs"),
          explode(expr("sequence(1L, n_epochs)")).as("epoch"))
        .withColumn("shard",
          TextHash.h64(concat(col("doc_id").cast("string"), lit("@"),
            col("epoch").cast("string"))) % 64)
    },

    // ---- per-source distribution DRIFT: total-variation distance between
    // each source's hashed-token distribution and the corpus distribution
    // — the dataset-shift monitor a curation pipeline runs per crawl
    // snapshot / per provider. TV = ½ Σ_b |p_s(b) − p_c(b)| computed with
    // CROSS-MULTIPLIED integers (|n_sb·N_c − n_cb·N_s|), so the only
    // division is the final ppm scaling — bit-stable on any engine. All
    // frames after the one corpus-sized (source, bucket) agg are ≤
    // |sources|×512 rows; the grid is a broadcast cross join. (At extreme
    // corpus sizes the cross products approach 2^63 — there the same sum
    // runs per-bucket-scaled or in DECIMAL; exact BIGINT is right for the
    // magnitudes here.)
    q("source_drift_tv", {
      val b = s"${TextHash.h64Sql("unnest(string_split(text, ' '))")} % $DsirBuckets"
      s"""WITH tok AS (SELECT source, $b AS b FROM documents),
         |sb AS (SELECT source, b, CAST(COUNT(*) AS BIGINT) AS n_sb FROM tok GROUP BY 1, 2),
         |ns AS (SELECT source, CAST(SUM(n_sb) AS BIGINT) AS n_s FROM sb GROUP BY 1),
         |cb AS (SELECT b, CAST(SUM(n_sb) AS BIGINT) AS n_cb FROM sb GROUP BY 1),
         |nc AS (SELECT CAST(SUM(n_cb) AS BIGINT) AS n_c FROM cb),
         |grid AS (
         |  SELECT ns.source, ns.n_s, cb.b, cb.n_cb, COALESCE(sb.n_sb, 0) AS n_sb
         |  FROM ns CROSS JOIN cb
         |  LEFT JOIN sb ON sb.source = ns.source AND sb.b = cb.b)
         |SELECT source, n_s AS n_tokens,
         |  CAST(SUM(abs(n_sb * (SELECT n_c FROM nc) - n_cb * n_s)) * 1000000
         |    // (2 * n_s * (SELECT n_c FROM nc)) AS BIGINT) AS tv_ppm
         |FROM grid GROUP BY source, n_s""".stripMargin
    }) { (s, d) =>
      val sb = Tables.documentsParallel(s, d)
        .select(col("source"), explode(TextAnalysis.words(col("text"))).as("token"))
        .withColumn("b", TextHash.h64(col("token")) % DsirBuckets)
        .groupBy(col("source"), col("b"))
        .agg(count(lit(1)).as("n_sb"))
      val ns = sb.groupBy(col("source")).agg(sum(col("n_sb")).as("n_s"))
      val cb = sb.groupBy(col("b")).agg(sum(col("n_sb")).as("n_cb"))
      val nc = cb.agg(sum(col("n_cb")).as("n_c"))
      ns.crossJoin(broadcast(cb))
        .join(sb, Seq("source", "b"), "left")
        .na.fill(0L, Seq("n_sb"))
        .crossJoin(broadcast(nc))
        .groupBy(col("source"), col("n_s"))
        .agg(sum(abs(col("n_sb") * col("n_c") - col("n_cb") * col("n_s"))).as("num"),
          first(col("n_c")).as("n_c"))
        .select(col("source"), col("n_s").as("n_tokens"),
          expr("num * 1000000 div (2 * n_s * n_c)").as("tv_ppm"))
    },

    // ---- per-language length deciles: ntile over a fully-ordered
    // (n_chars, doc_id) ranking inside each language partition — the
    // window is keyed by lang, so no single-task global sort; both engines
    // implement ANSI ntile (first n%k buckets one row larger), and the
    // unique tie-break makes assignment deterministic.
    q("text_length_deciles",
      """WITH t AS (
        |  SELECT lang, n_chars,
        |    CAST(ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
        |      AS BIGINT) AS decile
        |  FROM documents)
        |SELECT lang, decile,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars
        |FROM t GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("n_chars"), ntile(10).over(w).cast("long").as("decile"))
        .groupBy(col("lang"), col("decile"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
    },

    // ---- BPE learn+apply (Sennrich et al. 2016, arXiv:1508.07909): the
    // tokenizer a training pipeline actually runs, completing
    // [[graft.llm.TextPolicy]]'s `bpe_first_merges` round-1 statistic.
    // BpeRounds fully-unrolled rounds; each round (a) counts adjacent
    // token pairs weighted by word frequency, (b) picks the argmax pair
    // (deterministic (n DESC, a, b) tie-break), (c) APPLIES it to every
    // word greedy-leftmost via a string-fold `aggregate` (the accumulator
    // is the token list joined on chr(31); "last token == a" is an exact
    // endswith check, and merging appends b separator-free so a fresh
    // merge can't chain onto its own output — byte-equal to the oracle's
    // `list_reduce`). Output per round: the merge rule, its pre-apply
    // pair count, and the corpus token total AFTER applying it — the
    // total differs from count subtraction exactly when greedy overlap
    // skips merges, so it verifies apply semantics, not just counting.
    //
    // Scale shape: classic BPE runs on the word-FREQUENCY table, not the
    // corpus — the one corpus-wide pass is the `wf` aggregate; every
    // round after that folds over |vocab| rows with a 1-row broadcast
    // rule, and `localCheckpoint` truncates the per-round lineage (the
    // Lloyd-iteration doctrine, [[Similarity]]) so round r executes once
    // instead of replaying rounds 1..r-1 per downstream aggregate.
    q("bpe_tokenize", {
      val sb = new StringBuilder(bpeLearnCtes)
      val tail = (1 to BpeRounds).map(r =>
        s"""SELECT CAST($r AS BIGINT) AS round, pa AS a, pb AS b, n AS pair_n,
           |  (SELECT CAST(SUM(f * len(t)) AS BIGINT) FROM t$r) AS corpus_tokens_after
           |FROM m$r""".stripMargin).mkString("\nUNION ALL\n")
      sb.append("\n").append(tail).toString
    }) { (s, d) =>
      wfCollected(s, d) match {
        case Some(wf) =>
          import s.implicits._
          s.createDataset(BpeDriver.learn(wf, BpeRounds).merges)
            .toDF("round", "a", "b", "pair_n", "corpus_tokens_after")
        case None => bpeTokenizeDistributed(s, d)
      }
    },

    // ---- per-document COMPRESSION RATE under the learned BPE vocabulary:
    // chars-per-token in ppm — the tokenizer-based quality proxy real
    // curation pipelines use alongside perplexity (text that BPE fragments
    // into near-character tokens compresses poorly: non-language strings,
    // boilerplate soup, wrong-script content; unusually HIGH compression
    // flags repetitive filler). Shape: the same one corpus pass → word
    // frequency table as `bpe_tokenize`; the learned |vocab|-row word→
    // token-count map then joins back to the per-doc word explode on the
    // word key — corpus-sized rows cross ONE narrow token-keyed join, all
    // arithmetic integer (ppm floor division).
    q("bpe_compression_rate",
      s"""$bpeLearnCtes,
         |wtok AS (SELECT w, CAST(len(t) AS BIGINT) AS ntok FROM t$BpeRounds),
         |dw AS (
         |  SELECT doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE w <> ''),
         |agg AS (
         |  SELECT d.doc_id,
         |    CAST(SUM(len(d.w)) AS BIGINT) AS n_word_chars,
         |    CAST(SUM(wt.ntok) AS BIGINT) AS n_bpe_tokens
         |  FROM dw d JOIN wtok wt USING (w) GROUP BY 1)
         |SELECT doc_id, n_word_chars, n_bpe_tokens,
         |  (n_word_chars * 1000000) // n_bpe_tokens AS chars_per_token_ppm
         |FROM agg""".stripMargin) { (s, d) =>
      val wtok = bpeLearnedToks(s, d)
        .select(col("w"), size(col("t")).cast("long").as("ntok"))
      val dw = Tables.documentsParallel(s, d)
        .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("w"))
        .filter(col("w") =!= "")
      dw.join(wtok, "w")
        .groupBy(col("doc_id"))
        .agg(sum(length(col("w"))).cast("long").as("n_word_chars"),
          sum(col("ntok")).as("n_bpe_tokens"))
        .select(col("doc_id"), col("n_word_chars"), col("n_bpe_tokens"),
          expr("n_word_chars * 1000000 div n_bpe_tokens").as("chars_per_token_ppm"))
    },

    // ---- pairwise SOURCE VOCABULARY OVERLAP: exact Jaccard similarity of
    // the distinct-token vocabularies of every source pair — the
    // corpus-mixing diagnostic (which sources are near-redundant? which
    // contribute novel vocabulary?) that sits beside mix_domains /
    // source_drift_tv when composing a training mixture. Scale shape: the
    // corpus collapses to distinct (source, token) in ONE shuffle (map-side
    // combine first), and the pair join runs on that deduped frame keyed by
    // token — each token matches at most |sources| rows per side, so the
    // join output per key is bounded by |sources|² regardless of how many
    // billions of times a stopword occurs; no skew blowup by construction.
    // Union sizes come from inclusion-exclusion (|A|+|B|−|A∩B|), so only
    // intersections are ever joined. Jaccard in exact integer ppm.
    q("text_source_overlap",
      """WITH st AS (
        |  SELECT DISTINCT source, token FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS token
        |    FROM documents)),
        |vs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab FROM st GROUP BY 1),
        |inter AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_inter
        |  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT i.source_a, i.source_b, i.n_inter,
        |  va.vocab + vb.vocab - i.n_inter AS n_union,
        |  (i.n_inter * 1000000) // (va.vocab + vb.vocab - i.n_inter) AS jaccard_ppm
        |FROM inter i
        |JOIN vs va ON va.source = i.source_a
        |JOIN vs vb ON vb.source = i.source_b""".stripMargin) { (s, d) =>
      // feeds the per-source vocab counts and BOTH sides of the pair join —
      // truncate the explode+distinct lineage once
      val st = Tables.documentsParallel(s, d)
        .select(col("source"), explode(TextAnalysis.words(col("text"))).as("token"))
        .distinct()
        .localCheckpoint(eager = false)
      val vs = st.groupBy(col("source")).agg(count(lit(1)).as("vocab"))
      val inter = st.as("a")
        .join(st.as("b"),
          col("a.token") === col("b.token") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_inter"))
      inter
        .join(broadcast(vs.select(col("source").as("source_a"), col("vocab").as("va"))),
          Seq("source_a"))
        .join(broadcast(vs.select(col("source").as("source_b"), col("vocab").as("vb"))),
          Seq("source_b"))
        .select(col("source_a"), col("source_b"), col("n_inter"),
          (col("va") + col("vb") - col("n_inter")).as("n_union"),
          expr("n_inter * 1000000 div (va + vb - n_inter)").as("jaccard_ppm"))
    },

    // ---- cross-source QUANTILE NORMALIZATION of the quality score
    // (Bolstad et al., Bioinformatics 2003, the batch-effect corrector —
    // here: heterogeneous sources score on incomparable scales, so
    // curation thresholds must compare CALIBRATED scores): each document
    // maps from its within-source quantile position (2r−1)/(2n_s) onto the
    // GLOBAL score distribution, taking the score found at the matching
    // global rank. All arithmetic is exact BIGINT (scores scaled to 1e9,
    // floor-divided index mapping), so both engines agree bit-for-bit.
    // Scale shape: the oracle ranks globally with one window, but the
    // Spark side computes global ranks with the BANDED two-level prefix
    // sum (the a_pareto_abc / PPS discipline): score bands from a 1-row
    // broadcast max, per-band row_numbers (keyed windows), 33-row offset
    // frame — no single-task corpus window; the rank→score lookup is one
    // equi-join on the integer rank. Per-source windows are keyed by
    // construction. (Caveat recorded: the (2r−1)·N index product bounds at
    // 2N²  — exact in BIGINT to ~2·10⁹ documents; beyond that, map through
    // per-source ppm quantiles first so the product never exceeds 10⁶·N.)
    q("score_quantile_normalize", {
      val qSql = s"CAST(round((${TextAnalysis.qualityScoreSql("text")}\n) * 1000000000) AS BIGINT)"
      s"""WITH s AS (
         |  SELECT doc_id, source, $qSql AS q FROM documents),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
         |r AS (
         |  SELECT doc_id, source, q,
         |    row_number() OVER (PARTITION BY source ORDER BY q, doc_id) AS r,
         |    COUNT(*) OVER (PARTITION BY source) AS ns
         |  FROM s),
         |g AS (
         |  SELECT doc_id, source, q,
         |    least(greatest(((2*r - 1) * (SELECT n FROM n)) // (2 * ns) + 1, 1),
         |          (SELECT n FROM n)) AS gidx
         |  FROM r),
         |gl AS (
         |  SELECT q AS norm_scaled, row_number() OVER (ORDER BY q, doc_id) AS gr
         |  FROM s)
         |SELECT g.doc_id, g.source, g.q AS score_scaled, gl.norm_scaled
         |FROM g JOIN gl ON g.gidx = gl.gr""".stripMargin
    }) { (s, d) =>
      // score once, truncate lineage: the regex-heavy score feeds the
      // per-source ranking AND the global rank table
      val sc = Tables.documentsParallel(s, d)
        .select(col("doc_id"), col("source"),
          round(TextAnalysis.qualityScore(col("text")) * 1e9).cast("long").as("q"))
        .localCheckpoint(eager = false)
      val stats = broadcast(sc.agg(count(lit(1)).as("n"), max(col("q")).as("maxq")))
      // global ranks WITHOUT a global window: monotone score bands (band
      // boundaries respect score order, ties share a band), keyed
      // row_number within band, cross-band offsets from the tiny band
      // frame — global_rank = offset + local rank, exactly the oracle's
      // row_number() OVER (ORDER BY q, doc_id)
      val banded = sc.crossJoin(stats)
        .withColumn("band", expr("q div ((maxq div 32) + 1)"))
      val inBand = Window.partitionBy(col("band")).orderBy(col("q"), col("doc_id"))
      val offsets = banded.groupBy(col("band")).agg(count(lit(1)).as("bn"))
        .withColumn("offset",
          coalesce(sum(col("bn")).over(
            Window.partitionBy(pmod(col("band"), lit(1))).orderBy(col("band"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("band"), col("offset"))
      val glob = banded
        .withColumn("lr", row_number().over(inBand))
        .join(broadcast(offsets), Seq("band"))
        .select((col("offset") + col("lr")).as("gr"), col("q").as("norm_scaled"))
      val perSource = Window.partitionBy(col("source")).orderBy(col("q"), col("doc_id"))
      val target = sc.crossJoin(stats)
        .withColumn("r", row_number().over(perSource).cast("long"))
        .withColumn("ns", count(lit(1)).over(Window.partitionBy(col("source"))))
        .withColumn("gidx",
          least(greatest(expr("((2*r - 1) * n) div (2 * ns) + 1"), lit(1L)), col("n")))
      target.join(glob, target("gidx") === glob("gr"))
        .select(col("doc_id"), col("source"), col("q").as("score_scaled"),
          col("norm_scaled"))
    }
  )
}
