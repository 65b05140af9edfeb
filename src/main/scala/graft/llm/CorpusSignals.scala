package graft.llm

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
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
      val tf = docs
        .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
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
      val docb = Tables.documentsParallel(s, d)
        .select(col("doc_id"), col("lang"),
          explode(TextAnalysis.words(col("text"))).as("token"))
        .withColumn("b", TextHash.h64(col("token")) % DsirBuckets)
        .groupBy(col("doc_id"), col("lang"), col("b"))
        .agg(count(lit(1)).as("n"))
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
      val tf = docs
        .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("tf"))
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
    }
  )
}
