package graft.llm

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index RETRIEVAL operators: boolean-AND and exact-phrase search
  * expressed as posting-list relational algebra — the query-side shapes a
  * corpus search layer runs at scale.
  *
  * The posting list (term → doc [, position]) is the inverted index as a
  * RELATION: boolean AND is a semi-join-and-count on the term key, phrase
  * matching is a positional self-join (pos₂ = pos₁ + 1). At 100 TB the
  * posting relation is partitioned/bucketed BY TERM (each query term's
  * postings are one partition probe — the same directory-pruning story as
  * [[graft.sources.VecStore]]), and the tiny query-term set broadcasts;
  * the corpus itself is never rescanned per query.
  */
object Search {

  private val AndTerms = Seq("data", "join", "scan")
  private val PhraseA = "the"
  private val PhraseB = "data"
  private val ProxA = "data"
  private val ProxB = "scan"
  private val ProxWindow = 4

  private def inList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ", ", ")")

  /** Fixed-point BM25 corpus scoring for [[AndTerms]] — the shared scorer
    * behind `search_bm25_topk` and the hybrid-fusion query. Output:
    * (doc_id, score_scaled), every factor exact 64-bit integer math (see
    * the `search_bm25_topk` commentary for the scaling derivation). */
  private[graft] def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documentsParallel(s, d)
    val lens = docs.select(col("doc_id"),
      size(TextAnalysis.words(col("text"))).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val tf = docs
      .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("term"))
      .filter(col("term").isin(AndTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", expr(
        "((n_docs * 1000000) div df) * tf * 2200 " +
          "div (tf * 1000 + (1200 * (250 + (750 * ((dl * 1000 * n_docs) div total_dl)) " +
          "div 1000)) div 1000)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score")).as("score_scaled"))
  }

  /** The same scorer as DuckDB CTEs ending in `scored(doc_id, score)`. */
  private[graft] def bm25ScoredSqlCtes: String = bm25ScoredSqlCtesFrom("documents")

  /** [[bm25ScoredSqlCtes]] over an arbitrary doc source CTE — the
    * erase-everywhere oracle scores the SURVIVOR corpus through it. */
  private[graft] def bm25ScoredSqlCtesFrom(src: String): String = {
    val terms = inList(AndTerms)
    s"""post AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM $src),
       |lens AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM $src),
       |stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(dl) AS BIGINT) AS total_dl FROM lens),
       |tf AS (
       |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM post WHERE term IN $terms GROUP BY 1, 2),
       |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT tf.doc_id,
       |    SUM(((s.n_docs * 1000000) // df.df) * tf.tf * 2200
       |        // (tf.tf * 1000 +
       |            (1200 * (250 + (750 * ((l.dl * 1000 * s.n_docs) // s.total_dl))
       |              // 1000)) // 1000)) AS score
       |  FROM tf JOIN df ON tf.term = df.term
       |  JOIN lens l ON tf.doc_id = l.doc_id CROSS JOIN stats s
       |  GROUP BY 1)""".stripMargin
  }

  /** Cosine-ranking leg of the hybrid query as DuckDB CTEs ending in
    * `cos_scored(vec_id, cosine)`: fixed-point dot of every vector against
    * query vector 0, normalized in double — [[Similarity.quantizedSql]]'s
    * arithmetic verbatim. */
  private def quantizedLegSql: String =
    s"""${Similarity.quantizedSql},
       |cos_scored AS (
       |  SELECT b.vec_id,
       |    CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1] * p[2])) AS BIGINT)
       |      / (sqrt(CAST(a.norm2 AS DOUBLE)) * sqrt(CAST(b.norm2 AS DOUBLE))) AS cosine
       |  FROM qn a JOIN qn b ON a.vec_id = 0 AND b.vec_id <> 0)""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    // ---- boolean AND retrieval: docs containing EVERY query term.
    // Postings are DISTINCT (term, doc) pairs; AND = group-by-doc over
    // the semi-joined postings HAVING count = |terms|. One term-keyed
    // probe + one doc-keyed count — no corpus scan beyond the postings.
    q("search_boolean_and",
      s"""WITH post AS (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |hits AS (
         |  SELECT doc_id, COUNT(*) AS n_terms
         |  FROM post WHERE term IN ${inList(AndTerms)}
         |  GROUP BY 1)
         |SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms
         |FROM hits WHERE n_terms = ${AndTerms.size}""".stripMargin) { (s, d) =>
      Tables.documentsParallel(s, d)
        .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("term"))
        .filter(col("term").isin(AndTerms: _*))
        .distinct()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_terms"))
        .filter(col("n_terms") === AndTerms.size)
    },

    // ---- BM25-ranked retrieval in FIXED POINT (Robertson & Zaragoza
    // 2009, k1 = 1.2, b = 0.75 as permille constants): every factor is a
    // scaled-integer floor expression — idf as the (N·1e6) div df proxy
    // (rank-preserving vs the log form for df ≪ N), relative doc length
    // in permille, the saturation denominator in permille — so both
    // engines score bit-identically and the top-10 is deterministic with
    // the (score, doc_id) tie-break. Shape: tf agg on (doc, term-subset)
    // after a broadcast term filter, df/avgdl as tiny broadcast aggs,
    // TakeOrderedAndProject for the bounded head — no global sort.
    q("search_bm25_topk",
      s"""WITH $bm25ScoredSqlCtes
         |SELECT doc_id, CAST(score AS BIGINT) AS score_scaled
         |FROM scored ORDER BY score DESC, doc_id LIMIT 10""".stripMargin) { (s, d) =>
      bm25Scored(s, d)
        .orderBy(col("score_scaled").desc, col("doc_id"))
        .limit(10)
    },

    // ---- hybrid retrieval: lexical BM25 and embedding-cosine rankings
    // fused by RECIPROCAL RANK FUSION (Cormack et al., SIGIR 2009):
    // rrf(d) = Σ_lists 1/(60 + rank_list(d)), here ×1e6 in integer floor
    // arithmetic so both engines fuse bit-identically. The two legs are
    // the engine's own rankers — the fixed-point BM25 scorer and the
    // fixed-point cosine scorer (query = vector 0, the retrieval twin of
    // sim_bruteforce_topk's scoring join) — each cut to its top 20 with
    // the (score, id) tie-break before fusion, as a real two-tower
    // retrieval stack would ship candidate lists, then FULL OUTER joined
    // (a doc may appear in either list alone; a missing leg contributes
    // 0). At 100 TB each leg is already bounded (TakeOrderedAndProject /
    // bucketed ANN probes) and the fusion joins two K-row lists — the
    // fusion cost is independent of corpus size by construction.
    q("search_hybrid_rrf", {
      val K = 20
      s"""WITH $bm25ScoredSqlCtes,
         |bm AS (
         |  SELECT doc_id, bm25_rank FROM (
         |    SELECT doc_id,
         |      row_number() OVER (PARTITION BY doc_id % 1
         |        ORDER BY score DESC, doc_id) AS bm25_rank
         |    FROM scored) WHERE bm25_rank <= $K),
         |$quantizedLegSql,
         |vs AS (
         |  SELECT doc_id, cos_rank FROM (
         |    SELECT vec_id AS doc_id,
         |      row_number() OVER (PARTITION BY vec_id % 1
         |        ORDER BY cosine DESC, vec_id) AS cos_rank
         |    FROM cos_scored) WHERE cos_rank <= $K),
         |fused AS (
         |  SELECT doc_id, bm25_rank AS bm_r, cos_rank AS cos_r,
         |    (CASE WHEN bm25_rank IS NULL THEN 0 ELSE 1000000 // (60 + bm25_rank) END
         |     + CASE WHEN cos_rank IS NULL THEN 0 ELSE 1000000 // (60 + cos_rank) END)
         |      AS rrf_scaled
         |  FROM bm FULL OUTER JOIN vs USING (doc_id))
         |SELECT doc_id, CAST(COALESCE(bm_r, 0) AS BIGINT) AS bm25_rank,
         |  CAST(COALESCE(cos_r, 0) AS BIGINT) AS cos_rank,
         |  CAST(rrf_scaled AS BIGINT) AS rrf_scaled
         |FROM fused ORDER BY rrf_scaled DESC, doc_id LIMIT 10""".stripMargin
    }) { (s, d) =>
      val K = 20
      // Each leg is cut to its top-K FIRST with orderBy().limit(K) — a
      // distributed TakeOrderedAndProject (per-partition heads merged on
      // the driver), the same shape search_bm25_topk ships — and only the
      // K-row result gets a rank-assignment window, so the window input is
      // corpus-independent by construction. pmod(id, 1) is the repo's
      // non-foldable constant partition key for a deliberately-global
      // window over a tiny frame (a literal would fold back to the warned
      // empty partition spec).
      val bmW = Window.partitionBy(pmod(col("doc_id"), lit(1)))
        .orderBy(col("score_scaled").desc, col("doc_id"))
      val bm = bm25Scored(s, d)
        .orderBy(col("score_scaled").desc, col("doc_id"))
        .limit(K)
        .withColumn("bm25_rank", row_number().over(bmW).cast("long"))
        .select(col("doc_id"), col("bm25_rank"))
      val qe = Similarity.quantized(s, d)
      val cosW = Window.partitionBy(pmod(col("vec_id"), lit(1)))
        .orderBy(col("cosine").desc, col("vec_id"))
      val vs = broadcast(qe.filter(col("vec_id") === 0).as("a"))
        .join(qe.as("b"), col("b.vec_id") =!= col("a.vec_id"))
        .select(col("b.vec_id").as("vec_id"),
          (Similarity.dot("a.qv", "b.qv").cast("double")
            / (sqrt(col("a.norm2").cast("double")) * sqrt(col("b.norm2").cast("double"))))
            .as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(K)
        .withColumn("cos_rank", row_number().over(cosW).cast("long"))
        .select(col("vec_id").as("doc_id"), col("cos_rank"))
      bm.join(vs, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("bm25_rank"), lit(0L)).as("bm25_rank"),
          coalesce(col("cos_rank"), lit(0L)).as("cos_rank"),
          (when(col("bm25_rank").isNull, 0L)
            .otherwise(expr("1000000 div (60 + bm25_rank)"))
            + when(col("cos_rank").isNull, 0L)
              .otherwise(expr("1000000 div (60 + cos_rank)"))).as("rrf_scaled"))
        .orderBy(col("rrf_scaled").desc, col("doc_id"))
        .limit(10)
    },

    // ---- exact phrase search: positional postings (term, doc, pos);
    // the phrase "A B" holds wherever A's posting at pos p meets B's at
    // p+1 — a positional equi-join on (doc, pos+1), the classic
    // posting-intersection. Output: per-doc occurrence counts.
    q("search_phrase",
      s"""WITH post AS (
         |  SELECT doc_id, ws[i] AS term, i AS pos
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws,
         |          unnest(generate_series(1, len(string_split(text, ' ')))) AS i
         |        FROM documents)),
         |a AS (SELECT doc_id, pos FROM post WHERE term = '$PhraseA'),
         |b AS (SELECT doc_id, pos FROM post WHERE term = '$PhraseB')
         |SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
         |FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         |GROUP BY 1""".stripMargin) { (s, d) =>
      val post = Tables.documentsParallel(s, d)
        .select(col("doc_id"),
          posexplode(TextAnalysis.words(col("text"))).as(Seq("pos0", "term")))
        .select(col("doc_id"), col("term"), (col("pos0") + 1).as("pos"))
      val a = post.filter(col("term") === PhraseA)
        .select(col("doc_id"), col("pos"))
      val b = post.filter(col("term") === PhraseB)
        .select(col("doc_id").as("b_doc"), col("pos").as("b_pos"))
      a.join(b, col("b_doc") === col("doc_id") && col("b_pos") === col("pos") + 1)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_occurrences"))
    },

    // ---- proximity search (sloppy phrase, Lucene's slop / the WITHIN
    // operator): both terms inside a ±4-token window in either order —
    // the retrieval mode between boolean-AND (no position constraint)
    // and exact phrase (distance exactly 1). Same positional postings;
    // the window predicate rides the (doc, pos) equi-join as a banded
    // range condition, so per-doc work is bounded by the two terms'
    // in-doc frequencies (positions per term per doc — single digits in
    // real corpora), never a corpus-wide product. Emits the pair count
    // and the closest approach per doc (min distance ranks tighter
    // matches first, the standard slop-scoring input).
    q("search_proximity",
      s"""WITH post AS (
         |  SELECT doc_id, ws[i] AS term, i AS pos
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws,
         |          unnest(generate_series(1, len(string_split(text, ' ')))) AS i
         |        FROM documents)),
         |a AS (SELECT doc_id, pos FROM post WHERE term = '$ProxA'),
         |b AS (SELECT doc_id, pos FROM post WHERE term = '$ProxB')
         |SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |  CAST(MIN(ABS(b.pos - a.pos)) AS BIGINT) AS min_dist
         |FROM a JOIN b ON a.doc_id = b.doc_id
         |  AND ABS(b.pos - a.pos) <= $ProxWindow
         |GROUP BY 1""".stripMargin) { (s, d) =>
      val post = Tables.documentsParallel(s, d)
        .select(col("doc_id"),
          posexplode(TextAnalysis.words(col("text"))).as(Seq("pos0", "term")))
        .select(col("doc_id"), col("term"), (col("pos0") + 1).as("pos"))
      val a = post.filter(col("term") === ProxA)
        .select(col("doc_id"), col("pos"))
      val b = post.filter(col("term") === ProxB)
        .select(col("doc_id").as("b_doc"), col("pos").as("b_pos"))
      a.join(b, col("b_doc") === col("doc_id") &&
          abs(col("b_pos") - col("pos")) <= ProxWindow)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_pairs"),
          min(abs(col("b_pos") - col("pos"))).cast("long").as("min_dist"))
    }
  )
}
