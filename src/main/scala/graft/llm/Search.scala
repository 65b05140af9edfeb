package graft.llm

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
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

  private def inList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ", ", ")")

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
    q("search_bm25_topk", {
      val terms = inList(AndTerms)
      s"""WITH post AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         |lens AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
         |  FROM documents),
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
         |  GROUP BY 1)
         |SELECT doc_id, CAST(score AS BIGINT) AS score_scaled
         |FROM scored ORDER BY score DESC, doc_id LIMIT 10""".stripMargin
    }) { (s, d) =>
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
        .orderBy(col("score_scaled").desc, col("doc_id"))
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
    }
  )
}
