package graft.llm

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Dataset[T]` / `Aggregator` surface for the corpus side — the
  * LLM-pipeline twin of [[graft.meter.TypedMarts]]: case-class document
  * rows, `groupByKey` on the language, and one custom `Aggregator`
  * computing the per-language token statistics that the untyped
  * `text_token_counts` family derives with column expressions.
  *
  * Semantics are integer-exact and bit-identical to the untyped path
  * (TypedDocsSpec asserts equality against the DataFrame formulation):
  * word counts split on the same single-space convention
  * ([[TextAnalysis.words]]' SQL twin), BPE estimate = ceil(chars/4) per
  * document summed as BIGINTs.
  *
  * Scale note: the Aggregator runs as a two-phase ObjectHashAggregate
  * (map-side partials on every input partition, one exchange on the
  * 5-value language key) — identical shuffle structure to the untyped
  * hash aggregate; only the agg-boundary codegen differs.
  */
object TypedDocs {

  case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  case class LangStats(
      lang: String, n_docs: Long, total_words: Long,
      total_chars: Long, total_est_bpe_tokens: Long, max_words: Long)

  /** Aggregation buffer (public only because the Aggregator's type
    * signature exposes it; not part of the API surface). */
  case class Acc(
      n: Long, words: Long, chars: Long, bpe: Long, maxWords: Long)

  /** Per-language corpus statistics as a typed Aggregator. */
  val langStatsAgg: Aggregator[Doc, Acc, LangStats] =
    new Aggregator[Doc, Acc, LangStats] {
      def zero: Acc = Acc(0L, 0L, 0L, 0L, 0L)
      def reduce(b: Acc, d: Doc): Acc = {
        // same split-on-single-space convention as TextAnalysis.words;
        // split of "" yields one empty token on both engines.
        // codePointCount, NOT String.length: Spark's length() and DuckDB's
        // len() count Unicode code points, while Java length() counts
        // UTF-16 code units — they diverge on any supplementary-plane
        // character (emoji), and this path is contracted bit-identical
        val w = d.text.split(" ", -1).length.toLong
        val c = d.text.codePointCount(0, d.text.length).toLong
        Acc(b.n + 1, b.words + w, b.chars + c,
          b.bpe + (c + 3) / 4, math.max(b.maxWords, w))
      }
      def merge(a: Acc, b: Acc): Acc =
        Acc(a.n + b.n, a.words + b.words, a.chars + b.chars,
          a.bpe + b.bpe, math.max(a.maxWords, b.maxWords))
      def finish(r: Acc): LangStats =
        LangStats("", r.n, r.words, r.chars, r.bpe, r.maxWords)
      def bufferEncoder: Encoder[Acc] = Encoders.product[Acc]
      def outputEncoder: Encoder[LangStats] = Encoders.product[LangStats]
    }

  def docs(spark: SparkSession, dir: String): Dataset[Doc] = {
    import spark.implicits._
    graft.ops.Tables.documents(spark, dir).as[Doc]
  }

  /** Per-language stats through the typed API. */
  def langStats(spark: SparkSession, dir: String): Dataset[LangStats] = {
    import spark.implicits._
    docs(spark, dir)
      .groupByKey(_.lang)
      .agg(langStatsAgg.toColumn)
      .map { case (lang, st) => st.copy(lang = lang) }
  }

  val all: Seq[graft.GraftQuery] = Seq(
    graft.GraftQuery.q("text_lang_stats_typed",
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words,
        |  CAST(SUM(len(text)) AS BIGINT) AS total_chars,
        |  CAST(SUM((len(text) + 3) // 4) AS BIGINT) AS total_est_bpe_tokens,
        |  CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_words
        |FROM documents GROUP BY lang""".stripMargin) { (s, d) =>
      langStats(s, d).toDF()
        .select("lang", "n_docs", "total_words", "total_chars",
          "total_est_bpe_tokens", "max_words")
    })
}
