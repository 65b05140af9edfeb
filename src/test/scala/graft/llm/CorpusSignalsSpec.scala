package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic behavior of the corpus-relative signal operators (the oracle
  * proves bit-equality; these prove the signals MEAN what they claim). */
class CorpusSignalsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidf: every doc gets at most 3 terms, ranked by score, and top terms are rarer than the corpus mode") {
    val out = graft.SparkEntry.queries("text_tfidf_top_terms")(spark, sf0001).cache()
    val perDoc = out.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max("rank").as("maxr")).collect()
    assert(perDoc.nonEmpty && perDoc.forall(r => r.getLong(1) <= 3 && r.getLong(2) <= 3))
    // rank is consistent with score within each doc: rank-1 score >= rank-2 >= rank-3
    val bad = out.as[(Long, String, Long, Long, Long)].collect()
      .groupBy(_._1).values.count { rows =>
        val sorted = rows.sortBy(_._5).map(_._4)
        sorted.zip(sorted.tail).exists { case (a, b) => a < b }
      }
    assert(bad == 0, s"$bad docs have scores not descending in rank")
    out.unpersist()
  }

  test("dsir importance: english docs (the target domain) score higher and are kept more often") {
    val out = graft.SparkEntry.queries("dsir_importance")(spark, sf0001)
      .select($"lang", $"score_per_token", $"keep").cache()
    val en = out.filter($"lang" === "en")
    val rest = out.filter($"lang" =!= "en")
    val enMean = en.agg(avg("score_per_token")).head.getDouble(0)
    val restMean = rest.agg(avg("score_per_token")).head.getDouble(0)
    assert(enMean > restMean,
      s"target-domain docs must outscore the rest (en=$enMean rest=$restMean)")
    val enKeep = en.agg(avg("keep")).head.getDouble(0)
    val restKeep = rest.agg(avg("keep")).head.getDouble(0)
    assert(enKeep > restKeep && enKeep > 0.5,
      s"keep rate should favor the target domain (en=$enKeep rest=$restKeep)")
    out.unpersist()
  }

  test("oov rate: bounded to [0,1000] permille and token-mass consistent") {
    val out = graft.SparkEntry.queries("text_oov_rate")(spark, sf0001).cache()
    assert(out.filter($"oov_permille" < 0 || $"oov_permille" > 1000).count() == 0)
    assert(out.filter($"oov_tokens" > $"n_tokens").count() == 0)
    // the vocabulary is corpus-derived: *some* mass must be in-vocab overall
    val tot = out.agg(sum("n_tokens"), sum("oov_tokens")).head
    assert(tot.getLong(1) < tot.getLong(0) / 2,
      "majority of token mass should be in-vocabulary for a self-derived vocab")
    out.unpersist()
  }

  test("length deciles: each language's deciles are contiguous, ordered, and conserve doc mass") {
    val out = graft.SparkEntry.queries("text_length_deciles")(spark, sf0001).cache()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    assert(out.agg(sum("n_docs")).head.getLong(0) == docs.count())
    // within a lang, decile k's max_chars <= decile k+1's min_chars is NOT
    // guaranteed at ties, but min <= max within each bucket always holds
    assert(out.filter($"min_chars" > $"max_chars").count() == 0)
    val langs = out.select("lang").distinct().count()
    assert(out.groupBy("lang").count().filter($"count" =!= 10).count() == 0,
      s"every one of the $langs langs should have exactly 10 deciles")
    out.unpersist()
  }

  test("bigram typicality: single-word and empty docs are excluded, not an ANSI array-index crash") {
    // sequence(1, 0) steps DOWN to [1, 0], so an unguarded transform reads
    // ws[1] out of bounds on a 1-word doc — this corpus is the regression net
    val dir = java.nio.file.Files.createTempDirectory("graft-oneword").toString
    Seq(
      (1L, "solo", "en", "web", 4L),
      (2L, "", "en", "web", 0L),
      (3L, "two words repeated two words", "en", "web", 28L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("text_bigram_typicality")(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(3L), s"only the multi-word doc has transitions, got $out")
  }

  test("integer pagerank: mass is conserved up to floor-division leakage, and in-link-favored nodes outrank") {
    val out = graft.SparkEntry.queries("graph_pagerank")(spark, sf0001).cache()
    val n = out.count()
    val total = out.agg(sum("pr_scaled")).head.getLong(0)
    val scale = 1000000000000L
    // floor division leaks at most (OutDeg-1 per contribution + 99/100ths
    // twice) per node per round — bound generously, assert we're close
    assert(total <= scale && total > scale * 95 / 100,
      s"rank mass $total should stay within 5% of $scale")
    // ranks differ (the graph is not regular in-degree): not all equal
    assert(out.select("pr_scaled").distinct().count() > 1)
    assert(out.filter($"pr_scaled" <= 0).count() == 0)
    assert(n == spark.read.parquet(s"$sf0001/documents.parquet").count())
    out.unpersist()
  }

  test("BPE compression rate: >= 1 char per token, token count bounded by chars, every wordful doc scored") {
    val out = graft.SparkEntry.queries("bpe_compression_rate")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(length(trim(col("text"))) > 0).count()
    assert(out.length.toLong == nDocs, "every doc with words gets a rate")
    out.foreach { case (id, chars, toks, ppm) =>
      assert(toks >= 1 && toks <= chars, s"doc $id: tokens $toks vs chars $chars")
      // merges only ever shrink token counts, never below 1 char/token
      assert(ppm >= 1000000L, s"doc $id: $ppm ppm under 1 char/token")
      assert(ppm == chars * 1000000L / toks)
    }
    // the learned merges must actually compress: corpus-wide mean above
    // 1.1 chars/token (6 merges on this corpus measure ~1.165)
    val totChars = out.map(_._2).sum
    val totToks = out.map(_._3).sum
    assert(totChars * 10 >= totToks * 11,
      s"corpus compression ${totChars.toDouble / totToks} too weak")
  }
}
