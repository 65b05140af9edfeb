package graft.llm

import graft.SparkSpec

/** Pins the r15 BPE driver regime (BpeDriver.learn over the collected
  * word-frequency table) value-identical to the distributed fold loop —
  * the registered queries route through the driver regime at test scale,
  * so this is the equivalence proof that keeps the distributed loop
  * oracle-adjacent. Covers both consumers: the per-round merge rows
  * (bpe_tokenize) and the final word→tokens table (bpe_compression_rate's
  * input). */
class BpeDriverRegimeSpec extends SparkSpec {

  test("merge rows: driver regime == distributed loop") {
    val viaRegistry = graft.SparkEntry.queries("bpe_tokenize")(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.mkString(" "))
    val dist = CorpusSignals.bpeTokenizeDistributed(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.mkString(" "))
    assert(viaRegistry === dist)
  }

  test("learned word→tokens table: driver regime == distributed loop") {
    val dist = CorpusSignals.bpeLearnedToksDistributed(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[String](2)))
      .sortBy(_._1)
    // drive the registered consumer end to end too: compression-rate rows
    val viaQuery = graft.SparkEntry.queries("bpe_compression_rate")(spark, sf0001)
      .collect().map(_.toSeq).sortBy(_.mkString(" "))
    // distributed twin of the compression-rate query over the distributed toks
    import org.apache.spark.sql.functions._
    val wtok = CorpusSignals.bpeLearnedToksDistributed(spark, sf0001)
      .select(col("w"), size(col("t")).cast("long").as("ntok"))
    val dw = graft.ops.Tables.documentsParallel(spark, sf0001)
      .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
    val distQuery = dw.join(wtok, "w")
      .groupBy(col("doc_id"))
      .agg(sum(length(col("w"))).cast("long").as("n_word_chars"),
        sum(col("ntok")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("n_word_chars"), col("n_bpe_tokens"),
        expr("n_word_chars * 1000000 div n_bpe_tokens").as("chars_per_token_ppm"))
      .collect().map(_.toSeq).sortBy(_.mkString(" "))
    assert(viaQuery === distQuery)
    assert(dist.nonEmpty) // the distributed table itself materializes green
  }
}
