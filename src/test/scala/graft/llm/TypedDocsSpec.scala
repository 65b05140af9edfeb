package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Typed corpus Aggregator ≡ the untyped column-expression formulation,
  * and the typed plan keeps the two-phase aggregate shape. */
class TypedDocsSpec extends SparkSpec {

  test("typed lang stats equal the untyped DataFrame formulation exactly") {
    val typed = TypedDocs.langStats(spark, sf0001).toDF()
      .select("lang", "n_docs", "total_words", "total_chars",
        "total_est_bpe_tokens", "max_words")
    val w = split(col("text"), " ", -1)
    val untyped = graft.ops.Tables.documents(spark, sf0001)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(w).cast("long")).as("total_words"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        sum(((length(col("text")) + 3).cast("long") / 4).cast("long"))
          .as("total_est_bpe_tokens"),
        max(size(w).cast("long")).as("max_words"))
    assert(typed.except(untyped).count() === 0)
    assert(untyped.except(typed).count() === 0)
  }

  test("typed char counts match untyped on supplementary-plane characters") {
    import spark.implicits._
    // "👍" is one code point but two UTF-16 units — String.length would
    // count 2 here and silently diverge from Spark length()/DuckDB len()
    val rows = Seq(
      TypedDocs.Doc(1L, "a 👍 b", "en", "s", 5L),
      TypedDocs.Doc(2L, "plain ascii text", "en", "s", 16L))
    val ds = spark.createDataset(rows)
    val typed = ds.groupByKey(_.lang).agg(TypedDocs.langStatsAgg.toColumn)
      .map { case (lang, st) => st.copy(lang = lang) }
      .toDF().select("lang", "total_chars")
    val untyped = ds.toDF().groupBy(col("lang"))
      .agg(sum(length(col("text")).cast("long")).as("total_chars"))
    assert(typed.collect().toSeq.map(_.toSeq) === untyped.collect().toSeq.map(_.toSeq))
    // and the absolute value is the code-point count: 5 + 16
    assert(typed.head.getLong(1) === 21L)
  }

  test("typed aggregation plans as a two-phase object hash aggregate (partial + final)") {
    val plan = TypedDocs.langStats(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected typed aggregate operators in:\n$plan")
    // two-phase: an exchange separates partial and final aggregation
    assert(plan.contains("Exchange hashpartitioning"), s"expected key exchange in:\n$plan")
  }
}
