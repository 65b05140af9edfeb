package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ShingleHashes must be VALUE-IDENTICAL (including first-occurrence
  * order) to the composed HOF form it replaced, on real corpus text and on
  * adversarial inputs (short, empty, repeated, multi-byte). */
class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private val L = graft.llm.TextHash.ShingleLen

  private def composed(text: org.apache.spark.sql.Column) = {
    val positions = sequence(lit(1), greatest(length(text) - (L - 1), lit(1)))
    array_distinct(transform(positions, i => Md5Prefix64(text.substr(i, lit(L)))))
  }

  test("codegen'd shingle hashes ≡ composed HOF form on the corpus") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val diff = docs.select(
      ShingleHashes(col("text")).as("fast"), composed(col("text")).as("slow"))
      .filter(not(col("fast") === col("slow")))
    assert(diff.count() == 0)
  }

  test("edge cases: empty, shorter-than-shingle, repeated, multi-byte") {
    val rows = Seq("", "ab", "x" * 50, "héllo wörld ünïcode — ㊙ text spans",
      "日本語のテキストで十四文字以上ある行です", "a" * 13 + "b" + "a" * 13)
    val df = rows.toDF("text")
    val diff = df.select(
      ShingleHashes(col("text")).as("fast"), composed(col("text")).as("slow"))
      .filter(not(col("fast") === col("slow")))
    assert(diff.count() == 0)
    // and the empty string yields exactly one hash (of "")
    val one = df.filter(col("text") === "")
      .select(size(ShingleHashes(col("text")))).head.getInt(0)
    assert(one == 1)
  }
}
