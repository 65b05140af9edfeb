package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The MinHash-LSH mega-bucket guard ([[Dedup.minhashPairs]]'s
  * signature-identical collapse + membership expansion): a planted
  * duplicate flood must keep the band self-join LINEAR (one doc per
  * identical group enters it), while the OUTPUT stays bit-identical to
  * the naive all-docs-banded pipeline — the guard changes the plan,
  * never the answer. */
class LshSkewSpec extends SparkSpec {
  import spark.implicits._

  private val Planted = 50L

  /** sf0.001 docs with doc_ids 1..50 rewritten to doc 0's text. */
  private lazy val corpus: DataFrame = {
    val docs = graft.ops.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val text0 = docs.filter(col("doc_id") === 0L).head().getString(1)
    docs.withColumn("text",
      when(col("doc_id") > 0L && col("doc_id") <= Planted, lit(text0))
        .otherwise(col("text")))
      .localCheckpoint(eager = true)
  }

  /** The pre-guard pipeline (bands over every doc + signature verify),
    * reconstructed as the ground truth the guard must equal. */
  private def naiveVerifiedPairs(docs: DataFrame): DataFrame = {
    val sigs = Dedup.sigsOf(docs).localCheckpoint(eager = false)
    val bandCols = (0 until Dedup.bandsCount).map { b =>
      val key = (1 until TextHash.BandRows)
        .foldLeft(col(s"s${b * TextHash.BandRows}")) {
          (acc, r) => acc * 31 + col(s"s${b * TextHash.BandRows + r}")
        }
      struct(lit(b).as("band"), key.as("key"))
    }
    val bands = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val matches = (0 until TextHash.NumHashes)
      .map(j => when(col(s"a.s$j") === col(s"b.s$j"), 1).otherwise(0))
      .reduce(_ + _)
    cand
      .join(sigs.as("a"), col("d1") === col("a.doc_id"))
      .join(sigs.as("b"), col("d2") === col("b.doc_id"))
      .select(col("d1"), col("d2"), (matches / 32.0).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.5)
  }

  test("planted flood: the band join sees ONE doc per identical group") {
    val sigs = Dedup.sigsOf(corpus)
    val grouped = sigs.groupBy((0 until TextHash.NumHashes)
      .map(j => col(s"s$j")): _*).agg(min(col("doc_id")).as("rep"))
    assert(grouped.filter(col("rep") > 0L && col("rep") <= Planted)
      .count() === 0L, "no flood member except doc 0 may represent a group")
    // flood output is the true clique (inherent to pair-report
    // semantics), but it comes from the membership expansion, never from
    // the band join — which carries exactly one row for the whole flood
    val floodPairs = Dedup.minhashPairs(corpus)
      .filter(col("d1") <= Planted && col("d2") <= Planted)
    assert(floodPairs.count() === (Planted + 1) * Planted / 2,
      "the flood's full clique must be reported")
    assert(floodPairs.filter(col("est_jaccard") =!= 1.0).count() === 0L)
  }

  test("collapseForShape: the √n cost-balance boundary, pinned") {
    // collapse iff maxGroup² ≥ n: the naive self-join's skew term
    // (bands·maxGroup²/2) then exceeds the collapse's own corpus shuffles
    assert(!Dedup.collapseForShape(1, 5000), "unique sigs: never collapse")
    assert(!Dedup.collapseForShape(70, 5000), "70² = 4900 < 5000: naive")
    assert(Dedup.collapseForShape(71, 5000), "71² = 5041 ≥ 5000: collapse")
    assert(Dedup.collapseForShape(51, 500), "the spec's planted flood trips it")
    assert(!Dedup.collapseForShape(2, 500), "a few twin docs do not")
  }

  test("the guard is answer-preserving: output ≡ the naive pipeline's, value for value") {
    def rows(df: DataFrame): Set[(Long, Long, Double)] =
      df.select(col("d1"), col("d2"), col("est_jaccard"))
        .as[(Long, Long, Double)].collect().toSet
    assert(rows(Dedup.minhashPairs(corpus)) === rows(naiveVerifiedPairs(corpus)),
      "collapse + expansion must change candidate volume, never the answer")
  }
}
