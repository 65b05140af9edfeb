package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the native winnow kernel value-identical to the interpreted HOF
  * chain it replaced (r15): same window minima, same first-occurrence tie
  * positions, same array_distinct collapse — on real corpus text and on
  * adversarial hash arrays (duplicates, plateaus, ties at window edges). */
class WinnowFingerprintsSpec extends SparkSpec {
  import spark.implicits._

  private val w = 8

  private def hofChain(haCol: String) = expr(
    s"""array_distinct(transform(sequence(1, size($haCol) - ${w - 1}), j -> struct(
       |  array_min(slice($haCol, j, $w)) AS fp_hash,
       |  CAST(j - 1 + array_position(slice($haCol, j, $w), array_min(slice($haCol, j, $w))) AS BIGINT) AS pos)))""".stripMargin)

  test("kernel == HOF chain on adversarial arrays") {
    val cases = Seq(
      (1L, Seq(5L, 3L, 3L, 9L, 1L, 1L, 7L, 2L, 2L, 2L, 8L, 0L)),
      (2L, Seq.fill(12)(4L)), // all-equal plateau
      (3L, (1L to 20L)),      // ascending
      (4L, (20L to 1L by -1L)), // descending
      (5L, Seq(2L, 2L, 2L, 2L, 2L, 2L, 2L, 2L)), // exactly one window
      (6L, Seq(9L, 1L, 9L, 1L, 9L, 1L, 9L, 1L, 9L, 1L)),
      (7L, Seq(Long.MaxValue, Long.MinValue, 0L, -1L, 1L,
        Long.MinValue, 5L, 5L, -7L, Long.MaxValue))
    ).map { case (id, xs) => (id, xs.toArray) }
    val df = spark.createDataset(cases).toDF("id", "ha")
    val got = df.select($"id", WinnowFingerprints($"ha", w).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    val exp = df.select($"id", hofChain("ha").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1)).toMap
    assert(got.keySet === exp.keySet)
    got.keySet.foreach { id =>
      assert(got(id) === exp(id), s"case $id diverges")
    }
  }

  test("kernel == HOF chain on real corpus hashes") {
    val k = graft.llm.TextHash.ShingleLen
    val ha = transform(
      sequence(lit(1), length($"text") - (k - 1)),
      i => graft.llm.TextHash.h64(substring($"text", i, lit(k))))
    val base = graft.ops.Tables.documentsParallel(spark, sf0001)
      .filter(length($"text") >= k + w - 1)
      .select($"doc_id", ha.as("ha"))
      .localCheckpoint(eager = true)
    val got = base
      .select($"doc_id", explode(WinnowFingerprints($"ha", w)).as("fp"))
      .select($"doc_id", $"fp.fp_hash", $"fp.pos")
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    val exp = base
      .select($"doc_id", explode(hofChain("ha")).as("fp"))
      .select($"doc_id", $"fp.fp_hash", $"fp.pos")
      .collect().map(_.toSeq).sortBy(_.mkString(","))
    assert(got.length === exp.length)
    assert(got === exp)
  }
}
