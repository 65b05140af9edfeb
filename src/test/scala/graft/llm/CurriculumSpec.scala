package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Curriculum shard layout: shards form a totally-ordered, mass-conserving
  * partition of the corpus by score. */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  test("writeShards yields ordered, disjoint, mass-conserving score shards") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"n_chars".cast("long").as("score"))
    val dir = java.nio.file.Files.createTempDirectory("curriculum").toString
    Curriculum.writeShards(docs, dir, nShards = 4)

    val back = spark.read.parquet(dir)
      .withColumn("file", input_file_name())
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())

    // per-file score ranges, in file order (part-00000 < part-00001 < …
    // names the range partitions in ascending key order)
    val ranges = back.groupBy("file")
      .agg(min("score").as("lo"), max("score").as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length > 1, "expect multiple shards for a 4-way range partition")
    // shard k's max ≤ shard k+1's min (equality allowed at tied scores —
    // the doc_id tie-break can split one score across a boundary)
    ranges.zip(ranges.tail).foreach { case ((f1, _, hi), (f2, lo, _)) =>
      assert(hi <= lo, s"shard $f1 max=$hi overlaps $f2 min=$lo")
    }

    // rows inside each shard are sorted by (score, doc_id): re-reading one
    // file preserves parquet row order, so a monotonicity scan proves it
    val firstFile = ranges.head._1
    val rows = back.filter($"file" === firstFile)
      .select("score", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.sameElements(rows.sortBy(identity)),
      "rows within a shard must be (score, doc_id)-sorted")
  }
}
