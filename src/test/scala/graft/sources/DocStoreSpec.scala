package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-batch incremental dedup: history is consulted via the hash
  * index, replays land nothing, and the corpus never holds two copies. */
class DocStoreSpec extends SparkSpec {

  test("appendDeduped lands each content exactly once across batches and replays") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docstore").toString

    val b1 = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    // in-batch dup (doc 3) collapses; two uniques land
    assert(DocStore.appendDeduped(spark, b1, dir) === 2L)

    // full replay: nothing lands
    assert(DocStore.appendDeduped(spark, b1, dir) === 0L)

    // second batch: one overlap with history, one new
    val b2 = Seq((10L, "delta epsilon"), (11L, "zeta eta")).toDF("doc_id", "text")
    assert(DocStore.appendDeduped(spark, b2, dir) === 1L)

    val landed = spark.read.parquet(s"$dir/docs")
    assert(landed.count() === 3L)
    assert(landed.select(countDistinct(col("content_hash"))).head.getLong(0) === 3L)
    // in-batch keeper is the min doc_id
    assert(landed.filter(col("text") === "alpha beta gamma")
      .select("doc_id").head.getLong(0) === 1L)
    // index mirrors the corpus exactly
    val idx = spark.read.parquet(s"$dir/hash_index")
    assert(idx.count() === 3L)
    assert(landed.select("content_hash").except(idx).count() === 0L)
  }
}
