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
    assert(DocStore.appendDeduped(spark, b1, dir, batchId = 1L) === 2L)

    // full replay (same batch id, as a checkpoint restart would deliver):
    // nothing lands
    assert(DocStore.appendDeduped(spark, b1, dir, batchId = 1L) === 0L)

    // second batch: one overlap with history, one new
    val b2 = Seq((10L, "delta epsilon"), (11L, "zeta eta")).toDF("doc_id", "text")
    assert(DocStore.appendDeduped(spark, b2, dir, batchId = 2L) === 1L)

    val landed = spark.read.parquet(s"$dir/docs")
    assert(landed.count() === 3L)
    assert(landed.select(countDistinct(col("content_hash"))).head.getLong(0) === 3L)
    // in-batch keeper is the min doc_id
    assert(landed.filter(col("text") === "alpha beta gamma")
      .select("doc_id").head.getLong(0) === 1L)
    // index mirrors the corpus exactly
    val idx = spark.read.parquet(s"$dir/hash_index")
    assert(idx.count() === 3L)
    assert(landed.select("content_hash").except(idx.select("content_hash")).count() === 0L)
  }

  test("crash between the docs write and the index write does not duplicate on replay") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docstore-crash").toString
    val b = Seq((1L, "theta iota kappa")).toDF("doc_id", "text")
    assert(DocStore.appendDeduped(spark, b, dir, batchId = 7L) === 1L)

    // simulate the crash window: docs landed, index write lost
    val idxPart = new java.io.File(s"$dir/hash_index/batch_id=7")
    assert(idxPart.exists)
    idxPart.listFiles.foreach(_.delete()); idxPart.delete()

    // at-least-once replay of the same batch id: the anti-join passes the
    // doc again (index lost it), but the dynamic overwrite REWRITES
    // partition batch_id=7 instead of appending a second copy
    assert(DocStore.appendDeduped(spark, b, dir, batchId = 7L) === 1L)
    val landed = spark.read.parquet(s"$dir/docs")
    assert(landed.count() === 1L)
    assert(spark.read.parquet(s"$dir/hash_index").count() === 1L)
  }

  test("index compaction folds batch partitions and preserves dedup semantics") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docstore-compact").toString
    (1 to 4).foreach { i =>
      val b = Seq((i.toLong, s"content number $i")).toDF("doc_id", "text")
      assert(DocStore.appendDeduped(spark, b, dir, batchId = i.toLong) === 1L)
    }
    assert(DocStore.compactIndex(spark, dir) === 4L)
    // single history partition remains
    val parts = new java.io.File(s"$dir/hash_index").listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).toSet
    assert(parts === Set("batch_id=-1"))
    // replay of a pre-compaction batch still lands nothing
    val b2 = Seq((2L, "content number 2")).toDF("doc_id", "text")
    assert(DocStore.appendDeduped(spark, b2, dir, batchId = 2L) === 0L)
    // and genuinely new content still lands after compaction
    val b5 = Seq((5L, "content number five")).toDF("doc_id", "text")
    assert(DocStore.appendDeduped(spark, b5, dir, batchId = 5L) === 1L)
    assert(spark.read.parquet(s"$dir/docs").count() === 5L)
    // compaction is idempotent
    assert(DocStore.compactIndex(spark, dir) === 5L)
  }

  test("an empty first batch does not poison the store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docstore-empty").toString
    // batch of zero landable rows (all null text) — the empty-micro-batch-
    // at-stream-start shape; before the guard this wrote docs/ and
    // hash_index/ holding only _SUCCESS, so the next batch's index read
    // failed schema inference and ingestion was stuck until manual cleanup
    val b0 = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(DocStore.appendDeduped(spark, b0, dir, batchId = 0L) === 0L)
    val docsDir = new java.io.File(s"$dir/docs")
    assert(!docsDir.exists || docsDir.listFiles.exists(_.getName.startsWith("batch_id=")),
      "an empty batch must not leave a _SUCCESS-only directory behind")

    // the store still works: a real batch lands, a replay of it doesn't
    val b1 = Seq((2L, "nu xi omicron")).toDF("doc_id", "text")
    assert(DocStore.appendDeduped(spark, b1, dir, batchId = 1L) === 1L)
    assert(DocStore.appendDeduped(spark, b1, dir, batchId = 2L) === 0L)
    assert(spark.read.parquet(s"$dir/docs").count() === 1L)
  }

  test("compacting an already-compact index is a no-op that keeps history intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docstore-recompact").toString
    val b = Seq((1L, "pi rho sigma")).toDF("doc_id", "text")
    assert(DocStore.appendDeduped(spark, b, dir, batchId = 1L) === 1L)
    assert(DocStore.compactIndex(spark, dir) === 1L)
    // no per-batch partitions left to fold: early exit, -1 untouched
    assert(DocStore.compactIndex(spark, dir) === 0L)
    assert(spark.read.parquet(s"$dir/hash_index").count() === 1L)
    // history still suppresses a replay
    assert(DocStore.appendDeduped(spark, b, dir, batchId = 9L) === 0L)
  }

  // ~200-char base texts; a near-dup shares all but the tail, so the
  // 14-char shingle sets overlap heavily (true Jaccard ≈ 0.9)
  private val baseA = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4).trim
  private val baseE = ("one two three four five six seven eight nine ten eleven " * 4).trim
  private def vary(s: String) = s.dropRight(12) + " CHANGED TAIL"

  test("appendNearDeduped suppresses fuzzy duplicates in-batch, cross-batch, and on replay") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docstore-near").toString

    // batch 1: A, near-dup of A (in-batch drop), unrelated C
    val b1 = Seq((1L, baseA), (2L, vary(baseA)), (3L, "completely different short text"))
      .toDF("doc_id", "text")
    assert(DocStore.appendNearDeduped(spark, b1, dir, batchId = 1L) === 2L)
    assert(spark.read.parquet(s"$dir/docs").select("doc_id")
      .as[Long].collect().toSet === Set(1L, 3L))

    // batch 2: near-dup of landed A (cross-batch drop), new E, near-dup of E
    // (in-batch drop) — only E lands
    val b2 = Seq((10L, vary(baseA)), (11L, baseE), (12L, vary(baseE)))
      .toDF("doc_id", "text")
    assert(DocStore.appendNearDeduped(spark, b2, dir, batchId = 2L) === 1L)
    assert(spark.read.parquet(s"$dir/docs").select("doc_id")
      .as[Long].collect().toSet === Set(1L, 3L, 11L))

    // full replay of batch 2: every survivor self-matches history at
    // est-Jaccard 1.0 — nothing lands
    assert(DocStore.appendNearDeduped(spark, b2, dir, batchId = 2L) === 0L)

    // an EXACT re-crawl of landed content in a later batch is also caught
    val b3 = Seq((20L, baseE)).toDF("doc_id", "text")
    assert(DocStore.appendNearDeduped(spark, b3, dir, batchId = 3L) === 0L)
    assert(spark.read.parquet(s"$dir/docs").count() === 3L)
    // band index holds 8 rows per landed doc
    assert(spark.read.parquet(s"$dir/sig_index").count() === 24L)
  }

  test("appendNearDeduped: an all-duplicate batch writes nothing and does not poison the store") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docstore-near-empty").toString
    assert(DocStore.appendNearDeduped(spark,
      Seq((1L, baseA)).toDF("doc_id", "text"), dir, 1L) === 1L)
    // batch of only near-dups: empty-batch guard must hold for the sig store
    assert(DocStore.appendNearDeduped(spark,
      Seq((2L, vary(baseA))).toDF("doc_id", "text"), dir, 2L) === 0L)
    assert(DocStore.appendNearDeduped(spark,
      Seq((3L, "fresh text that matches nothing at all")).toDF("doc_id", "text"), dir, 3L) === 1L)
    assert(spark.read.parquet(s"$dir/docs").count() === 2L)
  }

  test("eraseDocs on a near-dedup bronze removes the band rows: re-submitted content re-lands") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docstore-near-erase").toString
    assert(DocStore.appendNearDeduped(spark,
      Seq((1L, baseA), (3L, baseE)).toDF("doc_id", "text"), dir, 1L) === 2L)

    // erase doc 1: its doc row AND its sig_index band rows must go —
    // leaving the band rows would keep re-submitted content suppressed by
    // a document that no longer exists (erasure removes suppression state)
    assert(DocStore.eraseDocs(spark, dir, Seq(1L)) === 1L)
    assert(spark.read.parquet(s"$dir/docs").select("doc_id")
      .as[Long].collect().toSet === Set(3L))
    assert(spark.read.parquet(s"$dir/sig_index")
      .filter(col("doc_id") === 1L).count() === 0L,
      "erased doc's MinHash band rows survive in sig_index")
    assert(spark.read.parquet(s"$dir/sig_index").count() === 8L)

    // the same content re-submitted is a NEW landing, not a suppressed dup
    assert(DocStore.appendNearDeduped(spark,
      Seq((10L, vary(baseA))).toDF("doc_id", "text"), dir, 2L) === 1L)
    // idempotent replay of the request
    assert(DocStore.eraseDocs(spark, dir, Seq(1L)) === 0L)
  }

  test("null-text rows are rejected, not re-landed forever") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("docstore-null").toString
    val b = Seq((1L, "lambda mu"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(DocStore.appendDeduped(spark, b, dir, batchId = 1L) === 1L)
    assert(DocStore.appendDeduped(spark, b, dir, batchId = 2L) === 0L)
    assert(spark.read.parquet(s"$dir/docs").count() === 1L)
  }
}
