package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The pruned right-to-be-forgotten contract: an erase touches ONLY the
  * bucket directories its request hashes into (byte-identical everything
  * else), removes exactly the requested rows, deletes fully-emptied
  * buckets, and replays as a no-op-shaped rewrite. The DuckDB oracle
  * proves the surviving SET; these prove the physical discipline.
  */
class ErasureSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(dir: String): Map[String, (Long, Long)] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        (Files.getLastModifiedTime(p).toMillis, Files.size(p)))
      .toMap

  private def freshStore(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("erasure_spec_").toString + "/docs"
    val docs = graft.ops.Tables.documents(spark, sf0001)
    ErasureStore.build(docs, dir)
    (dir, docs)
  }

  test("erase removes exactly the requested rows and rewrites only their buckets") {
    val (dir, docs) = freshStore()
    val ids = Seq(3L, 7L, 250L)
    val affected = ids.map(ErasureStore.bucketOf(_)).distinct.toSet
    val before = snapshot(dir)

    // the erase's read side lists ONLY the affected bucket directories
    // (static PartitionFilter from driver-side request arithmetic)
    val slice = spark.read.parquet(dir)
      .filter(col("bucket").isin(affected.toSeq: _*))
    val scans = slice.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount === affected.size,
      "erase slice listed more partitions than the request's buckets")

    val erased = ErasureStore.eraseByIds(spark, dir, ids)
    assert(erased === ids.size)

    // surviving content equals the original minus the request, column-exact
    val after = spark.read.parquet(dir).drop("bucket")
    val expect = docs.filter(!col("doc_id").isin(ids: _*))
    val cols = expect.columns.sorted.toIndexedSeq
    assert(after.count() === expect.count())
    assert(after.selectExpr(cols: _*).except(expect.selectExpr(cols: _*)).count() === 0)
    assert(expect.selectExpr(cols: _*).except(after.selectExpr(cols: _*)).count() === 0)

    // untouched buckets: every pre-existing file byte-identical (mtime+size);
    // affected buckets: old files replaced
    val post = snapshot(dir)
    before.foreach { case (p, stamp) =>
      val b = "bucket=(\\d+)".r.findFirstMatchIn(p).get.group(1).toLong
      if (affected(b)) assert(!post.contains(p) || post(p) != stamp,
        s"affected bucket $b file $p survived the rewrite untouched")
      else assert(post(p) === stamp, s"untouched bucket $b file $p was rewritten")
    }
  }

  test("a fully-emptied bucket's directory is removed; absent-id requests touch nothing") {
    val (dir, docs) = freshStore()
    // all ids landing in one bucket
    val allIds = docs.select(col("doc_id")).as[Long].collect()
    val target = ErasureStore.bucketOf(allIds.head)
    val bucketIds = allIds.filter(ErasureStore.bucketOf(_) == target).toSeq
    assert(bucketIds.nonEmpty)
    val erased = ErasureStore.eraseByIds(spark, dir, bucketIds)
    assert(erased === bucketIds.size)
    assert(!Files.exists(Paths.get(s"$dir/bucket=$target")),
      "fully-erased bucket directory must be deleted, not left holding stale files")
    assert(spark.read.parquet(dir)
      .filter(col("doc_id").isin(bucketIds: _*)).count() === 0)

    // absent ids: clean no-op — zero rows erased, zero files touched
    val before = snapshot(dir)
    assert(ErasureStore.eraseByIds(spark, dir, Seq(999999L, 888888L)) === 0L)
    assert(snapshot(dir) === before)
  }

  test("replaying an erase is idempotent: zero rows removed, store unchanged") {
    val (dir, _) = freshStore()
    val ids = Seq(10L, 11L, 12L)
    assert(ErasureStore.eraseByIds(spark, dir, ids) === ids.size)
    val afterFirst = spark.read.parquet(dir).drop("bucket")
    val n = afterFirst.count()
    assert(ErasureStore.eraseByIds(spark, dir, ids) === 0L)
    assert(spark.read.parquet(dir).count() === n)
  }

  test("bucketsFor: constant rewrite unit, NBuckets floor, power-of-two") {
    import ErasureStore._
    // at or under the floor corpus the shipped constant holds
    assert(bucketsFor(1000L) === NBuckets.toLong)
    assert(bucketsFor(NBuckets * TargetRowsPerBucket) === NBuckets.toLong)
    var prev = 0L
    for (rows <- Seq(500L * 1000 * 1000, 4L * 1000 * 1000 * 1000,
        100L * 1000 * 1000 * 1000)) {
      val b = bucketsFor(rows)
      val unit = rows / b
      assert(unit <= TargetRowsPerBucket, s"rows=$rows buckets=$b unit=$unit")
      assert(unit > TargetRowsPerBucket / 4, s"rows=$rows buckets=$b over-shards")
      assert((b & (b - 1)) === 0L, s"buckets=$b not a power of two")
      assert(b >= prev)
      prev = b
    }
    // driver/engine bucket arithmetic bit-identical at a derived count
    val b = bucketsFor(4L * 1000 * 1000 * 1000)
    val viaCol = graft.ops.Tables.documents(spark, sf0001).limit(1)
      .select(ErasureStore.bucketCol(org.apache.spark.sql.functions.lit(7L), b))
      .head().getLong(0)
    assert(viaCol === ErasureStore.bucketOf(7L, b))
  }

  test("registered query equals the declarative survivor set") {
    val got = graft.SparkEntry.queries("doc_erase_rewrite")(spark, sf0001)
    val expect = graft.ops.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 37 =!= 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
    assert(got.count() === expect.count())
    assert(got.except(expect).count() === 0)
    assert(expect.except(got).count() === 0)
  }
}
