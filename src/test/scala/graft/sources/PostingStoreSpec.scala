package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The on-disk inverted index: bucket arithmetic matches the engine hash,
  * the probe scan LISTS only the probed bucket directories, and the
  * answer through the disk layout equals the in-memory boolean-AND. */
class PostingStoreSpec extends SparkSpec {
  import spark.implicits._

  test("driver-side h64 twin is bit-identical to the Md5Prefix64 expression") {
    val terms = Seq("data", "join", "scan", "the", "a-rare-term")
    val got = terms.toDF("t")
      .select(graft.functions.Md5Prefix64(col("t")))
      .as[Long].collect().toSeq
    assert(got === terms.map(PostingStore.h64))
  }

  test("probe scan prunes to the query terms' bucket directories only") {
    val dir = PostingStore.build(spark, sf0001)
    val probe = PostingStore.probe(spark, dir, Seq("data", "join", "scan"))
    val scans = probe.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan in probe plan")
    val selected = scans.head.selectedPartitions.partitionCount
    val expected = Seq("data", "join", "scan")
      .map(t => PostingStore.h64(t) % 16).distinct.length
    assert(selected === expected,
      s"probe listed $selected partitions, wanted the $expected probed buckets")
    assert(scans.head.metadata("PartitionFilters").contains("tb"),
      "partition filter not bound to the bucket column")
  }

  test("index answer equals the in-memory boolean-AND query") {
    val viaIndex = graft.SparkEntry.queries("search_index_probe")(spark, sf0001)
      .as[(Long, Long)].collect().toSet
    val inMemory = graft.SparkEntry.queries("search_boolean_and")(spark, sf0001)
      .as[(Long, Long)].collect().toSet
    assert(viaIndex === inMemory)
    assert(viaIndex.nonEmpty, "AND query empty at sf0.001 — assertions vacuous")
  }
}
