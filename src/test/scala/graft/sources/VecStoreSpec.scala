package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucket-partitioned ANN index: probes prune to one bucket directory,
  * appends are additive, on-disk buckets agree with the in-memory LSH. */
class VecStoreSpec extends SparkSpec {
  import spark.implicits._

  test("probe reads only its bucket partition, agrees with a full scan, and appends are additive") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("vecstore").toString
    VecStore.append(emb.filter($"vec_id" < 400), dir)

    // pick the most occupied bucket deterministically (partition-column
    // inference reads bucket= back as int — normalize to long)
    val bucket = spark.read.parquet(dir)
      .groupBy("bucket").count().orderBy($"count".desc, $"bucket")
      .head.getAs[Number]("bucket").longValue()

    val probed = VecStore.probe(spark, dir, bucket)
    // 1) partition pruning: every file the probe touches is in bucket=K/
    val files = probed.select(input_file_name()).distinct().as[String].collect()
    assert(files.nonEmpty && files.forall(_.contains(s"bucket=$bucket")),
      s"probe leaked outside bucket=$bucket: ${files.filterNot(_.contains(s"bucket=$bucket")).take(3).mkString}")
    // and the plan prunes at the partition level, not post-scan
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      "expected the bucket filter to bind as a PartitionFilter")

    // 2) the probe equals filtering a full scan
    val full = spark.read.parquet(dir).filter($"bucket" === bucket)
      .select("vec_id").as[Long].collect().toSet
    assert(probed.select("vec_id").as[Long].collect().toSet == full)

    // 3) additive append: existing files untouched, new rows visible
    val before = spark.read.parquet(dir).select(input_file_name()).distinct()
      .as[String].collect().toSet
    VecStore.append(emb.filter($"vec_id" >= 400), dir)
    val after = spark.read.parquet(dir).select(input_file_name()).distinct()
      .as[String].collect().toSet
    assert(before.subsetOf(after), "append must not rewrite existing files")
    assert(spark.read.parquet(dir).count() == emb.count())

    // 4) on-disk bucket equals the driver-side single-query hash
    val one = emb.filter($"vec_id" === 0)
      .select($"embedding").as[Seq[Float]].head()
    val stored = spark.read.parquet(dir).filter($"vec_id" === 0)
      .selectExpr("CAST(bucket AS BIGINT)").as[Long].head()
    assert(VecStore.bucketOf(one) == stored)
  }
}
