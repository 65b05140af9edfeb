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

  test("multi-probe recall@5 vs brute-force ground truth at sf0.1 meets the measured floor") {
    // Retrieval-quality evidence for the on-disk index (the in-memory LSH
    // discipline applied here): recall@5 of the shipped 1-bit multi-probe
    // against sim_bruteforce_topk's exact top-5. This corpus's true top-5
    // neighbors sit at cosine 0.32-0.49 (per-plane sign agreement only
    // ~0.56-0.66) — the hardest sign-LSH regime; measured curve by probe
    // radius: hamming 0 → 0.01, ≤1 → 0.13 (shipped, 9 of 256 dirs),
    // ≤2 → 0.31, ≤3 → 0.585. The floor asserts the shipped point.
    val sf01 = "/root/testdata/sf0.1"
    val probe = graft.SparkEntry.queries("vecstore_probe_topk")(spark, sf01)
      .select($"query_id".cast("long"), $"vec_id".cast("long"))
      .as[(Long, Long)].collect().toSet
    val truth = graft.SparkEntry.queries("sim_bruteforce_topk")(spark, sf01)
      .filter($"rank" <= 5)
      .select($"query_id".cast("long"), $"vec_id".cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(truth.size === 200, "40 queries x top-5 expected")
    val recall = (probe & truth).size.toDouble / truth.size
    assert(recall >= 0.10, f"recall@5 $recall%.3f fell below the measured 0.13 floor")
  }

  test("driver-side bucketOf matches SQL round semantics at negative exact-.5 quantization") {
    // adversarial vector: component j quantizes to -3.5 exactly (SQL round
    // → -4 away from zero; naive Math.round → -3 toward +inf) and component
    // k to +4, both on the same plane with equal weights — so the plane's
    // dot is 0 under SQL rounding but +w under Math.round: the bucket BIT
    // differs, and a mismatched driver probe would scan the wrong directory.
    val q = 1048576.0 // Similarity.Q
    val w = graft.llm.Similarity.planes.head
    val j = w.indices.maxBy(w(_)) // largest positive weight a
    val a = w(j)
    val k = w.indices.filter(i => i != j && w(i) > 0).minBy(w(_)) // smallest positive b
    val b = w(k)
    // c·b ∈ (4a−b, 4a] ⊆ (3a, 4a] since b ≤ a: dot = c·b − 4a ≤ 0 under SQL
    // rounding (bit 0) but c·b − 3a > 0 under Math.round (bit 1) — plane 0's
    // bucket bit provably differs between the two rounding modes
    val c = (4 * a) / b
    val vec = Array.tabulate(w.length) { i =>
      if (i == j) (-3.5 / q).toFloat else if (i == k) (c / q).toFloat else 0.0f
    }.toSeq
    val dir = java.nio.file.Files.createTempDirectory("vecstore-round").toString
    Seq((0L, vec)).toDF("vec_id", "embedding").write.mode("overwrite")
      .partitionBy().format("parquet").save(s"$dir/raw")
    VecStore.append(spark.read.parquet(s"$dir/raw"), s"$dir/idx")
    val stored = spark.read.parquet(s"$dir/idx")
      .selectExpr("CAST(bucket AS BIGINT)").as[Long].head()
    assert(VecStore.bucketOf(vec) == stored,
      s"plane 0 (dims $j,$k): driver bucket ${VecStore.bucketOf(vec)} != stored $stored")
  }
}
