package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LLM-operator behavior tests: MinHash-LSH finds the exact-Jaccard pairs,
  * exact dedup groups real duplicates, multimodal decode preserves shape.
  */
class LlmSpec extends SparkSpec {
  import spark.implicits._

  test("dedup_exact groups identical texts") {
    // construct a corpus with planted exact duplicates
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon"), (4L, "unique text here"))
      .toDF("doc_id", "text")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
    val out = docs.select(
      col("doc_id"),
      min(col("doc_id")).over(w).as("keeper"),
      (col("doc_id") =!= min(col("doc_id")).over(w)).as("is_dup"))
    assert(out.filter(col("is_dup")).select("doc_id").as[Long].collect().toSet == Set(2L))
  }

  test("minhash-LSH candidates cover all high-Jaccard pairs (recall vs ground truth)") {
    val lsh = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sf0001)
      .select(col("d1"), col("d2")).as[(Long, Long)].collect().toSet
    val truth = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sf0001)
      .select(col("d1"), col("d2")).as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "testdata should contain planted near-duplicates")
    val missed = truth -- lsh
    // 8×4 LSH s-curve at jaccard≥0.8: P(miss) = (1−0.8^4)^8 ≈ 0.9% per pair
    assert(missed.size <= math.max(1, truth.size / 20),
      s"LSH missed ${missed.size} of ${truth.size} true pairs")
  }

  test("embedding LSH dedup: precision 1.0 vs ground truth, recall from the bands") {
    val lsh = graft.SparkEntry.queries("dedup_embedding_lsh")(spark, sf0001)
      .select(col("v1"), col("v2")).as[(Long, Long)].collect().toSet
    val truth = graft.SparkEntry.queries("dedup_embedding_cosine")(spark, sf0001)
      .select(col("v1"), col("v2")).as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "testdata should contain cosine>=0.4 pairs")
    // every candidate is exact-verified in-query: no false positives ever
    assert((lsh -- truth).isEmpty, s"false positives: ${(lsh -- truth).take(5)}")
    // corpus pairs sit at cosine 0.40-0.51 — the hardest sign-LSH regime
    // (per-plane agreement ~0.63); 8 bands x 3 bits measure ~0.78 recall
    val recall = lsh.size.toDouble / truth.size
    assert(recall >= 0.7, s"recall $recall (${lsh.size}/${truth.size})")
  }

  test("IVF multi-probe dedup: precision 1.0, higher recall than the sign bands") {
    val ivf = graft.SparkEntry.queries("dedup_embedding_ivf")(spark, sf0001)
      .select(col("v1"), col("v2")).as[(Long, Long)].collect().toSet
    val truth = graft.SparkEntry.queries("dedup_embedding_cosine")(spark, sf0001)
      .select(col("v1"), col("v2")).as[(Long, Long)].collect().toSet
    assert((ivf -- truth).isEmpty, "exact verification forbids false positives")
    val recall = ivf.size.toDouble / truth.size
    // clustered corpus: 3-probe IVF measures ~0.95 recall here
    assert(recall >= 0.85, s"recall $recall (${ivf.size}/${truth.size})")
  }

  test("cluster resolution: every near-dup pair shares a keeper; keeper is the min") {
    val pairs = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, sf0001)
      .select(col("d1"), col("d2")).as[(Long, Long)].collect()
    val keeperOf = graft.SparkEntry.queries("dedup_clusters")(spark, sf0001)
      .select(col("doc_id"), col("cluster_keeper")).as[(Long, Long)].collect().toMap
    assert(pairs.nonEmpty)
    // connected docs resolve to the same cluster
    pairs.foreach { case (a, b) =>
      assert(keeperOf(a) == keeperOf(b), s"pair ($a,$b) split across clusters")
    }
    // the keeper is a member of its own cluster and the minimum of it
    val byKeeper = keeperOf.toSeq.groupBy(_._2)
    byKeeper.foreach { case (k, members) =>
      assert(members.map(_._1).min == k, s"keeper $k is not the min of its cluster")
    }
  }

  test("simhash of near-identical docs differ in few bits") {
    val sims = graft.SparkEntry.queries("dedup_simhash")(spark, sf0001)
      .select(col("doc_id"), col("simhash")).as[(Long, Long)].collect().toMap
    val truth = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, sf0001)
      .select(col("d1"), col("d2")).as[(Long, Long)].collect()
    assert(truth.nonEmpty)
    val hammings = truth.map { case (a, b) =>
      java.lang.Long.bitCount(sims(a) ^ sims(b))
    }
    assert(hammings.forall(_ <= 8), s"near-dup hamming distances: ${hammings.toSeq}")
  }

  test("simhash banded hamming join is lossless at hamming <= 3 (pigeonhole)") {
    val sigs = graft.SparkEntry.queries("dedup_simhash")(spark, sf0001)
      .select(col("doc_id"), col("simhash")).as[(Long, Long)].collect()
    val expected = (for {
      (a, sa) <- sigs.iterator
      (b, sb) <- sigs.iterator
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    val banded = graft.SparkEntry.queries("dedup_simhash_pairs")(spark, sf0001)
      .select(col("d1"), col("d2")).as[(Long, Long)].collect().toSet
    assert(banded == expected,
      s"missed=${(expected -- banded).take(3)} extra=${(banded -- expected).take(3)}")
  }

  test("brute-force and LSH ANN agree on the in-bucket neighbors") {
    val bf = graft.SparkEntry.queries("sim_bruteforce_topk")(spark, sf0001)
      .select("query_id", "vec_id", "cosine")
    val lsh = graft.SparkEntry.queries("sim_lsh_topk")(spark, sf0001)
      .select("query_id", "vec_id", "cosine")
    // every LSH hit must carry the same cosine the brute-force path computed
    val joined = lsh.as("l").join(bf.as("b"),
      col("l.query_id") === col("b.query_id") && col("l.vec_id") === col("b.vec_id"))
    assert(joined.filter(col("l.cosine") =!= col("b.cosine")).count() == 0)
  }

  test("multimodal resize + frame-sample stubs: shape and determinism") {
    val corpus = Multimodal.corpus(spark, sf0001).limit(50)
    val resized = Multimodal.resizeStub(corpus, 64, 64)
    assert(resized.count() == 50)
    assert(resized.filter(col("out_width") =!= 64 || col("out_height") =!= 64).count() == 0)
    // byte budget bounded by target area
    assert(resized.filter(length(col("content")) > 64 * 64 / 64 + 1).count() == 0)

    val frames = Multimodal.frameSampleStub(corpus, frameBytes = 32, everyNth = 2)
    assert(frames.count() >= 50) // 1→N fan-out
    assert(frames.filter(col("frame_index") % 2 =!= 0).count() == 0)
    assert(frames.filter(length(col("frame")) > 32).count() == 0)
  }

  test("multimodal decode: deterministic features, partition-shaped") {
    val corpus = Multimodal.corpus(spark, sf0001)
    val feats = Multimodal.decodeFeatures(corpus)
    assert(feats.count() == corpus.count())
    assert(feats.select(size(col("features"))).distinct().head().getInt(0) == 8)
    // decode twice → identical (stub is deterministic)
    val again = Multimodal.decodeFeatures(corpus)
    assert(feats.select("doc_id", "checksum").except(again.select("doc_id", "checksum")).count() == 0)
  }
}
