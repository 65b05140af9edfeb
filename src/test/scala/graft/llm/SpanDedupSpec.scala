package graft.llm

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Planted-data and invariant tests for the round-6 curation operators:
  * exact substring span dedup, hybrid RRF retrieval, best-quality keeper
  * selection, and systematic PPS sampling. The DuckDB hash check proves
  * engine agreement; these prove the SEMANTICS (span boundaries, fusion
  * arithmetic, argmax-by-quality, draw accounting) on inputs built to
  * exercise each edge. */
class SpanDedupSpec extends SparkSpec {

  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  private def w(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("span dedup: a pasted 10-word run is one maximal span in both docs") {
    val shared = w(10, "s") // 10 shared words => 3 overlapping 8-gram hits
    val docs = Seq(
      (1L, s"${w(20, "a")} $shared ${w(20, "b")}"),
      (2L, s"${w(5, "c")} $shared ${w(30, "d")}"),
      (3L, w(40, "e"))).toDF("doc_id", "text")
    val out = SpanDedup.spanReport(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // overlapping hits merged: exactly ONE span of exactly the 10 words
    assert(out(1L) === ((1L, 10L)))
    assert(out(2L) === ((1L, 10L)))
    assert(out(3L) === ((0L, 0L)))
  }

  test("span dedup: two separated pasted runs stay two spans; short docs report zeros") {
    val s1 = w(8, "x")
    val s2 = w(8, "y")
    val docs = Seq(
      (1L, s"$s1 ${w(12, "a")} $s2"),
      (2L, s"$s1 ${w(40, "b")} $s2"),
      (3L, w(7, "z")), // < SpanN words: cannot host a span
      (4L, w(7, "z"))).toDF("doc_id", "text")
    val out = SpanDedup.spanReport(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((2L, 16L)))
    assert(out(2L) === ((2L, 16L)))
    assert(out(3L) === ((0L, 0L)))
    assert(out(4L) === ((0L, 0L)))
  }

  test("span dedup: adjacent hit intervals merge into one contiguous span") {
    // 16 shared words => hits at pos 1..9 all overlap/touch => one span
    val shared = w(16, "s")
    val docs = Seq(
      (1L, s"$shared ${w(10, "a")}"),
      (2L, s"${w(10, "b")} $shared")).toDF("doc_id", "text")
    val out = SpanDedup.spanReport(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((1L, 16L)))
    assert(out(2L) === ((1L, 16L)))
  }

  test("span removal: keeper doc keeps its text, later docs lose exactly the span") {
    val shared = w(10, "s")
    val docs = Seq(
      (1L, s"${w(20, "a")} $shared ${w(20, "b")}"), // keeper (smallest doc_id)
      (2L, s"${w(5, "c")} $shared ${w(30, "d")}"),
      (3L, w(40, "e"))).toDF("doc_id", "text")
    val out = SpanDedup.spanRemove(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc 1 holds every shared gram first -> untouched
    assert(out(1L) === ((0L, 50L, s"${w(20, "a")} $shared ${w(20, "b")}")))
    // doc 2 loses exactly the 10 pasted words, prefix+suffix survive intact
    assert(out(2L) === ((10L, 35L, s"${w(5, "c")} ${w(30, "d")}")))
    assert(out(3L) === ((0L, 40L, w(40, "e"))))
    // the cleaned corpus is span-free: re-running the report finds nothing
    val clean = Seq(
      (1L, out(1L)._3), (2L, out(2L)._3), (3L, out(3L)._3)).toDF("doc_id", "text")
    assert(SpanDedup.spanReport(clean).agg(sum(col("n_spans"))).head.getLong(0) === 0L)
  }

  test("intra-doc removal: later trigram repeats are cut, overlapping chatter merges") {
    val docs = Seq(
      (1L, "a b c x y z a b c q"), // "a b c" repeats at pos 7 -> cut [7,9]
      (2L, "a a a a a"),           // trigram "a a a" at 1,2,3 -> cut [2,5]
      (3L, "p q r s t u v w")).toDF("doc_id", "text")
    val out = SpanDedup.spanIntradoc(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) === ((3L, 7L, "a b c x y z q")))
    assert(out(2L) === ((4L, 1L, "a")))
    assert(out(3L) === ((0L, 8L, "p q r s t u v w")))
  }

  test("centroid outliers: flag recomputes from cosine; every vector scored once") {
    val rows = run("emb_centroid_outliers").collect()
    val n = graft.ops.Tables.embeddings(spark, sf0001).count()
    assert(rows.length.toLong === n, "one row per vector")
    rows.foreach { r =>
      assert(r.getBoolean(3) === (r.getDouble(2) < 0.0))
      assert(r.getDouble(2) >= -1.0 - 1e-12 && r.getDouble(2) <= 1.0 + 1e-12)
    }
    // sanity: most vectors sit near their own label's centroid
    val outliers = rows.count(_.getBoolean(3))
    assert(outliers < rows.length / 2, s"$outliers of ${rows.length} flagged")
  }

  test("hybrid RRF: fusion is exactly the floor-sum of the leg reciprocals") {
    val rows = run("search_hybrid_rrf").collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val (bm, cs, rrf) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val expected = (if (bm > 0) 1000000L / (60 + bm) else 0L) +
        (if (cs > 0) 1000000L / (60 + cs) else 0L)
      assert(rrf === expected, s"doc ${r.getLong(0)}")
      assert(bm >= 0 && bm <= 20 && cs >= 0 && cs <= 20)
      assert(bm > 0 || cs > 0)
    }
    // ranked output: descending rrf, doc_id tie-break
    val scores = rows.map(r => (r.getLong(3), r.getLong(0)))
    assert(scores.sortBy { case (s, id) => (-s, id) }.toSeq === scores.toSeq)
  }

  test("keeper selection: every keeper is its cluster's quality argmax") {
    // cross-query consistency: membership from dedup_clusters, quality
    // from text_quality_score, keeper must be the (quality desc, doc_id)
    // head of its cluster — and cluster sets must agree exactly
    val clusters = run("dedup_clusters")
      .select(col("doc_id"), col("cluster_keeper").as("cluster_id"))
    val quality = run("text_quality_score").select(col("doc_id"), col("quality_score"))
    val best = clusters.join(quality, "doc_id")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))
          .orderBy(col("quality_score").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("keeper_doc_id"))
    val got = run("dedup_keep_best_quality")
      .select(col("cluster_id"), col("keeper_doc_id"))
    assert(got.count() > 0)
    assert(got.except(best).count() === 0)
    assert(best.except(got).count() === 0)
  }

  test("systematic PPS: exactly 50 draws, each doc's interval holds its hits") {
    val out = run("sample_weighted_systematic").collect()
    assert(out.map(_.getLong(3)).sum === 50)
    // recompute the draw from first principles on the collected corpus
    val toks = graft.ops.Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ", -1)).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = toks.map(_._2).sum
    val step = total / 50
    var cum = 0L
    val expected = toks.flatMap { case (id, n) =>
      val before = cum; cum += n
      val hits = cum / step - before / step
      if (hits > 0) Some((id, n, cum, hits)) else None
    }
    val gotSorted = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(gotSorted.toSeq === expected.toSeq)
  }

  test("quality-weighted PPS: exactly 40 draws, sampled mean quality above corpus mean") {
    val out = run("sample_quality_pps").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(out.map(_._3).sum === 40, "systematic PPS draws exactly K points")
    // inclusion ∝ quality: the hit-weighted mean quality must exceed the
    // corpus mean (that is the whole point of importance resampling)
    val all = graft.ops.Tables.documents(spark, sf0001)
      .filter(col("n_chars") > 0)
      .select(round(graft.llm.TextAnalysis.qualityScore(col("text")) * 1000000)
        .cast("long"))
      .collect().map(_.getLong(0))
    val corpusMean = all.sum.toDouble / all.length
    val sampledMean = out.map(r => r._2 * r._3).sum.toDouble / out.map(_._3).sum
    assert(sampledMean > corpusMean,
      s"sampled mean $sampledMean should exceed corpus mean $corpusMean")
  }

  test("winnowing: a shared long run yields a shared fingerprint; density holds") {
    val shared = "zqv wxj kpt mnb hgf dse rty uio plm okn" // 39 chars >= k+7
    val docs = Seq(
      (1L, s"${w(12, "aa")} $shared ${w(12, "ab")}"),
      (2L, s"${w(12, "ba")} $shared ${w(12, "bb")}"),
      (3L, w(24, "cc"))).toDF("doc_id", "text")
    // reuse the registered query's plan on planted rows via a temp dir
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_winnow_fingerprints")(spark, dir).cache()
    try {
      val fp1 = out.filter(col("doc_id") === 1).select("fp_hash")
        .collect().map(_.getLong(0)).toSet
      val fp2 = out.filter(col("doc_id") === 2).select("fp_hash")
        .collect().map(_.getLong(0)).toSet
      assert((fp1 & fp2).nonEmpty,
        "guarantee: a shared run of >= k+w-1 chars must share a fingerprint")
      // winnowing density: fingerprints per doc between n/w and 2n/(w+1)+1
      val n1 = out.filter(col("doc_id") === 1).count()
      val hashes1 = docs.filter(col("doc_id") === 1)
        .select(length(col("text"))).head.getInt(0) - 13
      assert(n1 >= hashes1 / 8 && n1 <= 2 * hashes1 / 9 + 2,
        s"density out of range: $n1 fingerprints over $hashes1 hashes")
    } finally { out.unpersist() }
  }

  test("TOU billing: charge decomposes exactly into band kWh x rates") {
    val rows = run("meter_billing_tou").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (peak, shoulder, off) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val tou = r.getDouble(5); val flat = r.getDouble(6)
      assert(math.abs(tou - (peak * 0.35 + shoulder * 0.28 + off * 0.18)) < 1e-9)
      assert(math.abs(flat - (peak + shoulder + off) * 0.28) < 1e-9)
      // rate schedule brackets the flat rate
      assert(tou >= flat * 0.18 / 0.28 - 1e-9 && tou <= flat * 0.35 / 0.28 + 1e-9)
    }
  }

  test("proximity search: equals a brute-force positional scan; bounded by boolean-AND") {
    val got = run("search_proximity").collect()
      .map { r =>
        def l(i: Int) = r.getAs[Number](i).longValue
        l(0) -> ((l(1), l(2)))
      }.toMap
    // brute force: tokenize driver-side, count in-window pairs directly
    val docs = graft.ops.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, text) =>
      val ws = text.split(" ", -1)
      val as = ws.zipWithIndex.collect { case ("data", i) => i }
      val bs = ws.zipWithIndex.collect { case ("scan", i) => i }
      val pairs = for (a <- as; b <- bs; if math.abs(b - a) <= 4) yield math.abs(b - a)
      if (pairs.isEmpty) None
      else Some(id -> ((pairs.length.toLong, pairs.min.toLong)))
    }.toMap
    assert(got === expected)
    // structure: distances in [1, window]; proximity hits are a subset of
    // the docs containing both terms at any distance
    assert(got.valuesIterator.forall { case (n, d) => n >= 1L && d >= 1L && d <= 4L })
    val anyDistance = docs.count { case (_, text) =>
      val ws = text.split(" ", -1); ws.contains("data") && ws.contains("scan") }
    assert(got.size <= anyDistance)
    assert(got.nonEmpty, "window of 4 never fires on this corpus — weak query constants")
  }
}
