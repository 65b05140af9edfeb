package graft

import org.apache.spark.sql.functions._

/** Semantic postconditions for the round-7d operators: resource-allocation
  * link prediction, local clustering coefficients, the banded exact
  * median, co-occurrence lift, and the bucketed co-located join's
  * exchange-free plan. The DuckDB hash gate proves engine agreement;
  * these prove the SEMANTICS by independent driver-side brute force at
  * sf0.001 (and the PLAN property bucketing exists to deliver).
  */
class OpsR7dSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  private def undirected(): (Set[Long], Set[(Long, Long)]) = {
    val docs = ops.Tables.documents(spark, sf0001).select(col("doc_id"))
    val n = docs.count()
    val und = docs
      .select(col("doc_id").as("src"), explode(expr("sequence(1, 3)")).as("k"))
      .select(col("src"),
        (graft.functions.Md5Prefix64(concat(col("src").cast("string"), lit("-"),
          col("k").cast("string"))) % n).as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
      .distinct()
      .as[(Long, Long)].collect().toSet
    (docs.as[Long].collect().toSet, und)
  }

  test("link prediction: RA scores match brute-force wedges, known edges excluded") {
    val (_, und) = undirected()
    val adj = und.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    // brute force: for every non-adjacent pair with a common neighbor,
    // RA = sum over common neighbors z (deg(z) <= 32) of 1e6 / deg(z)
    val scores = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((z, nbrs) <- adj if deg(z) <= 32L; s <- nbrs; t <- nbrs if s < t) {
      if (!und.contains((s, t))) {
        val (ra, nc) = scores.getOrElse((s, t), (0L, 0L))
        scores((s, t)) = (ra + 1000000L / deg(z), nc + 1)
      }
    }
    val expected = scores.toSeq
      .map { case ((u, v), (ra, nc)) => (u, v, ra, nc) }
      .sortBy { case (u, v, ra, _) => (-ra, u, v) }
      .take(20)
    val got = run("graph_link_prediction").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("clustering coefficient: cc_ppm matches brute-force triangles over deg>=2 nodes") {
    val (_, und) = undirected()
    val adj = und.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = adj.collect { case (v, nbrs) if nbrs.size >= 2 =>
      val ns = nbrs.toSeq
      val tri = (for (i <- ns.indices; j <- i + 1 until ns.size
        if und.contains((math.min(ns(i), ns(j)), math.max(ns(i), ns(j)))))
        yield 1).size.toLong
      val d = nbrs.size.toLong
      (v, d, tri, 2L * tri * 1000000L / (d * (d - 1)))
    }.toSet
    val got = run("graph_clustering_coeff").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    // sanity: at least one node participates in a triangle at this sf
    assert(got.exists(_._3 > 0), "graph has no triangles — test is vacuous")
  }

  test("banded exact median: equals the naive sort-and-index median per group") {
    val vals = ops.Tables.orders(spark, sf0001)
      .select(col("o_orderpriority"),
        ops.Tables.cents(col("o_totalprice")).as("cents"))
      .as[(String, Long)].collect()
    val expected = vals.groupBy(_._1).map { case (g, xs) =>
      val sorted = xs.map(_._2).sorted
      val n = sorted.length
      val lo = sorted((n + 1) / 2 - 1)
      val hi = sorted(n / 2)
      (g, n.toLong, lo + hi)
    }.toSet
    val got = run("a_exact_median_banded").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("pair lift: reported lift recomputes from brute-force doc sets") {
    val docs = ops.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val n = docs.length.toLong
    val postings = docs.flatMap { case (id, t) =>
      t.split(" ").distinct.map(w => (w, id))
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = run("text_pair_lift").collect()
    assert(rows.length > 0, "no pair passed min support at sf0.001")
    for (r <- rows) {
      val (a, b, nBoth, lift) =
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
      val inter = postings(a).intersect(postings(b)).size.toLong
      assert(inter === nBoth, s"pair ($a,$b) doc count")
      val want = nBoth * n * 1000000L / (postings(a).size.toLong * postings(b).size.toLong)
      assert(lift === want, s"pair ($a,$b) lift")
    }
  }

  test("delta-of-delta buckets: partition the stream and recompute from brute force") {
    val ev = ops.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"),
        ops.Tables.cents(col("value")).as("cents"))
      .as[(Long, Long, Long)].collect()
    val expected = collection.mutable.Map.empty[String, (Long, Long)]
    for ((_, xs) <- ev.groupBy(_._1) if xs.size >= 3) {
      val cents = xs.sortBy(_._2).map(_._3)
      val d = cents.zip(cents.tail).map { case (a, b) => b - a }
      for (dod <- d.zip(d.tail).map { case (a, b) => b - a }) {
        val b = if (dod == 0) "zero"
          else if (math.abs(dod) <= 127) "1byte"
          else if (math.abs(dod) <= 32767) "2byte" else "wider"
        val (n, m) = expected.getOrElse(b, (0L, 0L))
        expected(b) = (n + 1, m + math.abs(dod))
      }
    }
    val got = run("a_dod_compression").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected.toMap)
    // every dod lands in exactly one bucket: totals must conserve
    val totalRows = ev.groupBy(_._1).map(_._2.size).map(n => math.max(0, n - 2)).sum
    assert(got.values.map(_._1).sum === totalRows.toLong)
  }

  test("vocab growth: cumulative curve is monotone and ends at the exact vocab size") {
    val rows = run("text_vocab_growth").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.length >= 2, "curve collapsed to one bucket")
    // cum_vocab is the prefix sum of new_grams
    assert(rows.map(_._2).scanLeft(0L)(_ + _).tail === rows.map(_._3).toSeq)
    val vocab = ops.Tables.documents(spark, sf0001)
      .filter(length(col("text")) >= 8)
      .select(explode(expr(
        "transform(sequence(1, length(text) - 7), i -> substring(text, i, 8))"))
        .as("g"))
      .distinct().count()
    assert(rows.last._3 === vocab)
    // Heaps: the first bucket contributes strictly the most new grams
    assert(rows.map(_._2).max === rows.head._2, "first bucket not maximal")
  }

  test("soft dedup weights: per-cluster mass conserves and singletons keep full weight") {
    val rows = run("dedup_soft_weights").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = ops.Tables.documents(spark, sf0001).count()
    assert(rows.length === nDocs, "every document must get a weight")
    for ((_, _, size, w) <- rows) assert(w === 1000000L / size)
    // clusters really exist at this sf, and mass per cluster ≤ 1e6 with
    // floor loss < cluster_size
    val clustered = rows.filter(_._3 > 1)
    assert(clustered.nonEmpty, "no duplicate cluster at sf0.001 — vacuous")
    for ((cid, members) <- clustered.groupBy(_._2)) {
      val mass = members.map(_._4).sum
      val size = members.head._3
      assert(members.length === size, s"cluster $cid size mismatch")
      assert(mass <= 1000000L && mass > 1000000L - size, s"cluster $cid mass $mass")
    }
    // agreement with the hard-dedup keeper query: same clusters, same sizes
    val keeper = run("dedup_keep_best_quality").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizesByCluster = clustered.groupBy(_._2).view.mapValues(_.head._3).toMap
    assert(sizesByCluster === keeper,
      "soft and hard dedup disagree on clusters")
  }

  test("kNN classify: majority vote recomputes from brute-force neighbors") {
    import graft.llm.{Similarity => S}
    val all = ops.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.round(x.toDouble * S.Q)).toArray))
    val expected = all.filter(_._1 % 50 == 0).map { case (qid, tl, qv) =>
      val scored = all.filter(_._1 != qid).map { case (vid, l, v) =>
        val dot = qv.zip(v).map { case (a, b) => a * b }.sum
        val cos = dot.toDouble / (math.sqrt(qv.map(x => x * x).sum.toDouble) *
          math.sqrt(v.map(x => x * x).sum.toDouble))
        (vid, l, cos)
      }.sortBy { case (vid, _, cos) => (-cos, vid) }.take(5)
      val (pred, votes) = scored.groupBy(_._2).view.mapValues(_.length).toSeq
        .minBy { case (l, n) => (-n, l) }
      (qid, tl, pred, votes.toLong, pred == tl)
    }.toSet
    val got = run("sim_knn_classify").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("observe metrics ride the main action and equal a direct aggregate") {
    val direct = ops.Tables.events(spark, sf0001)
      .agg(count(lit(1)), sum(when(col("value") < 0, 1L).otherwise(0L)),
        sum(when(col("event_type").isNull, 1L).otherwise(0L)),
        max(ops.Tables.cents(col("value"))))
      .as[(Long, Long, Long, Long)].collect().head
    val got = run("quality_observe_metrics")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === direct)
  }

  test("ANALYZE TABLE stats land in the optimizer (rowCount + column stats)") {
    val (to, _) = sources.Formats.bucketedPair(spark, sf0001)
    spark.sql(s"ANALYZE TABLE $to COMPUTE STATISTICS FOR COLUMNS o_custkey")
    // cost-based estimates (rowCount / column stats) are propagated only
    // under CBO — without it the optimizer consumes size-in-bytes alone
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table(to).queryExecution.optimizedPlan.stats
      val n = ops.Tables.orders(spark, sf0001).count()
      assert(stats.rowCount === Some(BigInt(n)),
        s"ANALYZE rowCount ${stats.rowCount} != $n")
      assert(stats.attributeStats.nonEmpty, "no column stats after ANALYZE FOR COLUMNS")
      val cstat = stats.attributeStats.head._2
      assert(cstat.distinctCount.exists(_ > 0), "distinctCount missing")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("bucketed co-located join: no shuffle exchange on either side, result exact") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (to, tc) = sources.Formats.bucketedPair(spark, sf0001)
      val joined = spark.table(to)
        .join(spark.table(tc), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(ops.Tables.cents(col("o_totalprice"))).as("sum_cents"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the join itself must consume the bucket layout: the only allowed
      // exchange is the one AFTER the join feeding the final aggregate
      val joinPart = plan.split("SortMergeJoin").last
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"join inputs re-shuffled despite bucketing:\n$plan")
      val naive = ops.Tables.orders(spark, sf0001)
        .join(ops.Tables.customer(spark, sf0001),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(ops.Tables.cents(col("o_totalprice"))).as("sum_cents"))
        .as[(String, Long, Long)].collect().toSet
      assert(joined.as[(String, Long, Long)].collect().toSet === naive)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
