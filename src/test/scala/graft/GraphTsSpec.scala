package graft

import org.apache.spark.sql.functions._

/** Semantic postconditions for the round-6 graph and time-series operators
  * (triangle counting, linear gap interpolation, integer EWMA, seasonal
  * baseline) — brute-force recomputation and physical-invariant checks on
  * top of the DuckDB engine-agreement hash. */
class GraphTsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("triangle counts match a brute-force enumeration of the derived graph") {
    // rebuild the graph exactly as GraphOps derives it (h64(src-k) mod N)
    val n = ops.Tables.documents(spark, sf0001).count()
    val edges = ops.Tables.documents(spark, sf0001)
      .select(col("doc_id").as("src"),
        explode(expr("sequence(1, 3)")).as("k"))
      .select(col("src"),
        (functions.Md5Prefix64(concat(col("src").cast("string"), lit("-"),
          col("k").cast("string"))) % n).as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = edges.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val perNode = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val verts = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    for {
      Seq(a, b, c) <- verts.combinations(3)
      if und(a -> b) && und(a -> c) && und(b -> c)
    } { perNode(a) += 1; perNode(b) += 1; perNode(c) += 1 }
    val got = run("graph_triangles").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === perNode.toMap)
    assert(got.values.sum % 3 === 0) // every triangle credited to 3 corners
  }

  test("linear interpolation: exact on known rows, bounded by neighbors in gaps") {
    val rows = run("ts_interpolate_linear")
      .orderBy(col("meter_id"), col("reading_timestamp")).collect()
    assert(rows.length === 50 * 96)
    // counters are non-decreasing per meter, so every interpolated value
    // must sit between its neighbors; known rows carry the raw counter
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val vals = rs.map(r => (r.getBoolean(2), r.getLong(3)))
      vals.sliding(2).foreach {
        case Array((_, a), (_, b)) => assert(a <= b, "counter must not decrease")
        case _ =>
      }
    }
    val gaps = rows.count(_.getBoolean(2))
    assert(gaps > 0 && gaps < rows.length / 5, s"~10% thinning expected, got $gaps")
  }

  test("EWMA: scaled weights recompute exactly for one meter") {
    val rows = run("w12_ewma_trailing")
      .filter(col("meter_id") === 7)
      .orderBy(col("reading_timestamp")).collect()
    val deltas = rows.map(_.getLong(2))
    val coeffs = (0 until 8).map(k =>
      BigInt(3).pow(k).toLong * BigInt(4).pow(7 - k).toLong)
    rows.zipWithIndex.foreach { case (r, i) =>
      val expected = coeffs.zipWithIndex.map { case (c, k) =>
        if (i - k >= 0) c * deltas(i - k) else 0L
      }.sum
      assert(r.getLong(3) === expected, s"row $i")
    }
  }

  test("seasonal baseline emits only rows outside the [0.5, 1.5] band") {
    val rows = run("w13_seasonal_baseline").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ratio = r.getDouble(4)
      assert(ratio > 1.5 || ratio < 0.5, s"ratio $ratio inside the band")
      // ratio is delta/baseline recomputed
      assert(math.abs(ratio - r.getLong(2) / r.getDouble(3)) < 1e-12)
    }
  }

  test("seasonal baseline excludes an all-zero (meter, slot) group in both engines") {
    // Planted fixture the generator cannot produce: meter 1 slot 0 has
    // deltas {0, 0, 0} → baseline_avg = 0 → ratio undefined. The E12 guard
    // (baseline_avg ≠ 0, mirrored verbatim in the oracle's WHERE) must
    // EXCLUDE those rows — without it Spark's 0/0.0 → NULL silently drops
    // while DuckDB's CASE-free x/0.0 → ±inf passes the > 1.5 branch, the
    // exact latent divergence this fixture pins down. Meter 2 slot 0 is a
    // live control group (deltas {30, 50, 100}, baseline 60: ratios 0.5
    // and 0.8333 stay inside the band, only 100/60 = 1.6667 flags).
    import spark.implicits._
    val known = Seq(
      (1, "2024-01-01T00:00:00", 0L, 0L),
      (1, "2024-01-02T00:00:00", 0L, 0L),
      (1, "2024-01-03T00:00:00", 0L, 0L),
      (2, "2024-01-01T00:00:00", 0L, 30L),
      (2, "2024-01-02T00:00:00", 0L, 50L),
      (2, "2024-01-03T00:00:00", 0L, 100L))
      .toDF("meter_id", "ts", "slot", "delta")
      .select(col("meter_id"), to_timestamp(col("ts")).as("reading_timestamp"),
        col("slot"), col("delta"))
    val out = ops.TimeSeriesExt.seasonalDeviation(known).collect()
    assert(!out.exists(_.getInt(0) == 1), "all-zero baseline group must be excluded")
    val flagged = out.filter(_.getInt(0) == 2)
    assert(flagged.length === 1 && flagged.head.getLong(2) === 100L)
    assert(math.abs(flagged.head.getDouble(4) - 100.0 / 60.0) < 1e-12)
  }

  test("HITS: scores bounded by the scale, max-normalized, mutually consistent") {
    val rows = run("graph_hits").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = ops.Tables.documents(spark, sf0001).count()
    assert(rows.length === n, "one row per node")
    assert(rows.forall { case (_, a, h) => a >= 0 && a <= 1000000 && h >= 0 && h <= 1000000 })
    // max-normalization: at least one node sits AT the scale on each axis
    assert(rows.map(_._2).max === 1000000, "some authority at the scale")
    assert(rows.map(_._3).max === 1000000, "some hub at the scale")
    // authorities concentrate on high in-degree nodes: the top authority
    // must have strictly more in-links than the bottom one
    val edges = ops.Tables.documents(spark, sf0001)
      .select(col("doc_id").as("src"), explode(expr("sequence(1, 3)")).as("k"))
      .select(col("src"),
        (functions.Md5Prefix64(concat(col("src").cast("string"), lit("-"),
          col("k").cast("string"))) % n).as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val indeg = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap.withDefaultValue(0L)
    val topAuth = rows.maxBy(_._2)._1
    val zeroAuth = rows.filter(_._2 == 0).map(_._1)
    assert(indeg(topAuth) > 0)
    assert(zeroAuth.forall(v => indeg(v) == 0), "auth 0 iff unreferenced")
  }

  test("personalized PageRank: mass stays on the seed neighborhood") {
    val rows = run("graph_ppr").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = ops.Tables.documents(spark, sf0001).count()
    assert(rows.size === n)
    assert(rows.values.forall(_ >= 0L))
    val seeds = (0L until n).filter(_ % 97 == 0).toSet
    val base = (15L * (1000000000000L / seeds.size)) / 100
    // every seed keeps at least its restart mass; total stays within the
    // injected mass (floor division only leaks downward)
    assert(seeds.forall(s => rows(s) >= base))
    assert(rows.values.sum <= 1000000000000L)
    // positive rank only within 8 hops of a seed (8 damped rounds)
    val edges = ops.Tables.documents(spark, sf0001)
      .select(col("doc_id").as("src"), explode(expr("sequence(1, 3)")).as("k"))
      .select(col("src"),
        (functions.Md5Prefix64(concat(col("src").cast("string"), lit("-"),
          col("k").cast("string"))) % n).as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj: Map[Long, Seq[Long]] = edges.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq).toMap.withDefaultValue(Seq.empty[Long])
    var reach = seeds
    for (_ <- 1 to 8) reach = reach ++ reach.toSeq.flatMap(adj(_))
    assert(rows.filter(_._2 > 0).keySet.subsetOf(reach),
      "rank mass must not appear outside the seed neighborhood")
  }

  test("BFS hops match a driver-side Dijkstra-free BFS over the derived graph") {
    val n = ops.Tables.documents(spark, sf0001).count()
    val edges = ops.Tables.documents(spark, sf0001)
      .select(col("doc_id").as("src"), explode(expr("sequence(1, 3)")).as("k"))
      .select(col("src"),
        (functions.Md5Prefix64(concat(col("src").cast("string"), lit("-"),
          col("k").cast("string"))) % n).as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj: Map[Long, Seq[Long]] = edges.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq).toMap.withDefaultValue(Seq.empty[Long])
    var dist = (0L until n).filter(_ % 97 == 0).map(_ -> 0L).toMap
    for (hop <- 1 to 4) {
      val reached = dist.filter(_._2 == hop - 1).keys.toSeq
        .flatMap(adj(_)).filterNot(v => dist.contains(v))
      dist = dist ++ reached.map(_ -> hop.toLong)
    }
    val got = run("graph_bfs_hops").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === dist)
  }
}
