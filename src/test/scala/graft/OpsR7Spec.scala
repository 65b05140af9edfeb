package graft

import org.apache.spark.sql.functions._

/** Semantic postconditions for the round-7 relational/sampling operators:
  * Pareto/ABC banded prefix sum, consistent-hash sampling, market-basket
  * co-occurrence, median/MAD robust scoring. The DuckDB hash gate proves
  * engine agreement; these prove the SEMANTICS by independent recompute. */
class OpsR7Spec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("pareto ABC: banded prefix sum equals a driver-side global cumsum") {
    val rows = run("a_pareto_abc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // recompute the global running share from first principles
    val sorted = rows.sortBy { case (pk, rev, _, _) => (-rev, pk) }
    val total = sorted.map(_._2).sum
    var cum = 0L
    sorted.foreach { case (pk, rev, gotPpm, gotClass) =>
      cum += rev
      val ppm = cum * 1000000L / total
      assert(gotPpm === ppm, s"part $pk cumulative share")
      val cls = if (ppm <= 800000) "A" else if (ppm <= 950000) "B" else "C"
      assert(gotClass === cls, s"part $pk class at $ppm ppm")
    }
    // classes are revenue-ordered: every A-part earns at least as much as
    // every B-part, and B at least C (ties can straddle a boundary, so ≥)
    val byClass = rows.groupBy(_._4).view.mapValues(_.map(_._2)).toMap
    assert(byClass.keySet === Set("A", "B", "C"))
    assert(byClass("A").min >= byClass("B").max)
    assert(byClass("B").min >= byClass("C").max)
  }

  test("consistent-hash sampling: verdicts are run-stable and respect the rates") {
    val a = run("sample_consistent_hash").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val b = run("sample_consistent_hash").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(a.toSet === b.toSet, "two runs must produce identical verdicts")
    a.foreach { case (doc, src, ppm, coin) =>
      assert(ppm >= 100000 && ppm <= 600000, s"rate out of band for $src")
      assert(coin >= 0 && coin < ppm, s"kept doc $doc has coin $coin >= rate $ppm")
    }
    // one rate per source
    assert(a.groupBy(_._2).forall { case (_, g) => g.map(_._3).distinct.length == 1 })
  }

  test("market basket: support counts match a brute-force recompute") {
    val li = ops.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect()
    val byOrder = li.distinct.groupBy(_._1).values
    val expected = byOrder.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length if ps(i) != ps(j))
        yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).filter(_._2 >= 2).toMap
    val got = run("j_market_basket_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected)
  }

  test("count-min sketch: one-sided guarantee holds and the probe set is the exact top-10") {
    val rows = run("a_countmin_sketch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 10)
    // CMS never underestimates: collisions only ADD counts
    rows.foreach { case (u, exact, cms) =>
      assert(cms >= exact, s"user $u: cms $cms under exact $exact")
    }
    // probes are the true top-10 by exact frequency (tie-break user_id)
    val allExact = graft.ops.Tables.events(spark, sf0001)
      .groupBy(col("user_id")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = allExact.sortBy { case (u, n) => (-n, u) }.take(10).toMap
    assert(rows.map(r => r._1 -> r._2).toMap === expected)
  }

  test("MAD scoring: robust_score and flag recompute from med/mad on every row") {
    val rows = run("w14_mad_anomaly").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (delta, med, mad) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      val (score, flag) = (r.getDouble(5), r.getBoolean(6))
      assert(mad > 0, "zero-MAD meters must be excluded (E12 guard)")
      val absdev = math.abs(delta - med)
      assert(score === absdev / (1.4826 * mad))
      assert(flag === (absdev > 4.4478 * mad))
    }
  }
}
