package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The spatial-join contract: the grid-bucketed within-radius self-join
  * equals the brute-force quadratic answer (the 3×3 neighborhood is a
  * complete candidate set when cell size = radius), finds each unordered
  * pair exactly once, and PLANS as an equi-join — no CartesianProduct /
  * BroadcastNestedLoop in the pairs query, which is the whole point of
  * the bucketing at 100 TB. Nearest-site assignment must agree with a
  * per-point brute-force argmin including the site-key tie-break. */
class SpatialSpec extends SparkSpec {
  import spark.implicits._

  // sf0.01 for a non-trivial pair count (sf0.001 has one qualifying pair)
  private val dir = "/root/testdata/sf0.01"

  private def points = {
    import graft.llm.TextHash
    Tables.events(spark, dir).select($"user_id").distinct()
      .select($"user_id",
        pmod(TextHash.h64(concat(lit("px:"), $"user_id".cast("string"))), lit(1000001L)).as("x"),
        pmod(TextHash.h64(concat(lit("py:"), $"user_id".cast("string"))), lit(1000001L)).as("y"))
  }

  test("bucketed within-radius pairs ≡ brute force, each unordered pair once") {
    val got = graft.SparkEntry.queries("spatial_pairs_within_radius")(spark, dir)
      .select($"user_a", $"user_b", $"d2").as[(Long, Long, Long)].collect().toSet
    val p = points.as[(Long, Long, Long)].collect()
    val want = (for {
      (u, xu, yu) <- p; (v, xv, yv) <- p if u < v
      d2 = (xu - xv) * (xu - xv) + (yu - yv) * (yu - yv) if d2 <= 20000L * 20000L
    } yield (u, v, d2)).toSet
    assert(want.nonEmpty, "the fixture radius must produce pairs at sf0.01")
    assert(got === want)
  }

  test("pairs query plans as a cell equi-join: no cartesian; point-point join is hash on cell keys") {
    val plan = graft.SparkEntry.queries("spatial_pairs_within_radius")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(8).mkString("\n"))
    // the point-point candidate join must be an equi HASH/MERGE join keyed
    // on the grid cell — never a nested loop over the point sides
    val joins = plan.linesIterator.filter(_.contains("Join")).toSeq
    assert(joins.exists(l => l.contains("cell_x") && l.contains("cell_y")
        && (l.contains("HashJoin") || l.contains("SortMergeJoin"))),
      joins.mkString("\n"))
    // the only nested-loop allowed is the constant 9-row offsets replication
    val bnl = joins.filter(_.contains("BroadcastNestedLoop"))
    assert(bnl.size <= 1 && bnl.forall(_.contains("Cross")), joins.mkString("\n"))
  }

  test("DBSCAN ≡ brute-force: roles, components, and border min-label tie-break") {
    val p = points.as[(Long, Long, Long)].collect()
    val r2 = 20000L * 20000L
    val nbrs = p.map { case (u, xu, yu) =>
      u -> p.collect { case (v, xv, yv)
        if v != u && (xu - xv) * (xu - xv) + (yu - yv) * (yu - yv) <= r2 => v
      }.toSet
    }.toMap
    val cores = nbrs.filter(_._2.size >= 2).keySet
    // brute components over core-core edges
    var label = cores.map(u => u -> u).toMap
    var changed = true
    while (changed) {
      changed = false
      for (u <- cores; v <- nbrs(u) if cores(v)) {
        val m = math.min(label(u), label(v))
        if (label(u) != m || label(v) != m) {
          label += u -> m; label += v -> m; changed = true
        }
      }
    }
    val want = p.map { case (u, _, _) =>
      if (cores(u)) (u, "core", label(u))
      else {
        val coreNb = nbrs(u).filter(cores)
        if (coreNb.nonEmpty) (u, "border", coreNb.map(label).min)
        else (u, "noise", -1L)
      }
    }.toSet
    val got = graft.SparkEntry.queries("spatial_cluster_dbscan")(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    assert(got === want)
  }

  test("nearest-site rollup ≡ brute-force argmin with site-key tie-break") {
    import graft.llm.TextHash
    val sites = Tables.nation(spark, dir)
      .select($"n_nationkey".cast("long").as("site"),
        pmod(TextHash.h64(concat(lit("sx:"), $"n_nationkey".cast("string"))), lit(1000001L)).as("sx"),
        pmod(TextHash.h64(concat(lit("sy:"), $"n_nationkey".cast("string"))), lit(1000001L)).as("sy"))
      .as[(Long, Long, Long)].collect()
    val want = points.as[(Long, Long, Long)].collect()
      .map { case (_, x, y) =>
        sites.map { case (s, sx, sy) =>
          ((x - sx) * (x - sx) + (y - sy) * (y - sy), s)
        }.min
      }
      .groupBy(_._2).view.mapValues(v =>
        (v.length.toLong, v.map(_._1).min, v.map(_._1).max)).toMap
    val got = graft.SparkEntry.queries("spatial_nearest_site")(spark, dir)
      .select($"site", $"n_users", $"min_d2", $"max_d2")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === want)
  }
}
