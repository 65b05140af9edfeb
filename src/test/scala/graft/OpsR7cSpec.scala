package graft

import org.apache.spark.sql.functions._

/** Semantic postconditions for the round-7c operators: label-propagation
  * communities and the skyline (Pareto frontier). The DuckDB hash gate
  * proves engine agreement; these prove the SEMANTICS by independent
  * driver-side brute force at sf0.001.
  */
class OpsR7cSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  private def undirected(): (Set[Long], Seq[(Long, Long)]) = {
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
      .as[(Long, Long)].collect().toSeq
    (docs.as[Long].collect().toSet, und)
  }

  test("label propagation: 4 synchronous min-tie rounds match brute force and coarsen labels") {
    val (nodes, und) = undirected()
    val adj = und.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab = nodes.map(x => x -> x).toMap
    for (_ <- 1 to 4) {
      val next = nodes.map { x =>
        val nbrs = adj.getOrElse(x, Seq.empty).map(lab)
        if (nbrs.isEmpty) x -> lab(x)
        else {
          val counts = nbrs.groupBy(identity).view.mapValues(_.size).toMap
          // most frequent neighbor label, ties to the MIN label
          x -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }.toMap
      lab = next
    }
    val got = run("graph_label_propagation").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === lab)
    // communities must actually have formed: fewer labels than nodes,
    // and at least one community with >= 3 members
    val sizes = lab.values.groupBy(identity).map(_._2.size)
    assert(sizes.size < nodes.size)
    assert(sizes.max >= 3, "no nontrivial community formed")
  }

  test("skyline: banded prefix-max plan equals the definitional dominance check") {
    val parts = ops.Tables.part(spark, sf0001)
      .select(col("p_partkey"),
        ops.Tables.cents(col("p_retailprice")).as("pc"), col("p_size").cast("long"))
      .as[(Long, Long, Long)].collect().toSeq
    val expected = parts.filter { case (_, pc, sz) =>
      !parts.exists { case (_, qc, qz) =>
        qc <= pc && qz >= sz && (qc < pc || qz > sz)
      }
    }.map { case (pk, pc, sz) => (pk, pc, sz) }.toSet
    val got = run("skyline_pareto_frontier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // frontier invariant: sorted by price, sizes strictly increase
    val sorted = got.toSeq.sortBy(_._2)
    sorted.zip(sorted.tail).foreach { case ((_, c1, s1), (_, c2, s2)) =>
      assert(c1 <= c2 && (c1 == c2 || s1 < s2))
    }
  }
}
