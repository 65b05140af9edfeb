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

  test("modularity: integer-exact Q matches brute force off the operator's own labels") {
    val (_, und) = undirected()
    val lab = run("graph_label_propagation").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = und.size.toLong
    val eIn = und.count { case (u, v) => lab(u) == lab(v) }.toLong
    val deg = und.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sumD2 = deg.toSeq.groupBy { case (n, _) => lab(n) }
      .map { case (_, ds) => val d = ds.map(_._2).sum; d * d }.sum
    val row = run("graph_modularity").collect().head
    assert(row.getLong(0) === m)
    assert(row.getLong(1) === eIn)
    assert(row.getLong(2) === lab.values.toSet.size.toLong)
    assert(row.getLong(3) === 4 * m * eIn - sumD2)
    assert(row.getLong(4) === 4 * m * m)
    // the md5-derived link graph is a RANDOM graph — the honest modularity
    // of any partition of it is ≈ 0 (no community structure to find), so
    // the meaningful invariant is |Q| small, not Q large
    assert(math.abs(row.getLong(3).toDouble / row.getLong(4)) < 0.05,
      "random graph modularity should be near zero")
  }

  test("per-community cap: <= 2 rows per community, each the community's quality argmax") {
    val lab = run("graph_label_propagation").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qmap = SparkEntry.queries("text_quality_score")(spark, sf0001)
      .select(col("doc_id"), col("quality_score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = run("sample_cap_per_community").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // per community: at most 2 kept, ranks are 1..k, and they are the
    // exact argmax under (quality desc, doc_id asc)
    got.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.length <= 2)
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length).map(_.toLong))
      val members = lab.filter(_._2 == c).keys.toSeq
      val best = members.sortBy(d => (-qmap(d), d)).take(rows.length)
      assert(rows.sortBy(_._4).map(_._1).toSeq === best)
    }
    // every kept doc carries its own corpus quality score
    got.foreach { case (d, _, q, _) => assert(q === qmap(d)) }
  }

  test("hard negatives: top-3 cross-label neighbors with the true positive margin") {
    val emb = ops.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT))"))
      .as[(Long, Int, Seq[Long])].collect()
    def cos(a: Seq[Long], b: Seq[Long]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val got = run("sim_hard_negatives").collect()
      .map(r => ((r.getLong(0), r.getInt(4).toLong),
        (r.getLong(1), r.getInt(2), r.getDouble(3), r.getDouble(5))))
      .toMap
    val queries = emb.filter(_._1 % 50 == 0)
    queries.foreach { case (qid, qlab, qv) =>
      val others = emb.filter(_._1 != qid)
      val negs = others.filter(_._2 != qlab)
        .map { case (id, l, v) => (id, l, cos(qv, v)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(3)
      val posMax = others.filter(_._2 == qlab).map { case (_, _, v) => cos(qv, v) }.max
      negs.zipWithIndex.foreach { case ((id, l, c), i) =>
        val (gid, glab, gcos, gpos) = got((qid, i + 1L))
        assert(gid === id && glab === l)
        assert(math.abs(gcos - c) < 1e-12)
        assert(math.abs(gpos - posMax) < 1e-12)
      }
    }
    // the mined negatives must be HARD: some negative beats the positive
    assert(got.exists { case (_, (_, _, c, pos)) => c > pos },
      "no negative inside the positive margin — the regime is trivial")
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
