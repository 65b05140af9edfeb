package graft

import org.apache.spark.sql.functions._

/** Semantic postconditions for the round-7b operators: k-core peel, Bloom
  * decontamination, k-anonymity audit, source-vocabulary overlap, and the
  * status-channel RLE. The DuckDB hash gate proves engine agreement; these
  * prove the SEMANTICS by independent (mostly driver-side brute-force)
  * recompute at sf0.001.
  */
class OpsR7bSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("k-core: fixed-round peel equals the fully-converged core and its degrees") {
    // rebuild the derived undirected graph exactly as GraphOps does
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
      .as[(Long, Long)].collect()
    val adj = und.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // peel to FULL convergence (no round bound) — the operator's 6 rounds
    // must land on this exact fixed point or the round count is too low
    var alive = docs.as[Long].collect().toSet
    var changed = true
    while (changed) {
      val next = alive.filter(u => adj.getOrElse(u, Set.empty[Long]).count(alive) >= 4)
      changed = next != alive
      alive = next
    }
    val expected = alive.map(u => u -> adj(u).count(alive).toLong).toMap
    val got = run("graph_kcore").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.values.forall(_ >= 4), "every core member keeps >= k in-core neighbors")
  }

  test("bloom decontamination: candidates cover, and confirmations equal, the exact check") {
    val exact = run("decontaminate").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // doc_id -> n_shared_shingles
    val bloom = run("decontaminate_bloom").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val confirmed = bloom.filter(_._3 > 0).map(b => b._1 -> b._3).toMap
    // no false negatives (a Bloom filter can't drop a true member) and no
    // phantom confirmations: confirmed set == the exact operator's output
    assert(confirmed === exact)
    bloom.foreach { case (doc, cand, conf) =>
      assert(cand >= conf, s"doc $doc: candidates $cand < confirmed $conf")
      assert(cand > 0, "rows exist only for docs with at least one bloom hit")
    }
  }

  test("k-anonymity: classes partition the table and at_risk flags k<5 exactly") {
    val rows = run("privacy_k_anonymity").collect()
      .map(r => ((r.getInt(0), r.getString(1), r.getLong(2)), r.getLong(3), r.getLong(4)))
    val customers = ops.Tables.customer(spark, sf0001)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(ops.Tables.cents(col("c_acctbal")) / 50000.0).as("band"))
      .as[(Int, String, Long)].collect()
    val expected = customers.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(r => r._1 -> r._2).toMap === expected)
    assert(rows.map(_._2).sum === customers.length.toLong, "classes partition the table")
    rows.foreach { case (qid, size, risk) =>
      assert(risk === (if (size < 5) 1L else 0L), s"class $qid flag")
    }
  }

  test("source overlap: pairwise vocabulary Jaccard matches a brute-force recompute") {
    val docs = ops.Tables.documents(spark, sf0001)
      .select(col("source"), col("text")).as[(String, String)].collect()
    val vocab = docs.groupBy(_._1).view
      .mapValues(_.flatMap(_._2.split(" ", -1)).toSet).toMap
    val expected = (for {
      a <- vocab.keys; b <- vocab.keys if a < b
      inter = (vocab(a) & vocab(b)).size.toLong if inter > 0
      union = (vocab(a) | vocab(b)).size.toLong
    } yield (a, b) -> (inter, union, inter * 1000000L / union)).toMap
    val got = run("text_source_overlap").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === expected)
  }

  test("quantile normalization: banded global ranks equal the brute-force mapping") {
    // recompute from the registered quality-score query (same shared
    // definition), then derive the expected mapping driver-side
    val qs = SparkEntry.queries("text_quality_score")(spark, sf0001)
      .select(col("doc_id"), round(col("quality_score") * 1e9).cast("long").as("q"))
      .as[(Long, Long)].collect().toMap
    val srcs = ops.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source")).as[(Long, String)].collect().toMap
    val n = qs.size.toLong
    val globalSorted = qs.toSeq.map { case (id, q) => (q, id) }.sorted
    val bySource = srcs.groupBy(_._2).view.mapValues(_.keys.toSeq).toMap
    val expected = bySource.flatMap { case (src, ids) =>
      val ranked = ids.map(id => (qs(id), id)).sorted.zipWithIndex
      val ns = ids.size.toLong
      ranked.map { case ((q, id), i) =>
        val r = i + 1L
        val gidx = math.min(math.max((2 * r - 1) * n / (2 * ns) + 1, 1L), n)
        id -> (src, q, globalSorted((gidx - 1).toInt)._1)
      }
    }
    val got = run("score_quantile_normalize").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === expected)
  }

  test("RLE status: runs losslessly reconstruct the channel, per meter") {
    val raw = SparkEntry.queries("meter_gen_readings")(spark, sf0001)
      .select(col("meter_id"), col("reading_timestamp").cast("long"), col("status"))
      .as[(Int, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val runs = run("meter_rle_status").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(3), r.getLong(4)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(runs.keySet === raw.keySet)
    runs.foreach { case (m, rs) =>
      // run ids are contiguous from 1, adjacent runs change value, and the
      // expansion reproduces the raw sequence exactly (losslessness)
      assert(rs.map(_._2).toSeq === (1L to rs.length).toSeq, s"meter $m run ids")
      rs.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 != b._3, s"meter $m: unmerged adjacent runs")
        case _         =>
      }
      val expanded = rs.flatMap(r => Seq.fill(r._4.toInt)(r._3)).toSeq
      assert(expanded === raw(m), s"meter $m reconstruction")
    }
  }

  test("randomized response: mechanism flips a real minority, estimator recovers prevalence") {
    val r = run("privacy_randomized_response").head
    val n = r.getAs[Long]("n")
    val reported = r.getAs[Long]("reported_yes")
    val trueYes = r.getAs[Long]("true_yes")
    // the estimator the query publishes must be the Warner closed form
    // of its own aggregate (exact-integer recompute)
    val est = math.min(math.max(8 * reported - n, 0L) * 1000000L / (6 * n), 1000000L)
    assert(r.getAs[Long]("est_ppm") === est)
    assert(r.getAs[Long]("true_ppm") === trueYes * 1000000L / n)
    assert(r.getAs[Long]("within_5pp") === 1L,
      "estimate drifted more than 5pp from ground truth")
    // plausible deniability is real: some individuals' reports must
    // differ from their sensitive bit — recompute per-individual reports
    // from the same keyed hash and count actual flips (expected ~1/8 of
    // respondents: the 1/4 dishonest arm times the 1/2 opposite coin)
    val f = ops.Tables.customer(spark, sf0001).select(
      when(ops.Tables.cents(col("c_acctbal")) > 500000L, 1L).otherwise(0L).as("b"),
      graft.functions.Md5Prefix64(
        concat(lit("rr:v1:"), col("c_custkey").cast("string"))).as("h"))
    val flips = f.filter(
      pmod(col("h"), lit(4L)) >= 3 &&
        pmod(expr("h div 4"), lit(2L)) =!= col("b")).count()
    assert(flips > 0, "mechanism never flipped a report — no deniability")
    assert(flips < n / 4, s"flips $flips exceed the dishonest-arm bound ${n / 4}")
    // and the flip accounting closes: reported = true - flips(1->0) + flips(0->1)
    val oneToZero = f.filter(pmod(col("h"), lit(4L)) >= 3 &&
      col("b") === 1L && pmod(expr("h div 4"), lit(2L)) === 0L).count()
    val zeroToOne = f.filter(pmod(col("h"), lit(4L)) >= 3 &&
      col("b") === 0L && pmod(expr("h div 4"), lit(2L)) === 1L).count()
    assert(reported === trueYes - oneToZero + zeroToOne)
  }

  test("temporal split: no time leakage, counts partition the table, overlap is exact") {
    val rows = run("split_temporal").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rows.keySet === Set("train", "eval"))
    val (trN, _, _, trMax, ov) = rows("train")
    val (evN, _, evMin, _, ov2) = rows("eval")
    // both rows carry the same overlap scalar; the splits partition events
    assert(ov === ov2)
    val events = ops.Tables.events(spark, sf0001)
    assert(trN + evN === events.count())
    assert(trN > 0 && evN > 0, "cutoff must split the corpus nontrivially")
    // THE temporal guarantee: every train hour precedes every eval hour
    assert(trMax <= evMin, s"train extends to $trMax past eval start $evMin")
    // overlap equals a brute-force user intersect, and bounds hold
    val cutoff = lit("2024-01-25 00:00:00").cast("timestamp")
    val tr = events.filter(col("ts") < cutoff).select(col("user_id")).distinct()
    val ev = events.filter(col("ts") >= cutoff).select(col("user_id")).distinct()
    assert(ov === tr.intersect(ev).count())
    assert(ov <= math.min(rows("train")._2, rows("eval")._2))
  }
}
