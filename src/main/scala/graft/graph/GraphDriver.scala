package graft.graph

import scala.collection.mutable

/** Driver-side twins of the [[GraphOps]] fixed-iteration loops (r15,
  * guide §1.2-1/§2.6): below [[GraphOps.DriverGraphEdges]] the derived
  * link graph is collected (the edge list IS computed by the same
  * Catalyst expressions as the distributed regime — no re-derivation on
  * the driver, so the arithmetic is identical by construction) and the
  * iterations run as local integer loops in microseconds instead of
  * `Iters × (join + groupBy + left-join)` sequential stage barriers.
  *
  * Every function mirrors its distributed twin operation-for-operation in
  * the SAME scaled-integer arithmetic (all operands non-negative, so
  * Java `/`/`%` coincide with Spark's `div`/`%`); results are therefore
  * bit-identical under either regime — GraphDriverRegimeSpec pins each
  * pair value-equal at a real SF, and the DuckDB oracle hash-checks the
  * registered queries end to end.
  *
  * Inputs: `ids` = every node id (each node emits [[GraphOps.OutDeg]]
  * out-links, so ids = distinct edge sources); `edges` = the collected
  * (src, dst) list. Memory bound: 1 M edges ≈ 16 MB — the broadcast
  * small-side budget applied to the graph axis (the
  * [[graft.llm.Dedup.DriverCcEdges]] doctrine).
  */
private[graph] object GraphDriver {

  /** Undirected edge set (u < v, self-loops dropped, distinct). */
  def undirected(edges: Array[(Long, Long)]): mutable.LinkedHashSet[(Long, Long)] = {
    val s = mutable.LinkedHashSet.empty[(Long, Long)]
    edges.foreach { case (a, b) =>
      if (a != b) s += (if (a < b) (a, b) else (b, a))
    }
    s
  }

  /** Adjacency (both directions) of the undirected set: each neighbor
    * once per node. */
  def adjacencyOf(und: Iterable[(Long, Long)]): mutable.HashMap[Long, mutable.ArrayBuffer[Long]] = {
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    und.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, mutable.ArrayBuffer.empty) += v
      adj.getOrElseUpdate(v, mutable.ArrayBuffer.empty) += u
    }
    adj
  }

  /** Scaled-integer PageRank: pr0 = S/n; per round insum(dst) = Σ pr(src)/outDeg,
    * pr = 15·(S/n)/100 + damp·insum/100. Mirrors the graph_pagerank loop. */
  def pagerank(ids: Array[Long], edges: Array[(Long, Long)], scale: Long,
      outDeg: Int, iters: Int, dampPct: Long): Seq[(Long, Long)] = {
    val n = ids.length.toLong
    val base = 15L * (scale / n) / 100L
    var pr = mutable.HashMap.empty[Long, Long]
    ids.foreach(id => pr(id) = scale / n)
    (1 to iters).foreach { _ =>
      val insum = mutable.HashMap.empty[Long, Long]
      edges.foreach { case (s, d) =>
        insum(d) = insum.getOrElse(d, 0L) + pr(s) / outDeg
      }
      val next = mutable.HashMap.empty[Long, Long]
      ids.foreach { id =>
        next(id) = base + dampPct * insum.getOrElse(id, 0L) / 100L
      }
      pr = next
    }
    ids.map(id => (id, pr(id))).toSeq
  }

  /** Personalized PageRank over the % 97 seed set — the graph_ppr loop. */
  def ppr(ids: Array[Long], edges: Array[(Long, Long)], scale: Long,
      outDeg: Int, iters: Int, dampPct: Long): Seq[(Long, Long)] = {
    val ns = ids.count(_ % 97 == 0).toLong
    require(ns > 0, "ppr driver regime requires a non-empty seed set")
    def isSeed(id: Long): Boolean = id % 97 == 0
    val seedInit = scale / ns
    val seedBase = 15L * (scale / ns) / 100L
    var pr = mutable.HashMap.empty[Long, Long]
    ids.foreach(id => pr(id) = if (isSeed(id)) seedInit else 0L)
    (1 to iters).foreach { _ =>
      val insum = mutable.HashMap.empty[Long, Long]
      edges.foreach { case (s, d) =>
        insum(d) = insum.getOrElse(d, 0L) + pr(s) / outDeg
      }
      val next = mutable.HashMap.empty[Long, Long]
      ids.foreach { id =>
        val b = if (isSeed(id)) seedBase else 0L
        next(id) = b + dampPct * insum.getOrElse(id, 0L) / 100L
      }
      pr = next
    }
    ids.map(id => (id, pr(id))).toSeq
  }

  /** HITS mutual reinforcement with per-round max normalization — the
    * graph_hits loop: (doc_id, auth_scaled, hub_scaled). */
  def hits(ids: Array[Long], edges: Array[(Long, Long)], hitsScale: Long,
      iters: Int): Seq[(Long, Long, Long)] = {
    var h = mutable.HashMap.empty[Long, Long]
    ids.foreach(id => h(id) = hitsScale)
    var a = mutable.HashMap.empty[Long, Long]
    (1 to iters).foreach { _ =>
      val asum = mutable.HashMap.empty[Long, Long]
      edges.foreach { case (s, d) =>
        asum(d) = asum.getOrElse(d, 0L) + h.getOrElse(s, 0L)
      }
      // a is total over nodes (left join + coalesce 0); normalize by max
      var amax = 0L
      ids.foreach(id => amax = math.max(amax, asum.getOrElse(id, 0L)))
      val aN = mutable.HashMap.empty[Long, Long]
      ids.foreach(id => aN(id) = asum.getOrElse(id, 0L) * hitsScale / amax)
      // hub: sum of normalized authority over out-neighbors (inner on src)
      val hsum = mutable.HashMap.empty[Long, Long]
      edges.foreach { case (s, d) =>
        hsum(s) = hsum.getOrElse(s, 0L) + aN.getOrElse(d, 0L)
      }
      var hmax = 0L
      hsum.valuesIterator.foreach(v => hmax = math.max(hmax, v))
      val hN = mutable.HashMap.empty[Long, Long]
      hsum.foreach { case (id, v) => hN(id) = v * hitsScale / hmax }
      a = aN; h = hN
    }
    ids.map(id => (id, a.getOrElse(id, 0L), h.getOrElse(id, 0L))).toSeq
  }

  /** Multi-source BFS (seeds: id % 97 == 0), fixed relaxation rounds —
    * the graph_bfs_hops loop; only reached nodes appear. */
  def bfs(ids: Array[Long], edges: Array[(Long, Long)], maxHops: Int): Seq[(Long, Long)] = {
    var dist = mutable.HashMap.empty[Long, Long]
    ids.foreach(id => if (id % 97 == 0) dist(id) = 0L)
    (1 to maxHops).foreach { _ =>
      val next = mutable.HashMap.empty[Long, Long]
      dist.foreach { case (n, dd) => next(n) = dd } // keep-old leg
      edges.foreach { case (s, d) =>
        dist.get(s).foreach { ds =>
          val cand = ds + 1
          if (next.get(d).forall(_ > cand)) next(d) = cand
        }
      }
      dist = next
    }
    dist.toSeq
  }

  /** k-core peel over the undirected graph — the graph_kcore loop:
    * (doc_id, within-core degree) for core members with ≥ 1 core
    * neighbor (the distributed groupBy-on-join shape). */
  def kcore(ids: Array[Long], edges: Array[(Long, Long)], k: Int,
      rounds: Int): Seq[(Long, Long)] = {
    val und = undirected(edges)
    val adj = adjacencyOf(und)
    var alive = mutable.HashSet.empty[Long]
    ids.foreach(alive += _)
    (1 to rounds).foreach { _ =>
      val next = mutable.HashSet.empty[Long]
      adj.foreach { case (u, ns) =>
        if (ns.count(alive.contains) >= k) next += u
      }
      alive = next
    }
    adj.iterator.flatMap { case (u, ns) =>
      if (!alive.contains(u)) None
      else {
        val deg = ns.count(alive.contains)
        if (deg >= 1) Some((u, deg.toLong)) else None
      }
    }.toSeq
  }

  /** Deterministic synchronous LPA (most frequent neighbor label, ties to
    * MIN label; isolated nodes keep their own) — the labelPropagation
    * loop: (doc_id, lab). */
  def lpa(ids: Array[Long], edges: Array[(Long, Long)], rounds: Int): Seq[(Long, Long)] = {
    val adj = adjacencyOf(undirected(edges))
    var lab = mutable.HashMap.empty[Long, Long]
    ids.foreach(id => lab(id) = id)
    (1 to rounds).foreach { _ =>
      val next = mutable.HashMap.empty[Long, Long]
      ids.foreach { id =>
        adj.get(id) match {
          case Some(ns) if ns.nonEmpty =>
            val cnt = mutable.HashMap.empty[Long, Long]
            ns.foreach { b =>
              val l = lab(b); cnt(l) = cnt.getOrElse(l, 0L) + 1L
            }
            // max count, ties to smallest label
            var bestLab = Long.MaxValue; var bestCnt = -1L
            cnt.foreach { case (l, c) =>
              if (c > bestCnt || (c == bestCnt && l < bestLab)) { bestLab = l; bestCnt = c }
            }
            next(id) = bestLab
          case _ => next(id) = lab(id)
        }
      }
      lab = next
    }
    ids.map(id => (id, lab(id))).toSeq
  }

  /** Modularity of the LPA partition in exact integer arithmetic — the
    * graph_modularity one-row result. */
  def modularity(ids: Array[Long], edges: Array[(Long, Long)], lpaRounds: Int)
      : (Long, Long, Long, Long, Long, Double) = {
    val lab = lpa(ids, edges, lpaRounds).toMap
    val und = undirected(edges)
    val m = und.size.toLong
    var eIn = 0L
    und.foreach { case (u, v) => if (lab(u) == lab(v)) eIn += 1 }
    val deg = mutable.HashMap.empty[Long, Long]
    und.foreach { case (u, v) =>
      deg(u) = deg.getOrElse(u, 0L) + 1; deg(v) = deg.getOrElse(v, 0L) + 1
    }
    val dPerLab = mutable.HashMap.empty[Long, Long]
    deg.foreach { case (node, dd) =>
      val l = lab(node); dPerLab(l) = dPerLab.getOrElse(l, 0L) + dd
    }
    var sumD2 = 0L
    dPerLab.valuesIterator.foreach(d2 => sumD2 += d2 * d2)
    val nc = lab.valuesIterator.toSet.size.toLong
    val qNum = 4L * m * eIn - sumD2
    val qDen = 4L * m * m
    (m, eIn, nc, qNum, qDen, qNum.toDouble / qDen.toDouble)
  }

  /** Per-node triangle counts via the degree-ordered wedge enumeration —
    * the graph_triangles shape: (doc_id, n_triangles), corners only. */
  def triangleCounts(edges: Array[(Long, Long)]): mutable.HashMap[Long, Long] = {
    val und = undirected(edges)
    val undSet = und // membership checks
    val deg = mutable.HashMap.empty[Long, Long]
    und.foreach { case (u, v) =>
      deg(u) = deg.getOrElse(u, 0L) + 1; deg(v) = deg.getOrElse(v, 0L) + 1
    }
    val out = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    und.foreach { case (u, v) =>
      val lower = deg(u) < deg(v) || (deg(u) == deg(v) && u < v)
      val (a, b) = if (lower) (u, v) else (v, u)
      out.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
    }
    val tri = mutable.HashMap.empty[Long, Long]
    def bump(x: Long): Unit = tri(x) = tri.getOrElse(x, 0L) + 1
    out.foreach { case (a, bs) =>
      val srt = bs.sorted
      var i = 0
      while (i < srt.length) {
        var j = i + 1
        while (j < srt.length) {
          val y = srt(i); val z = srt(j)
          val key = if (y < z) (y, z) else (z, y)
          if (undSet.contains(key)) { bump(a); bump(y); bump(z) }
          j += 1
        }
        i += 1
      }
    }
    tri
  }

  /** Local clustering coefficient in exact ppm over deg ≥ 2 nodes —
    * the graph_clustering_coeff output: (doc_id, deg, n_tri, cc_ppm). */
  def clusteringCoeff(edges: Array[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    val und = undirected(edges)
    val deg = mutable.HashMap.empty[Long, Long]
    und.foreach { case (u, v) =>
      deg(u) = deg.getOrElse(u, 0L) + 1; deg(v) = deg.getOrElse(v, 0L) + 1
    }
    val tri = triangleCounts(edges)
    deg.iterator.collect { case (node, dd) if dd >= 2 =>
      val t = tri.getOrElse(node, 0L)
      (node, dd, t, 2L * t * 1000000L / (dd * (dd - 1)))
    }.toSeq
  }

  /** Resource-allocation link prediction with hub suppression — the
    * graph_link_prediction top-20: (u, v, ra_scaled, n_common). */
  def linkPrediction(edges: Array[(Long, Long)], hubCap: Long): Seq[(Long, Long, Long, Long)] = {
    val und = undirected(edges)
    val adj = adjacencyOf(und)
    val deg = mutable.HashMap.empty[Long, Long]
    und.foreach { case (u, v) =>
      deg(u) = deg.getOrElse(u, 0L) + 1; deg(v) = deg.getOrElse(v, 0L) + 1
    }
    val acc = mutable.HashMap.empty[(Long, Long), (Long, Long)]
    adj.foreach { case (z, ns) =>
      val dz = deg(z)
      if (dz <= hubCap) {
        val w = 1000000L / dz
        val srt = ns.sorted
        var i = 0
        while (i < srt.length) {
          var j = i + 1
          while (j < srt.length) {
            val key = (srt(i), srt(j))
            if (!und.contains(key)) {
              val (sw, c) = acc.getOrElse(key, (0L, 0L))
              acc(key) = (sw + w, c + 1)
            }
            j += 1
          }
          i += 1
        }
      }
    }
    acc.iterator.map { case ((u, v), (sw, c)) => (u, v, sw, c) }.toSeq
      .sortBy { case (u, v, sw, _) => (-sw, u, v) }
      .take(20)
  }
}
