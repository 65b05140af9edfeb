package graft.graph

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative GRAPH operators expressed as DataFrame fixed-iteration loops —
  * the crawl-graph side of a training-data pipeline (centrality as a crawl
  * priority / quality prior, as in production crawl schedulers).
  *
  * The corpus has no native hyperlinks, so the link graph is derived
  * DETERMINISTICALLY from the dense doc_id space (every node emits
  * [[OutDeg]] arithmetic out-links). That keeps the operator fully
  * DuckDB-oracle-checkable: the oracle builds the same graph and unrolls
  * the same iterations as chained CTEs.
  *
  * Arithmetic doctrine: PageRank here is SCALED-INTEGER (rank mass in
  * units of 1e-12, floor division everywhere). Integer sums are exact and
  * associative, so the result is bit-identical under any partitioning and
  * any engine — float PageRank would diverge between engines in the last
  * ulps and be un-hashable. The deliberate cost: floor division leaks up
  * to OutDeg-1 units of mass per node per round — bounded, deterministic,
  * and irrelevant at 1e-12 granularity.
  *
  * Scale shape per iteration: one equi-join of the edge list with the
  * current rank vector on src (both keyed by node id — at 100 TB both
  * sides would be pre-bucketed on id so the join reuses partitioning
  * round over round, as the sibling [[graft.llm.Dedup]] label-propagation
  * does), one map-side-combinable groupBy(dst), one left join back onto
  * the node frame for dangling-in nodes. Fixed [[Iters]] rounds ⇒ plan
  * depth is constant; no driver-side convergence loop is needed.
  */
object GraphOps {

  /** Rank mass scale: total mass ≈ 1e12 split over N nodes. */
  private val Scale = 1000000000000L
  private val OutDeg = 3
  private val Iters = 8
  /** Damping 0.85 as an integer percentage. */
  private val DampPct = 85L
  /** HITS: score scale (units of 1e-6) and mutual-reinforcement rounds. */
  private val HitsScale = 1000000L
  private val HitsIters = 4
  /** BFS: fixed relaxation depth. */
  private val BfsMaxHops = 4
  /** k-core: degree threshold and peel rounds (fixed-point verified by
    * GraphR7Spec: one extra round changes nothing at sf0.01/sf0.1). */
  private val KCoreK = 4
  private val KCoreRounds = 6
  /** Label propagation: synchronous rounds (fixed-point checked by spec). */
  private val LpaRounds = 4
  /** Per-community curation cap (docs kept per link community). */
  private val CapPerCommunity = 2
  /** Link prediction: wedge centers with degree above this cap are
    * skipped (hub suppression — each contributes < 1e6/cap per wedge,
    * negligible RA mass, and caps the wedge fan-out at cap² per center). */
  private val RaHubCap = 32L

  /** Synthetic out-links of one node over a dense 0..N-1 id space:
    * dst_k = md5-hash64("src-k") mod N for k = 1..OutDeg. The hash (not
    * affine arithmetic — an affine map with gcd(31, N) = 1 is a bijection
    * per k, which makes the graph in-regular and PageRank uniform) gives
    * Poisson-distributed in-degrees, so ranks genuinely differ. */
  private def edgeDstSql(src: String, k: String): String =
    s"CAST('0x' || substr(md5(($src) || '-' || ($k)), 1, 15) AS BIGINT) " +
      s"% (SELECT n FROM n)"

  /** Driver-regime bound (r15, guide §1.2-1/§2.6): below this edge count
    * the derived link graph is collected and every fixed-iteration loop
    * runs locally in microseconds instead of `Iters × (join + groupBy +
    * left-join)` sequential stage barriers — ProfileOne showed the graph
    * family latency-bound (cpu/wall 1.5-3.0 on 32 cores) at ~14 s of
    * bench wall over KB-sized frames. 1 M edges ≈ 16 MB on the driver,
    * the broadcast small-side budget applied to the graph axis (the
    * [[graft.llm.Dedup.DriverCcEdges]] doctrine). Above the bound the
    * distributed loops below run unchanged; GraphDriverRegimeSpec pins
    * both regimes value-identical per operator. */
  private[graft] val DriverGraphEdges = 1000000L

  /** Collect the provably small derived graph: the edge list comes from
    * the SAME [[edgesOf]] Catalyst expressions as the distributed regime
    * (no driver-side re-derivation of the md5 arithmetic), and the node
    * list is recovered as the distinct edge sources (every node emits
    * exactly [[OutDeg]] out-links). None above [[DriverGraphEdges]]. */
  private def smallGraphOf(s: org.apache.spark.sql.SparkSession, d: String)
      : Option[(Array[Long], Array[(Long, Long)])] = {
    val nodes = Tables.documents(s, d).select(col("doc_id"))
    val n = nodes.count()
    if (n == 0 || n * OutDeg > DriverGraphEdges) None
    else {
      val nRow = broadcast(nodes.agg(count(lit(1)).as("n")))
      val edges = edgesOf(nodes, nRow).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      edges.foreach { case (src, _) => seen.add(src) }
      val ids = Array.ofDim[Long](seen.size)
      val it = seen.iterator(); var i = 0
      while (it.hasNext) { ids(i) = it.next(); i += 1 }
      Some((ids, edges))
    }
  }

  /** The derived directed edge list over a nodes frame (see class doc):
    * dst_k = h64(src "-" k) mod N, k = 1..[[OutDeg]]. `nRow` is the
    * broadcast 1-row count aggregate. */
  private def edgesOf(nodes: DataFrame, nRow: DataFrame): DataFrame =
    nodes
      .crossJoin(nRow)
      .select(col("doc_id").as("src"),
        explode(expr(s"sequence(1, $OutDeg)")).as("k"), col("n"))
      .select(col("src"),
        (graft.functions.Md5Prefix64(
          concat(col("src").cast("string"), lit("-"), col("k").cast("string")))
          % col("n")).as("dst"))

  /** Oracle CTE twin of [[edgesOf]] (expects CTEs `n` and `nodes`). */
  private val edgesSqlCte: String =
    s"""edges AS (
       |  SELECT doc_id AS src, ${edgeDstSql("doc_id", "k")} AS dst
       |  FROM nodes CROSS JOIN (SELECT unnest(generate_series(1, $OutDeg)) AS k))""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    q("graph_pagerank", {
      val base = s"(15 * ($Scale // (SELECT n FROM n))) // 100"
      val iterCtes = (1 to Iters).map { i =>
        s"""pr$i AS (
           |  SELECT nodes.doc_id,
           |    $base + ($DampPct * COALESCE(s.insum, 0)) // 100 AS pr
           |  FROM nodes LEFT JOIN (
           |    SELECT e.dst AS doc_id, SUM(p.pr // $OutDeg) AS insum
           |    FROM edges e JOIN pr${i - 1} p ON e.src = p.doc_id GROUP BY 1) s
           |  USING (doc_id))""".stripMargin
      }.mkString(",\n")
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |nodes AS (SELECT doc_id FROM documents),
         |$edgesSqlCte,
         |pr0 AS (SELECT doc_id, $Scale // (SELECT n FROM n) AS pr FROM nodes),
         |$iterCtes
         |SELECT doc_id, CAST(pr AS BIGINT) AS pr_scaled FROM pr$Iters""".stripMargin
    }) { (s, d) =>
      smallGraphOf(s, d) match {
        case Some((ids, es)) =>
          import s.implicits._
          s.createDataset(GraphDriver.pagerank(ids, es, Scale, OutDeg, Iters, DampPct))
            .toDF("doc_id", "pr_scaled")
        case None => pagerankDistributed(s, d)
      }
    },

    // ---- per-node TRIANGLE counts over the same derived link graph —
    // the clustering-coefficient numerator (spam/community structure
    // signal in crawl curation). Algorithm: degree-ordered node-iterator
    // (Suri & Vassilvitskii, WWW 2011 / Cohen's MapReduce form): orient
    // every undirected edge from its lower-(degree, id) endpoint to the
    // higher one — out-degrees are then O(√m)-bounded, so the wedge
    // self-join cannot blow up on hubs (the id-oriented variant would put
    // a hub's whole neighborhood on one side). A wedge (a→b, a→c), b<c,
    // closes iff {b,c} is an edge — checked against the u<v undirected
    // set with a pure EQUI-join (no OR-of-orientations theta join). Every
    // join key is a node id or id pair: hash-partitionable, no window, no
    // driver state. Each triangle is found exactly once (from its unique
    // lowest-ordered vertex) and credited to all three corners.
    q("graph_triangles", {
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |nodes AS (SELECT doc_id FROM documents),
         |$edgesSqlCte,
         |und AS (
         |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM edges WHERE src <> dst),
         |deg AS (
         |  SELECT node, COUNT(*) AS deg FROM (
         |    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
         |  GROUP BY 1),
         |ori AS (
         |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
         |           THEN u ELSE v END AS a,
         |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
         |           THEN v ELSE u END AS b
         |  FROM und JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
         |tri AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM ori e1 JOIN ori e2 ON e1.a = e2.a AND e1.b < e2.b
         |  JOIN und e3 ON e3.u = e1.b AND e3.v = e2.b),
         |corners AS (
         |  SELECT x AS doc_id FROM tri
         |  UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
         |FROM corners GROUP BY 1""".stripMargin
    }) { (s, d) =>
      smallGraphOf(s, d) match {
        case Some((_, es)) =>
          import s.implicits._
          s.createDataset(GraphDriver.triangleCounts(es).toSeq)
            .toDF("doc_id", "n_triangles")
        case None => trianglesDistributed(s, d)
      }
    },

    // ---- PERSONALIZED PageRank (random walk with restart) over the same
    // derived link graph: teleport mass returns only to the doc_id % 97
    // seed set (the BFS query's crawl seeds), so scores measure relevance
    // TO THAT SEED CRAWL rather than global centrality — the "expand this
    // topical crawl" priority, and the graph-side complement of the
    // seed-hop distances. Identical fixed-round scaled-integer shape as
    // graph_pagerank (one edge⋈rank equi-join + one map-side-combinable
    // groupBy + one dangling left join per round, [[Iters]] unrolled
    // rounds, floor division throughout); only the restart vector
    // changes. Non-seed nodes unreachable from any seed converge to
    // exactly 0 in both engines.
    q("graph_ppr", {
      val base = s"CASE WHEN nodes.doc_id % 97 = 0 " +
        s"THEN (15 * ($Scale // (SELECT ns FROM ns))) // 100 ELSE 0 END"
      val iterCtes = (1 to Iters).map { i =>
        s"""pp$i AS (
           |  SELECT nodes.doc_id,
           |    $base + ($DampPct * COALESCE(s.insum, 0)) // 100 AS pr
           |  FROM nodes LEFT JOIN (
           |    SELECT e.dst AS doc_id, SUM(p.pr // $OutDeg) AS insum
           |    FROM edges e JOIN pp${i - 1} p ON e.src = p.doc_id GROUP BY 1) s
           |  USING (doc_id))""".stripMargin
      }.mkString(",\n")
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM documents WHERE doc_id % 97 = 0),
         |nodes AS (SELECT doc_id FROM documents),
         |$edgesSqlCte,
         |pp0 AS (
         |  SELECT doc_id, CASE WHEN doc_id % 97 = 0
         |    THEN $Scale // (SELECT ns FROM ns) ELSE 0 END AS pr
         |  FROM nodes),
         |$iterCtes
         |SELECT doc_id, CAST(pr AS BIGINT) AS ppr_scaled FROM pp$Iters""".stripMargin
    }) { (s, d) =>
      smallGraphOf(s, d) match {
        // the driver twin divides by the seed count — route the (never
        // observed) empty-seed-set edge case to the distributed regime,
        // whose null semantics are the pinned ones
        case Some((ids, es)) if ids.exists(_ % 97 == 0) =>
          import s.implicits._
          s.createDataset(GraphDriver.ppr(ids, es, Scale, OutDeg, Iters, DampPct))
            .toDF("doc_id", "ppr_scaled")
        case _ => pprDistributed(s, d)
      }
    },

    // ---- HITS hubs & authorities (Kleinberg, JACM 1999) over the same
    // derived link graph — the second classic centrality, ranking PAGES
    // (authorities) separately from LINK HUBS; in crawl curation the hub
    // score prioritizes frontier expansion while the authority score is a
    // quality prior, complementing PageRank's single blended score.
    // Fixed [[HitsIters]] mutual-reinforcement rounds in SCALED-INTEGER
    // arithmetic (units of 1e-6, the PageRank doctrine): each round
    // re-normalizes both vectors by their MAX via a broadcast 1-row
    // aggregate + floor division — exact, associative, bit-identical to
    // the oracle's unrolled CTEs regardless of partitioning. Per round:
    // two edge⋈score equi-joins + two map-side-combinable groupBys + two
    // 1-row max aggregates; no windows, no driver state. At 100 TB the
    // edge list and score vector are both id-keyed — pre-bucketed on id
    // the joins reuse partitioning round over round. (Caveat recorded:
    // the a*1e6 rescale bounds at indeg_max*1e12, safe in BIGINT up to
    // ~1e6 in-degree; beyond that normalize by sum-shifted arithmetic.)
    q("graph_hits", {
      // each CTE references its predecessor exactly ONCE (normalization
      // via MAX() OVER (), not a scalar subquery): DuckDB inlines CTEs,
      // so a double reference doubles the expanded plan per round —
      // exponential in rounds. Single references keep the chain linear.
      val iterCtes = (1 to HitsIters).map { i =>
        s"""a$i AS (
           |  SELECT nodes.doc_id, COALESCE(s.asum, 0) AS a
           |  FROM nodes LEFT JOIN (
           |    SELECT e.dst AS doc_id, SUM(h.h) AS asum
           |    FROM edges e JOIN hn${i - 1} h ON e.src = h.doc_id GROUP BY 1) s
           |  USING (doc_id)),
           |an$i AS (
           |  SELECT doc_id, (a * $HitsScale) // MAX(a) OVER () AS a FROM a$i),
           |h$i AS (
           |  SELECT e.src AS doc_id, SUM(an.a) AS hsum
           |  FROM edges e JOIN an$i an ON e.dst = an.doc_id GROUP BY 1),
           |hn$i AS (
           |  SELECT doc_id, (hsum * $HitsScale) // MAX(hsum) OVER () AS h FROM h$i)""".stripMargin
      }.mkString(",\n")
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |nodes AS (SELECT doc_id FROM documents),
         |$edgesSqlCte,
         |hn0 AS (SELECT doc_id, $HitsScale AS h FROM nodes),
         |$iterCtes
         |SELECT nodes.doc_id,
         |  CAST(COALESCE(a.a, 0) AS BIGINT) AS auth_scaled,
         |  CAST(COALESCE(h.h, 0) AS BIGINT) AS hub_scaled
         |FROM nodes
         |LEFT JOIN an$HitsIters a USING (doc_id)
         |LEFT JOIN hn$HitsIters h USING (doc_id)""".stripMargin
    }) { (s, d) =>
      smallGraphOf(s, d) match {
        case Some((ids, es)) =>
          import s.implicits._
          s.createDataset(GraphDriver.hits(ids, es, HitsScale, HitsIters))
            .toDF("doc_id", "auth_scaled", "hub_scaled")
        case None => hitsDistributed(s, d)
      }
    },

    // ---- multi-source BFS hop distance over the derived link graph —
    // the frontier/recrawl-depth operator (how many hops from the seed
    // set is each document?). Seeds: doc_id % 97 = 0. Fixed [[BfsMaxHops]]
    // relaxation rounds, each ONE edge⋈dist equi-join + one min-groupBy —
    // the standard MapReduce BFS; a round only ever shuffles the reached
    // frontier, never the corpus. Unreached nodes are absent from the
    // output (no sentinel ∞ row to keep engines trivially identical).
    // The oracle unrolls the identical rounds as chained CTEs, so both
    // engines relax exactly [[BfsMaxHops]] times.
    q("graph_bfs_hops", {
      // relaxation over a SELF-LOOP-augmented weighted edge list (w=0 on
      // the loop, 1 otherwise): min(keep-old, via-neighbor) becomes ONE
      // join, so each round references its predecessor CTE exactly once —
      // DuckDB inlines CTEs, and a round that read d(i-1) twice would
      // expand the plan 2^rounds-fold (same doctrine as graph_hits).
      val iterCtes = (1 to BfsMaxHops).map { i =>
        s"""d$i AS (
           |  SELECT e.dst AS node, MIN(p.dist + e.w) AS dist
           |  FROM eplus e JOIN d${i - 1} p ON e.src = p.node
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |nodes AS (SELECT doc_id FROM documents),
         |$edgesSqlCte,
         |eplus AS (
         |  SELECT src, dst, 1 AS w FROM edges
         |  UNION ALL SELECT doc_id, doc_id, 0 FROM nodes),
         |d0 AS (SELECT doc_id AS node, 0 AS dist FROM nodes WHERE doc_id % 97 = 0),
         |$iterCtes
         |SELECT node AS doc_id, CAST(dist AS BIGINT) AS hops
         |FROM d$BfsMaxHops""".stripMargin
    }) { (s, d) =>
      smallGraphOf(s, d) match {
        case Some((ids, es)) =>
          import s.implicits._
          s.createDataset(GraphDriver.bfs(ids, es, BfsMaxHops))
            .toDF("doc_id", "hops")
        case None => bfsDistributed(s, d)
      }
    },

    // ---- k-CORE decomposition (Seidman, Social Networks 1983) over the
    // undirected form of the derived link graph — the density/cohesion
    // filter of crawl curation: the k-core is the maximal subgraph where
    // every member keeps ≥ k neighbors INSIDE the subgraph, so it strips
    // tendrils and link-farms that raw degree misses. Distributed peel:
    // A_{i+1} = { u : |adj(u) ∩ A_i| ≥ k }. No "u ∈ A_i" conjunct is
    // needed — once u leaves at round j because deg_{A_{j-1}}(u) < k, the
    // alive set only shrinks (A_i ⊆ A_{j-1} by induction), so u's alive
    // degree stays < k forever: dead nodes cannot resurrect. That makes
    // each round reference its predecessor exactly ONCE — one edge⋈alive
    // equi-join + one map-side-combinable HAVING count — which keeps the
    // oracle's CTE chain linear under DuckDB inlining (the graph_hits
    // doctrine) and the Spark plan one join per round. At 100 TB both
    // sides are id-keyed: pre-bucketed on node id the join reuses its
    // partitioning every round, and a round only shuffles the surviving
    // frontier's edges. Output: core members with their within-core degree
    // (≥ k at the verified fixed point).
    q("graph_kcore", {
      val iterCtes = (1 to KCoreRounds).map { i =>
        s"""a$i AS (
           |  SELECT s.src AS node FROM sym s JOIN a${i - 1} a ON s.dst = a.node
           |  GROUP BY s.src HAVING COUNT(*) >= $KCoreK)""".stripMargin
      }.mkString(",\n")
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |nodes AS (SELECT doc_id FROM documents),
         |$edgesSqlCte,
         |und AS (
         |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM edges WHERE src <> dst),
         |sym AS (SELECT u AS src, v AS dst FROM und
         |        UNION ALL SELECT v AS src, u AS dst FROM und),
         |a0 AS (SELECT doc_id AS node FROM nodes),
         |$iterCtes
         |SELECT s.src AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_degree
         |FROM sym s
         |JOIN a$KCoreRounds m1 ON s.src = m1.node
         |JOIN a$KCoreRounds m2 ON s.dst = m2.node
         |GROUP BY s.src""".stripMargin
    }) { (s, d) =>
      smallGraphOf(s, d) match {
        case Some((ids, es)) =>
          import s.implicits._
          s.createDataset(GraphDriver.kcore(ids, es, KCoreK, KCoreRounds))
            .toDF("doc_id", "core_degree")
        case None => kcoreDistributed(s, d)
      }
    },

    // ---- LABEL-PROPAGATION community detection (Raghavan et al., Phys.
    // Rev. E 2007) over the derived undirected graph — the near-linear
    // community finder crawl curation uses to group mutually-linked site
    // clusters (mirror farms, forums, link rings) before per-community
    // sampling caps. DETERMINISTIC synchronous variant: every round each
    // node adopts the most frequent label among its neighbors, ties
    // broken by MIN label (the async/random classic is unreproducible
    // by construction; synchronous + total tie order makes the fixed
    // rounds bit-identical on both engines). Per round: one adjacency ⋈
    // labels equi-join, one map-side-combinable (node, label) count, and
    // one per-NODE window whose frame is the node's distinct neighbor
    // labels — bounded by degree, never corpus-sized. Isolated nodes
    // keep their own label via the left join. Lazy localCheckpoint per
    // round (the labels frame is read by both the join and the coalesce
    // fallback — the clusterLabels lineage doctrine). [[LpaRounds]]
    // unrolled rounds ⇒ constant plan depth; label frames never exceed
    // |V| rows at any scale.
    q("graph_label_propagation",
      s"""WITH $lpaCtes
         |SELECT doc_id, CAST(lab AS BIGINT) AS community FROM lab$LpaRounds""".stripMargin
    ) { (s, d) =>
      labelsOf(s, d).select(col("doc_id"), col("lab").as("community"))
    },

    // ---- modularity of the LPA partition (Newman & Girvan, Phys. Rev. E
    // 2004): Q = Σ_c [ e_c/m − (d_c/2m)² ] — the standard "did the
    // communities beat chance" score, here in EXACT integer arithmetic by
    // clearing denominators: Q·4m² = 4m·Σe_c − Σd_c² (all BIGINTs: edge
    // counts and degree sums). Shape: the per-community edge count is one
    // equi-join of the edge list with the (tiny) label frame on EACH
    // endpoint + one combinable aggregate; degree sums are one groupBy.
    // The final score is a 1-row frame; the only corpus-sized stages are
    // id-keyed joins. The one IEEE division happens on exactly-equal
    // integer operands (both < 2^53 at any plausible |E|... at 4m² beyond
    // 2^53 emit the num/den pair only — they are the exact answer).
    q("graph_modularity",
      s"""WITH $lpaCtes,
         |lu AS (SELECT doc_id, lab FROM lab$LpaRounds),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
         |internal AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS e_in
         |  FROM und JOIN lu l1 ON l1.doc_id = und.u
         |           JOIN lu l2 ON l2.doc_id = und.v
         |  WHERE l1.lab = l2.lab),
         |deg AS (
         |  SELECT node, COUNT(*) AS deg FROM (
         |    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
         |  GROUP BY 1),
         |dsum AS (
         |  SELECT CAST(SUM(d2 * d2) AS BIGINT) AS sum_d2 FROM (
         |    SELECT l.lab, SUM(deg) AS d2
         |    FROM deg JOIN lu l ON l.doc_id = deg.node GROUP BY 1)),
         |nc AS (SELECT CAST(COUNT(DISTINCT lab) AS BIGINT) AS n_communities FROM lu)
         |SELECT (SELECT m FROM m) AS m_edges,
         |  (SELECT e_in FROM internal) AS internal_edges,
         |  (SELECT n_communities FROM nc) AS n_communities,
         |  4 * (SELECT m FROM m) * (SELECT e_in FROM internal)
         |    - (SELECT sum_d2 FROM dsum) AS q_num,
         |  4 * (SELECT m FROM m) * (SELECT m FROM m) AS q_den,
         |  CAST(4 * (SELECT m FROM m) * (SELECT e_in FROM internal)
         |    - (SELECT sum_d2 FROM dsum) AS DOUBLE)
         |    / (4 * (SELECT m FROM m) * (SELECT m FROM m)) AS modularity""".stripMargin
    ) { (s, d) =>
      smallGraphOf(s, d) match {
        case Some((ids, es)) =>
          import s.implicits._
          s.createDataset(Seq(GraphDriver.modularity(ids, es, LpaRounds)))
            .toDF("m_edges", "internal_edges", "n_communities",
              "q_num", "q_den", "modularity")
        case None => modularityDistributed(s, d)
      }
    },

    // ---- per-community sampling cap: keep the top-[[CapPerCommunity]]
    // docs BY QUALITY within each link community — the anti-spam-farm
    // curation step (a mirror farm or link ring collapses into one LPA
    // community, so a per-community cap bounds its contribution to the
    // training mix no matter how many pages it spawns; the per-SOURCE cap
    // can't see structure inside one source). Composes three shared
    // definitions verbatim: [[labelPropagation]] communities, the ONE
    // corpus quality formula ([[graft.llm.TextAnalysis.qualityScore]]),
    // and the keep-first window discipline (community-keyed argmax —
    // state bounded by community size, the dedup_keep_best_quality
    // shape). The quality join is doc-keyed; no corpus-sized window.
    q("sample_cap_per_community",
      s"""WITH $lpaCtes,
         |qual AS (
         |  SELECT doc_id, ${graft.llm.TextAnalysis.qualityScoreSql("text")} AS quality_score
         |  FROM documents),
         |ranked AS (
         |  SELECT l.doc_id, l.lab AS community, q.quality_score,
         |    ROW_NUMBER() OVER (PARTITION BY l.lab
         |      ORDER BY q.quality_score DESC, l.doc_id) AS rn
         |  FROM lab$LpaRounds l JOIN qual q ON q.doc_id = l.doc_id)
         |SELECT doc_id, CAST(community AS BIGINT) AS community,
         |  quality_score, CAST(rn AS BIGINT) AS rn
         |FROM ranked WHERE rn <= $CapPerCommunity""".stripMargin
    ) { (s, d) =>
      val labels = labelsOf(s, d)
      val qual = Tables.documents(s, d).select(col("doc_id"),
        graft.llm.TextAnalysis.qualityScore(col("text")).as("quality_score"))
      val byCommunity = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lab")).orderBy(col("quality_score").desc, col("doc_id"))
      labels.join(qual, "doc_id")
        .withColumn("rn", row_number().over(byCommunity))
        .filter(col("rn") <= CapPerCommunity)
        .select(col("doc_id"), col("lab").as("community"),
          col("quality_score"), col("rn").cast("long").as("rn"))
    },

    // ---- LINK PREDICTION by the resource-allocation index (Zhou, Lü &
    // Zhang, EPJ B 2009): score(x,y) = Σ_{z ∈ Γ(x)∩Γ(y)} 1/deg(z) for
    // non-adjacent pairs — here ×1e6 in floor-division integers so both
    // engines score bit-identically (RA beats Adamic-Adar's 1/log deg in
    // their benchmarks AND needs no transcendental, keeping the exact-
    // arithmetic doctrine). Candidate pairs are exactly the wedges x–z–y,
    // enumerated by a self-join of the adjacency on the CENTER z; each
    // center contributes deg(z)² pairs, so hubs are the quadratic hazard.
    // The standard production mitigation is hub suppression: centers with
    // deg > [[RaHubCap]] are excluded — each would contribute < 1e6/cap
    // per wedge, negligible mass by RA's own weighting, and the cutoff is
    // deterministic so the oracle applies it identically. Per-center
    // fan-out is then ≤ cap², and at 100 TB the adjacency is bucketed by
    // z so the wedge self-join reuses one partitioning. Known pairs are
    // removed with an anti-join on the edge set (equi keys); the bounded
    // head is a TakeOrderedAndProject, never a global sort.
    q("graph_link_prediction",
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |nodes AS (SELECT doc_id FROM documents),
         |$edgesSqlCte,
         |und AS (
         |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM edges WHERE src <> dst),
         |deg AS (
         |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
         |  GROUP BY 1),
         |adj AS (SELECT u AS z, v AS x FROM und
         |        UNION ALL SELECT v AS z, u AS x FROM und),
         |wedges AS (
         |  SELECT a.x AS u, b.x AS v, 1000000 // d.deg AS w
         |  FROM adj a JOIN adj b ON a.z = b.z AND a.x < b.x
         |  JOIN deg d ON d.node = a.z WHERE d.deg <= $RaHubCap),
         |scored AS (
         |  SELECT w.u, w.v, SUM(w.w) AS ra_scaled, COUNT(*) AS n_common
         |  FROM wedges w
         |  WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.u = w.u AND e.v = w.v)
         |  GROUP BY 1, 2)
         |SELECT u, v, CAST(ra_scaled AS BIGINT) AS ra_scaled,
         |  CAST(n_common AS BIGINT) AS n_common
         |FROM scored ORDER BY ra_scaled DESC, u, v LIMIT 20""".stripMargin
    ) { (s, d) =>
      smallGraphOf(s, d) match {
        case Some((_, es)) =>
          import s.implicits._
          s.createDataset(GraphDriver.linkPrediction(es, RaHubCap))
            .toDF("u", "v", "ra_scaled", "n_common")
        case None => linkPredictionDistributed(s, d)
      }
    },

    // ---- LOCAL CLUSTERING COEFFICIENT (Watts & Strogatz 1998) in exact
    // ppm: cc(v) = 2·tri(v)·1e6 // (deg(v)·(deg(v)−1)) for deg ≥ 2.
    // Per-node triangle counts come from the SAME degree-ordered
    // orientation as graph_triangles (Suri & Vassilvitskii, WWW 2011 —
    // each wedge is enumerated at its lowest-degree corner, bounding the
    // wedge join by O(√m) per node), so adding this query costs one deg
    // join + one ppm projection beyond the triangle pass; zero-triangle
    // nodes surface with cc = 0 through the left join, keeping the output
    // a total function over deg≥2 nodes (the curation signal: low-cc
    // high-degree nodes are link-farm hubs; high-cc nodes sit in dense
    // organic neighborhoods).
    q("graph_clustering_coeff",
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
         |nodes AS (SELECT doc_id FROM documents),
         |$edgesSqlCte,
         |und AS (
         |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM edges WHERE src <> dst),
         |deg AS (
         |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
         |  GROUP BY 1),
         |ori AS (
         |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
         |           THEN u ELSE v END AS a,
         |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND u < v)
         |           THEN v ELSE u END AS b
         |  FROM und JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v),
         |tri AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM ori e1 JOIN ori e2 ON e1.a = e2.a AND e1.b < e2.b
         |  JOIN und e3 ON e3.u = e1.b AND e3.v = e2.b),
         |pertri AS (
         |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
         |    SELECT x AS doc_id FROM tri
         |    UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
         |  GROUP BY 1)
         |SELECT d.node AS doc_id, d.deg,
         |  CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
         |  CAST((2 * COALESCE(t.n_tri, 0) * 1000000)
         |    // (d.deg * (d.deg - 1)) AS BIGINT) AS cc_ppm
         |FROM deg d LEFT JOIN pertri t ON t.doc_id = d.node
         |WHERE d.deg >= 2""".stripMargin
    ) { (s, d) =>
      smallGraphOf(s, d) match {
        case Some((_, es)) =>
          import s.implicits._
          s.createDataset(GraphDriver.clusteringCoeff(es))
            .toDF("doc_id", "deg", "n_tri", "cc_ppm")
        case None => clusteringCoeffDistributed(s, d)
      }
    }
  )

  /** Oracle CTE chain for [[labelPropagation]]: `nodes`/`edges`/`und`/
    * `adj`/`lab0..labN` — terminal frame `lab{LpaRounds}(doc_id, lab)`. */
  private lazy val lpaCtes: String = {
    val iterCtes = (1 to LpaRounds).map { i =>
      s"""cnt$i AS (
         |  SELECT adj.a, l.lab, COUNT(*) AS c
         |  FROM adj JOIN lab${i - 1} l ON l.doc_id = adj.b GROUP BY 1, 2),
         |pick$i AS (
         |  SELECT a, lab FROM (
         |    SELECT a, lab, ROW_NUMBER() OVER (
         |      PARTITION BY a ORDER BY c DESC, lab) AS rn FROM cnt$i)
         |  WHERE rn = 1),
         |lab$i AS (
         |  SELECT l.doc_id, COALESCE(p.lab, l.lab) AS lab
         |  FROM lab${i - 1} l LEFT JOIN pick$i p ON p.a = l.doc_id)""".stripMargin
    }.mkString(",\n")
    s"""n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
       |nodes AS (SELECT doc_id FROM documents),
       |$edgesSqlCte,
       |und AS (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM edges WHERE src <> dst),
       |adj AS (SELECT u AS a, v AS b FROM und
       |        UNION ALL SELECT v AS a, u AS b FROM und),
       |lab0 AS (SELECT doc_id, doc_id AS lab FROM nodes),
       |$iterCtes""".stripMargin
  }

  /** The derived undirected edge set (u < v, no self-loops) — shared by
    * triangles / k-core / LPA / modularity. */
  private def undirectedOf(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val nodes = Tables.documents(s, d).select(col("doc_id"))
    val nRow = broadcast(nodes.agg(count(lit(1)).as("n")))
    edgesOf(nodes, nRow).filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
  }

  /** LPA labels (doc_id, lab) under the regime chooser: local loop below
    * [[DriverGraphEdges]], the distributed [[labelPropagation]] above. */
  private def labelsOf(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    smallGraphOf(s, d) match {
      case Some((ids, es)) =>
        import s.implicits._
        s.createDataset(GraphDriver.lpa(ids, es, LpaRounds)).toDF("doc_id", "lab")
      case None => labelPropagation(s, d)
    }

  // ---- distributed regimes (unchanged loops, now behind the
  // [[smallGraphOf]] chooser; GraphDriverRegimeSpec pins each pair
  // value-identical against its driver twin) ----

  private[graft] def pagerankDistributed(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val nodes = Tables.documents(s, d).select(col("doc_id"))
    val nRow = broadcast(nodes.agg(count(lit(1)).as("n")))
    // edge list: explode k=1..OutDeg, dst arithmetic over the dense id
    // space; N rides in via the broadcast 1-row aggregate (no collect)
    val edges = edgesOf(nodes, nRow)
    val pr0 = nodes.crossJoin(nRow)
      .select(col("doc_id"), expr(s"$Scale div n").as("pr"))
    val baseCol = expr(s"15 * ($Scale div n) div 100")
    val ranks = (1 to Iters).foldLeft(pr0) { (pr, _) =>
      val insum = edges.join(pr, edges("src") === pr("doc_id"))
        .groupBy(col("dst").as("doc_id"))
        .agg(sum(expr(s"pr div $OutDeg")).as("insum"))
      nodes.join(insum, Seq("doc_id"), "left")
        .crossJoin(nRow)
        .select(col("doc_id"),
          (baseCol + expr(s"$DampPct * coalesce(insum, 0L) div 100")).as("pr"))
    }
    ranks.select(col("doc_id"), col("pr").as("pr_scaled"))
  }

  private[graft] def pprDistributed(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val nodes = Tables.documents(s, d).select(col("doc_id"))
    val nRow = broadcast(nodes.agg(count(lit(1)).as("n")))
    val nsRow = broadcast(
      nodes.filter(col("doc_id") % 97 === 0).agg(count(lit(1)).as("ns")))
    val edges = edgesOf(nodes, nRow)
    val seed = col("doc_id") % 97 === 0
    val pp0 = nodes.crossJoin(nsRow)
      .select(col("doc_id"),
        when(seed, expr(s"$Scale div ns")).otherwise(lit(0L)).as("pr"))
    val baseCol = when(seed, expr(s"(15 * ($Scale div ns)) div 100")).otherwise(lit(0L))
    val ranks = (1 to Iters).foldLeft(pp0) { (pr, _) =>
      val insum = edges.join(pr, edges("src") === pr("doc_id"))
        .groupBy(col("dst").as("doc_id"))
        .agg(sum(expr(s"pr div $OutDeg")).as("insum"))
      nodes.join(insum, Seq("doc_id"), "left")
        .crossJoin(nsRow)
        .select(col("doc_id"),
          (baseCol + expr(s"$DampPct * coalesce(insum, 0L) div 100")).as("pr"))
    }
    ranks.select(col("doc_id"), col("pr").as("ppr_scaled"))
  }

  private[graft] def hitsDistributed(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val nodes = Tables.documents(s, d).select(col("doc_id"))
    val nRow = broadcast(nodes.agg(count(lit(1)).as("n")))
    val edges = edgesOf(nodes, nRow)
    val h0 = nodes.select(col("doc_id"), lit(HitsScale).as("h"))
    // localCheckpoint (lazy) on every frame a round references TWICE
    // (score + its own max): without it the logical plan doubles per
    // reference — 2^(2·rounds) analysis blowup, measured 59 s of pure
    // Catalyst time at sf0.01 — the Spark-side twin of the oracle's
    // reference-once CTE discipline (a round's frames are n rows, so
    // the truncation itself is cheap; the clusterLabels doctrine).
    val (aFin, hFin) = (1 to HitsIters).foldLeft((h0, h0)) { case ((_, h), _) =>
      val asum = edges.join(h, edges("src") === h("doc_id"))
        .groupBy(col("dst").as("doc_id")).agg(sum(col("h")).as("asum"))
      val aAll = nodes.join(asum, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("asum"), lit(0L)).as("a"))
        .localCheckpoint(eager = false)
      val aN = aAll
        .crossJoin(broadcast(aAll.agg(max(col("a")).as("amax"))))
        .select(col("doc_id"), expr(s"a * $HitsScale div amax").as("a"))
        .localCheckpoint(eager = false)
      val hsum = edges.join(aN, edges("dst") === aN("doc_id"))
        .groupBy(col("src").as("doc_id")).agg(sum(col("a")).as("hsum"))
      val hN = hsum
        .crossJoin(broadcast(hsum.agg(max(col("hsum")).as("hmax"))))
        .select(col("doc_id"), expr(s"hsum * $HitsScale div hmax").as("h"))
        .localCheckpoint(eager = false)
      (aN, hN)
    }
    nodes
      .join(aFin.withColumnRenamed("a", "auth"), Seq("doc_id"), "left")
      .join(hFin.withColumnRenamed("h", "hub"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("auth"), lit(0L)).as("auth_scaled"),
        coalesce(col("hub"), lit(0L)).as("hub_scaled"))
  }

  private[graft] def bfsDistributed(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val nodes = Tables.documents(s, d).select(col("doc_id"))
    val nRow = broadcast(nodes.agg(count(lit(1)).as("n")))
    val edges = edgesOf(nodes, nRow)
    val d0 = nodes.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id").as("node"), lit(0L).as("dist"))
    // lazy lineage truncation per round: each round references dist
    // twice (keep-old + relax), which would double the logical plan per
    // round without it (the graph_hits lesson)
    val dFin = (1 to BfsMaxHops).foldLeft(d0) { (dist, _) =>
      val dd = dist.localCheckpoint(eager = false)
      val relaxed = edges.join(dd, edges("src") === dd("node"))
        .select(col("dst").as("node"), (col("dist") + 1).as("dist"))
      dd.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
    }
    dFin.select(col("node").as("doc_id"), col("dist").as("hops"))
  }

  private[graft] def kcoreDistributed(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val nodes = Tables.documents(s, d).select(col("doc_id"))
    val nRow = broadcast(nodes.agg(count(lit(1)).as("n")))
    val edges = edgesOf(nodes, nRow)
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    // referenced every round (and twice in the final degree count) —
    // truncate the shared md5-edge lineage once
    val sym = und.select(col("u").as("src"), col("v").as("dst"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint(eager = false)
    val a0 = nodes.select(col("doc_id").as("node"))
    val core = (1 to KCoreRounds).foldLeft(a0) { (alive, _) =>
      // lazy per-round lineage truncation: the alive frame shrinks
      // monotonically, so the checkpoint is at most node-count rows
      val a = alive.localCheckpoint(eager = false)
      sym.join(a, sym("dst") === a("node"))
        .groupBy(sym("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= KCoreK)
        .select(col("src").as("node"))
    }.localCheckpoint(eager = false) // read twice below (src + dst side)
    sym.join(core.select(col("node").as("m1")), sym("src") === col("m1"))
      .join(core.select(col("node").as("m2")), sym("dst") === col("m2"))
      .groupBy(sym("src").as("doc_id"))
      .agg(count(lit(1)).as("core_degree"))
  }

  private[graft] def trianglesDistributed(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val nodes = Tables.documents(s, d).select(col("doc_id"))
    val nRow = broadcast(nodes.agg(count(lit(1)).as("n")))
    val edges = edgesOf(nodes, nRow)
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
      // feeds deg, ori (via two joins), and the closing-edge join —
      // truncate the shared lineage once instead of recomputing 4×
      .localCheckpoint(eager = false)
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val lower = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val ori = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(when(lower, col("u")).otherwise(col("v")).as("a"),
        when(lower, col("v")).otherwise(col("u")).as("b"))
    val tri = ori.as("e1")
      .join(ori.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .join(und.as("e3"),
        col("e3.u") === col("e1.b") && col("e3.v") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(col("x").as("doc_id"))
      .unionAll(tri.select(col("y").as("doc_id")))
      .unionAll(tri.select(col("z").as("doc_id")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  private[graft] def modularityDistributed(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val labels = labelPropagation(s, d).localCheckpoint(eager = false) // read 3×
    val und = undirectedOf(s, d).localCheckpoint(eager = false)        // read 3×
    val mRow = broadcast(und.agg(count(lit(1)).as("m")))
    val internal = broadcast(und
      .join(labels.select(col("doc_id").as("u"), col("lab").as("lu")), "u")
      .join(labels.select(col("doc_id").as("v"), col("lab").as("lv")), "v")
      .filter(col("lu") === col("lv"))
      .agg(count(lit(1)).as("e_in")))
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val dsum = broadcast(deg
      .join(labels.select(col("doc_id").as("node"), col("lab")), "node")
      .groupBy(col("lab")).agg(sum(col("deg")).as("d2"))
      .agg(sum(col("d2") * col("d2")).as("sum_d2")))
    val ncRow = broadcast(
      labels.agg(countDistinct(col("lab")).as("n_communities")))
    mRow.crossJoin(internal).crossJoin(dsum).crossJoin(ncRow)
      .select(col("m").as("m_edges"), col("e_in").as("internal_edges"),
        col("n_communities"),
        (lit(4L) * col("m") * col("e_in") - col("sum_d2")).as("q_num"),
        (lit(4L) * col("m") * col("m")).as("q_den"))
      .withColumn("modularity", col("q_num").cast("double") / col("q_den"))
  }

  private[graft] def linkPredictionDistributed(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val und = undirectedOf(s, d).localCheckpoint(eager = false)
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val adj = und.select(col("u").as("z"), col("v").as("x"))
      .unionAll(und.select(col("v").as("z"), col("u").as("x")))
    val wedges = adj.as("a")
      .join(adj.as("b"), col("a.z") === col("b.z") && col("a.x") < col("b.x"))
      .select(col("a.z").as("z"), col("a.x").as("u"), col("b.x").as("v"))
      .join(deg.filter(col("deg") <= RaHubCap)
        .select(col("node").as("z"), col("deg")), Seq("z"))
      .select(col("u"), col("v"), expr("1000000L div deg").as("w"))
    wedges
      .join(und, Seq("u", "v"), "left_anti")
      .groupBy(col("u"), col("v"))
      .agg(sum(col("w")).as("ra_scaled"), count(lit(1)).as("n_common"))
      .orderBy(col("ra_scaled").desc, col("u"), col("v"))
      .limit(20)
  }

  private[graft] def clusteringCoeffDistributed(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val und = undirectedOf(s, d).localCheckpoint(eager = false)
    val deg = und.select(col("u").as("node"))
      .unionAll(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val lower = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val ori = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(when(lower, col("u")).otherwise(col("v")).as("a"),
        when(lower, col("v")).otherwise(col("u")).as("b"))
    val tri = ori.as("e1")
      .join(ori.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .join(und.as("e3"),
        col("e3.u") === col("e1.b") && col("e3.v") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val perTri = tri.select(col("x").as("doc_id"))
      .unionAll(tri.select(col("y").as("doc_id")))
      .unionAll(tri.select(col("z").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_tri"))
    deg.filter(col("deg") >= 2)
      .join(perTri, col("doc_id") === col("node"), "left")
      .select(col("node").as("doc_id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        expr("(2 * coalesce(n_tri, 0L) * 1000000L) div (deg * (deg - 1))")
          .as("cc_ppm"))
  }

  /** Deterministic synchronous LPA labels after [[LpaRounds]] rounds:
    * (doc_id, lab). See the graph_label_propagation query doc for the
    * semantics and scale shape. */
  private[graft] def labelPropagation(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val nodes = Tables.documents(s, d).select(col("doc_id"))
    val und = undirectedOf(s, d)
    val adj = und.select(col("u").as("a"), col("v").as("b"))
      .unionAll(und.select(col("v").as("a"), col("u").as("b")))
      .localCheckpoint(eager = false) // reused every round
    val perNode = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a")).orderBy(col("c").desc, col("lab"))
    val lab0 = nodes.select(col("doc_id"), col("doc_id").as("lab"))
    (1 to LpaRounds).foldLeft(lab0) { (lab, _) =>
      val l = lab.localCheckpoint(eager = false) // read twice this round
      val pick = adj.join(l, l("doc_id") === adj("b"))
        .groupBy(col("a"), col("lab")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(perNode))
        .filter(col("rn") === 1)
        .select(col("a"), col("lab").as("newlab"))
      l.join(pick, l("doc_id") === pick("a"), "left")
        .select(l("doc_id"), coalesce(col("newlab"), l("lab")).as("lab"))
    }
  }
}
