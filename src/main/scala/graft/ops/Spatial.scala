package graft.ops

import graft.GraftQuery
import graft.GraftQuery.q
import graft.llm.TextHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial operators over deterministic synthetic coordinates — the
  * two join shapes every location workload needs, each with the Spark
  * plan that survives 100 TB:
  *
  *  - **point → small site dim**: nearest-site assignment is an argmin
  *    over a BROADCAST k-row frame (k = 25 nations here; ≤ thousands of
  *    cell towers / substations in practice) — per-point map-side work,
  *    zero shuffle of the point side beyond the final rollup. The
  *    reference's own meter→grid-zone assignment
  *    (/root/reference/database/init_scripts/02_populate_dimensions.sql:12-41,
  *    20 zones) is exactly this shape.
  *  - **point ↔ point within radius**: the all-pairs trap. Grid-cell
  *    bucketing with cell size = the radius turns it into an EQUI-join:
  *    the left side replicates to its 3×3 neighbor cells (a 9× map-side
  *    explode, constant factor), the right side stays in its home cell,
  *    and candidates are only same-bucket pairs — the geometric sibling
  *    of the LSH band-bucket join the dedup family uses. No
  *    CartesianProduct anywhere in the plan (SpatialSpec asserts).
  *
  * Coordinates derive from the 60-bit md5 prefix hash
  * ([[TextHash.h64]] / its SQL twin), so both engines place every point
  * identically on a 10^6 × 10^6 integer grid and ALL distances are exact
  * BIGINT squared distances (max 2·10^12 ≪ 2^63) — no floating-point
  * trig, no cross-engine ulp drift. Argmin ties break by site key via
  * integer encoding `d2 * 100 + site` (d2·100 ≤ 2·10^14, exact).
  */
object Spatial {

  /** Grid span: coordinates in [0, 10^6]. */
  private val Span = 1000001L
  /** Radius for the within-distance self-join (and the grid cell size —
    * cell = radius makes the 3×3 neighborhood a complete candidate set). */
  private val R = 20000L
  private val R2 = R * R
  /** DBSCAN core threshold: ≥ MinPts neighbors within R (self excluded). */
  private val MinPts = 2

  /** The point set: distinct event users placed by the md5-prefix hash. */
  private def points(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("user_id")).distinct()
      .select(col("user_id"),
        pmod(TextHash.h64(concat(lit("px:"), col("user_id").cast("string"))), lit(Span)).as("x"),
        pmod(TextHash.h64(concat(lit("py:"), col("user_id").cast("string"))), lit(Span)).as("y"))

  /** Grid-bucketed within-R pairs (user_a < user_b, exact d2): left side
    * replicates to its 3×3 neighbor cells, right stays home — candidates
    * come only from the cell equi-join, never an all-pairs product. */
  private def withinRadiusPairs(s: SparkSession, pts: DataFrame): DataFrame = {
    import s.implicits._
    val cells = pts
      .withColumn("cx", expr(s"x div ${R}L"))
      .withColumn("cy", expr(s"y div ${R}L"))
    val offsets = Seq(-1L, 0L, 1L)
      .flatMap(dx => Seq(-1L, 0L, 1L).map(dy => (dx, dy)))
      .toDF("dx", "dy")
    val left = cells.crossJoin(broadcast(offsets))
      .select(col("user_id").as("user_a"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("dx")).as("cell_x"), (col("cy") + col("dy")).as("cell_y"))
    val right = cells.select(col("user_id").as("user_b"),
      col("x").as("xb"), col("y").as("yb"),
      col("cx").as("cell_x"), col("cy").as("cell_y"))
    left.join(right, Seq("cell_x", "cell_y"))
      .filter(col("user_a") < col("user_b"))
      .select(col("user_a"), col("user_b"),
        ((col("xa") - col("xb")) * (col("xa") - col("xb"))
          + (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("d2"))
      .filter(col("d2") <= R2)
  }

  /** The (user_id, x, y) point CTE shared by every oracle. */
  private val pointsSqlCte: String =
    s"""u AS (SELECT DISTINCT user_id FROM events),
       |p AS (
       |  SELECT user_id,
       |    ${TextHash.h64Sql("'px:' || CAST(user_id AS VARCHAR)")} % ${Span} AS x,
       |    ${TextHash.h64Sql("'py:' || CAST(user_id AS VARCHAR)")} % ${Span} AS y
       |  FROM u)""".stripMargin

  def all: Seq[GraftQuery] = Seq(

    // ---- nearest site per point, rolled up per site. Points = the
    // distinct event users; sites = the 25 nations. Spark plan: distinct
    // users (one agg) × broadcast 25-row site frame → per-user integer
    // argmin → per-site rollup. h64 is nonnegative, so % ≡ pmod.
    q("spatial_nearest_site",
      s"""WITH u AS (
         |  SELECT DISTINCT user_id FROM events),
         |p AS (
         |  SELECT user_id,
         |    ${TextHash.h64Sql("'px:' || CAST(user_id AS VARCHAR)")} % ${Span} AS x,
         |    ${TextHash.h64Sql("'py:' || CAST(user_id AS VARCHAR)")} % ${Span} AS y
         |  FROM u),
         |s AS (
         |  SELECT n_nationkey AS site,
         |    ${TextHash.h64Sql("'sx:' || CAST(n_nationkey AS VARCHAR)")} % ${Span} AS x,
         |    ${TextHash.h64Sql("'sy:' || CAST(n_nationkey AS VARCHAR)")} % ${Span} AS y
         |  FROM nation),
         |d AS (
         |  SELECT p.user_id,
         |    MIN(((p.x - s.x) * (p.x - s.x) + (p.y - s.y) * (p.y - s.y)) * 100
         |        + s.site) AS enc
         |  FROM p, s GROUP BY 1)
         |SELECT CAST(enc % 100 AS BIGINT) AS site,
         |  CAST(COUNT(*) AS BIGINT) AS n_users,
         |  CAST(MIN(enc // 100) AS BIGINT) AS min_d2,
         |  CAST(MAX(enc // 100) AS BIGINT) AS max_d2
         |FROM d GROUP BY 1""".stripMargin) { (s, d) =>
      val pts = points(s, d)
      val sites = Tables.nation(s, d)
        .select(col("n_nationkey").cast("long").as("site"),
          pmod(TextHash.h64(concat(lit("sx:"), col("n_nationkey").cast("string"))), lit(Span)).as("sx"),
          pmod(TextHash.h64(concat(lit("sy:"), col("n_nationkey").cast("string"))), lit(Span)).as("sy"))
      pts.crossJoin(broadcast(sites))
        .select(col("user_id"),
          (((col("x") - col("sx")) * (col("x") - col("sx"))
            + (col("y") - col("sy")) * (col("y") - col("sy"))) * 100
            + col("site")).as("enc"))
        .groupBy(col("user_id")).agg(min(col("enc")).as("enc"))
        .select(expr("enc % 100").as("site"), expr("enc div 100").as("d2"))
        .groupBy(col("site"))
        .agg(count(lit(1)).as("n_users"),
          min(col("d2")).as("min_d2"), max(col("d2")).as("max_d2"))
    },

    // ---- all point pairs within radius R: grid-bucketed equi self-join.
    // Left replicates to its 9 neighbor cells; right stays home; the
    // u < v orientation filter yields each unordered pair exactly once
    // (v's home cell lies in u's replicated neighborhood iff they are
    // within one cell, and cell size = R covers every qualifying pair).
    q("spatial_pairs_within_radius",
      s"""WITH $pointsSqlCte
         |SELECT a.user_id AS user_a, b.user_id AS user_b,
         |  CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT)
         |    AS d2
         |FROM p a JOIN p b
         |  ON a.user_id < b.user_id
         | AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= ${R2}
         |""".stripMargin) { (s, d) =>
      withinRadiusPairs(s, points(s, d))
    },

    // ---- DBSCAN over the same pair machinery: cores = points with ≥
    // MinPts within-R neighbors; clusters = connected components of the
    // core-core adjacency, resolved by the SAME min-label + pointer-jump
    // rounds the dedup family uses (the pair graph ≪ the point set, so
    // component resolution costs O(log diameter) rounds over a tiny
    // frame); border points take the MIN core-neighbor cluster label
    // (the deterministic tie-break for DBSCAN's classic border
    // ambiguity); everything else is noise (cluster −1). The oracle
    // states the identical definition with a recursive CTE. At 100 TB
    // the dominant cost is the bucketed pair join — already no-cartesian
    // — and the component rounds touch only core edges.
    q("spatial_cluster_dbscan",
      s"""WITH RECURSIVE $pointsSqlCte,
         |pr AS (
         |  SELECT a.user_id AS ua, b.user_id AS ub
         |  FROM p a JOIN p b ON a.user_id < b.user_id
         |   AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= ${R2}),
         |adj AS (SELECT ua AS u, ub AS v FROM pr UNION ALL SELECT ub, ua FROM pr),
         |deg AS (SELECT u, COUNT(*) AS dg FROM adj GROUP BY 1),
         |core AS (SELECT u FROM deg WHERE dg >= ${MinPts}),
         |ce AS (
         |  SELECT a.u AS src, a.v AS dst FROM adj a
         |  JOIN core c1 ON a.u = c1.u JOIN core c2 ON a.v = c2.u),
         |reach(node, label) AS (
         |  SELECT u, u FROM core
         |  UNION
         |  SELECT e.src, r.label FROM ce e JOIN reach r ON e.dst = r.node),
         |clab AS (SELECT node AS u, MIN(label) AS cluster FROM reach GROUP BY 1),
         |border AS (
         |  SELECT a.u, MIN(c.cluster) AS cluster
         |  FROM adj a JOIN clab c ON a.v = c.u
         |  WHERE a.u NOT IN (SELECT u FROM core) GROUP BY 1)
         |SELECT p.user_id,
         |  CASE WHEN cl.cluster IS NOT NULL THEN 'core'
         |       WHEN b.cluster IS NOT NULL THEN 'border'
         |       ELSE 'noise' END AS role,
         |  CAST(COALESCE(cl.cluster, b.cluster, -1) AS BIGINT) AS cluster
         |FROM p
         |LEFT JOIN clab cl ON p.user_id = cl.u
         |LEFT JOIN border b ON p.user_id = b.u""".stripMargin) { (s, d) =>
      val pts = points(s, d).localCheckpoint(eager = false)
      val pairs = withinRadiusPairs(s, pts).localCheckpoint(eager = false)
      val adj = pairs.select(col("user_a").as("u"), col("user_b").as("v"))
        .unionByName(pairs.select(col("user_b").as("u"), col("user_a").as("v")))
      val core = adj.groupBy(col("u")).agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= MinPts).select(col("u"))
        .localCheckpoint(eager = false)
      val coreEdges = pairs
        .join(core.select(col("u").as("user_a")), "user_a")
        .join(core.select(col("u").as("user_b")), "user_b")
        .select(col("user_a").as("d1"), col("user_b").as("d2"))
      // components over core-core edges; isolated cores keep themselves.
      // The resolver REGIME is derived from the measured graph shape
      // (Dedup.chooseStar): this geometric core graph sits near
      // percolation one decade up (sf1: 15 K points, ~139 K pairs, mean
      // degree ~18.5, giant component with large diameter), where
      // min-label propagation pays O(diameter) rounds (measured 25 min)
      // and the O(log n) large/small star rounds win (9.7 s) — the
      // chooser routes it to stars by the degree signal, while the small
      // low-degree test-SF graphs take the lighter min-label rounds.
      val labels = graft.llm.Dedup.clusterLabelsAuto(coreEdges)
      val clab = core.join(labels.withColumnRenamed("node", "u"), Seq("u"), "left")
        .select(col("u"), coalesce(col("label"), col("u")).as("cluster"))
        .localCheckpoint(eager = false)
      val borderLab = adj.join(core.select(col("u")), Seq("u"), "left_anti")
        .join(clab.select(col("u").as("v"), col("cluster")), "v")
        .groupBy(col("u")).agg(min(col("cluster")).as("b_cluster"))
      pts.select(col("user_id"))
        .join(clab.select(col("u").as("user_id"), col("cluster").as("c_cluster")),
          Seq("user_id"), "left")
        .join(borderLab.select(col("u").as("user_id"), col("b_cluster")),
          Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("c_cluster").isNotNull, "core")
            .when(col("b_cluster").isNotNull, "border")
            .otherwise("noise").as("role"),
          coalesce(col("c_cluster"), col("b_cluster"), lit(-1L)).as("cluster"))
    }
  )
}
