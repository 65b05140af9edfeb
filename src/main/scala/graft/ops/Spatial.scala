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
      val pts = Tables.events(s, d).select(col("user_id")).distinct()
        .select(col("user_id"),
          pmod(TextHash.h64(concat(lit("px:"), col("user_id").cast("string"))), lit(Span)).as("x"),
          pmod(TextHash.h64(concat(lit("py:"), col("user_id").cast("string"))), lit(Span)).as("y"))
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
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |p AS (
         |  SELECT user_id,
         |    ${TextHash.h64Sql("'px:' || CAST(user_id AS VARCHAR)")} % ${Span} AS x,
         |    ${TextHash.h64Sql("'py:' || CAST(user_id AS VARCHAR)")} % ${Span} AS y
         |  FROM u)
         |SELECT a.user_id AS user_a, b.user_id AS user_b,
         |  CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT)
         |    AS d2
         |FROM p a JOIN p b
         |  ON a.user_id < b.user_id
         | AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= ${R2}
         |""".stripMargin) { (s, d) =>
      val pts = Tables.events(s, d).select(col("user_id")).distinct()
        .select(col("user_id"),
          pmod(TextHash.h64(concat(lit("px:"), col("user_id").cast("string"))), lit(Span)).as("x"),
          pmod(TextHash.h64(concat(lit("py:"), col("user_id").cast("string"))), lit(Span)).as("y"))
        .withColumn("cx", expr(s"x div ${R}L"))
        .withColumn("cy", expr(s"y div ${R}L"))
      import s.implicits._
      val offsets = Seq(-1L, 0L, 1L)
        .flatMap(dx => Seq(-1L, 0L, 1L).map(dy => (dx, dy)))
        .toDF("dx", "dy")
      val left = pts.crossJoin(broadcast(offsets))
        .select(col("user_id").as("user_a"), col("x").as("xa"), col("y").as("ya"),
          (col("cx") + col("dx")).as("cell_x"), (col("cy") + col("dy")).as("cell_y"))
      val right = pts.select(col("user_id").as("user_b"),
        col("x").as("xb"), col("y").as("yb"),
        col("cx").as("cell_x"), col("cy").as("cell_y"))
      left.join(right, Seq("cell_x", "cell_y"))
        .filter(col("user_a") < col("user_b"))
        .select(col("user_a"), col("user_b"),
          ((col("xa") - col("xb")) * (col("xa") - col("xb"))
            + (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("d2"))
        .filter(col("d2") <= R2)
    }
  )
}
