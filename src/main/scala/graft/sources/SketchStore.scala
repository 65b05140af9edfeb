package graft.sources

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MERGEABLE-sketch cube: the amortized-offline doctrine
  * ([[VecStore]], `sim_ivfpq_probe_topk`, `quality_classifier_probe`)
  * applied to APPROXIMATE AGGREGATION. Distinct-user questions over
  * arbitrary day ranges are the classic cube-killer — exact
  * COUNT(DISTINCT) does not re-aggregate, so every new range rescans the
  * corpus. The store lands ONE DataSketches HLL sketch per day (Spark's
  * `hll_sketch_agg`, ~KB each, a corpus-size-independent frame); any
  * range probe is then `hll_union_agg` over ≤ |days| stored rows —
  * register-wise max, associative and grouping-invariant, so a union of
  * per-day sketches carries the SAME registers as a direct sketch over
  * the whole range (SketchStoreSpec asserts estimate equality, and that
  * appending a day touches no existing row).
  *
  * At 100 TB: the sketch frame is |days| rows regardless of corpus size;
  * a year of days unions in milliseconds against a cube that cost one
  * corpus pass to build and maintains itself append-only — the
  * pre-aggregated distinct cube every interactive dashboard actually
  * queries instead of the fact table.
  *
  * Oracle discipline: sketch estimates are engine-specific (DuckDB has
  * no DataSketches twin), so the hashed output carries only
  * oracle-reproducible columns — the exact distinct (recomputed from the
  * fact side) plus the bounded-assertion verdict the r8 sketch queries
  * established: Spark genuinely checks |estimate − exact| ≤ 5%·exact
  * (≳3σ of lgK=12 HLL's ~1.6% rsd) while the oracle asserts TRUE.
  */
object SketchStore {

  /** One HLL sketch per day over `user_id` — the cube build's single
    * corpus pass (map-side partial sketches, one tiny shuffle). */
  def build(events: DataFrame, dir: String): Unit =
    dailySketches(events)
      .coalesce(1).write.mode("overwrite").parquet(dir)

  private[sources] def dailySketches(events: DataFrame): DataFrame =
    events.select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Append one day's sketch without touching existing rows (the
    * additive-maintenance contract: a new day is one partial aggregate +
    * one appended file). */
  def appendDay(events: DataFrame, dir: String): Unit =
    dailySketches(events)
      .coalesce(1).write.mode("append").parquet(dir)

  /** Streaming maintenance of the cube: land one micro-batch's partial
    * day sketches under a deterministic `batch_id=<id>` directory with
    * OVERWRITE — a foreachBatch replay of the same epoch rewrites the
    * same path with the same bytes instead of double-counting, giving
    * exactly-once store contents over an at-least-once channel (the
    * FileStreamSink manifest idea, expressed as partition-dir
    * idempotence). Multiple partial rows per day across batches are the
    * cube's normal state: `hll_union_agg` merges them register-wise, so
    * stream-built and batch-built stores answer identically
    * (SketchStreamSpec proves equality and replay no-ops). */
  def appendBatch(events: DataFrame, dir: String, batchId: Long): Unit = {
    // replay guard across COMPACTIONS: an epoch already inside the
    // committed fold must not re-land (its directory no longer exists to
    // be idempotently overwritten) — the CubeLog watermark says so
    // without reading any data
    if (CubeLog.isFolded(events.sparkSession, dir, batchId)) return
    CubeLog.claimEpoch(events.sparkSession, dir, batchId) // single-writer guard
    dailySketches(events)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/batch_id=$batchId")
  }

  /** Fold accumulated `batch_id=` partials into one per-day frame
    * (register-max union per day, row counts SUM) under the [[CubeLog]]
    * crash-safe generation contract — the small-files repair for a
    * stream-maintained cube. Probe answers are invariant (register-wise
    * max is associative and grouping-invariant); CubeCompactSpec asserts
    * equality before/after, the directory-count drop, and that replays
    * of pre-compaction epochs stay exactly-once. */
  def compact(spark: SparkSession, dir: String): Long =
    CubeLog.compact(spark, dir) { partials =>
      partials.groupBy(col("day"))
        .agg(hll_union_agg(col("sketch")).as("sketch"),
          sum(col("n_rows")).as("n_rows"))
    }

  /** Store reader spanning every layout the maintenance paths produce:
    * root build files, the committed fold, live batch partials. */
  def readStore(spark: SparkSession, dir: String): DataFrame =
    CubeLog.read(spark, dir)

  /** Per-JVM scratch root — built once per dataset, probed repeatedly. */
  private lazy val root: String =
    s"${sys.props("java.io.tmpdir")}/graft_sketch_store/${java.util.UUID.randomUUID()}"
  private val built = scala.collection.mutable.Map.empty[String, String]
  private def storeDir(s: SparkSession, d: String): String =
    built.synchronized {
      built.getOrElseUpdate(d, {
        val dir = s"$root/${new java.io.File(d).getName}"
        val path = new org.apache.hadoop.fs.Path(dir)
        path.getFileSystem(s.sparkContext.hadoopConfiguration).deleteOnExit(path)
        build(Tables.events(s, d), dir)
        dir
      })
    }

  /** Stream-maintained + COMPACTED twin of the registered store: the
    * same corpus landed as three deterministic epoch slices (user_id mod
    * 3 — each epoch carries partials of every day), then folded through
    * [[compact]]. Oracle-gates the whole land→guard→fold pipeline, not
    * just the happy batch build. */
  private val builtMaintained = scala.collection.mutable.Map.empty[String, String]
  private def maintainedDir(s: SparkSession, d: String): String =
    builtMaintained.synchronized {
      builtMaintained.getOrElseUpdate(d, {
        val dir = s"$root/${new java.io.File(d).getName}_maintained"
        val path = new org.apache.hadoop.fs.Path(dir)
        path.getFileSystem(s.sparkContext.hadoopConfiguration).deleteOnExit(path)
        val events = Tables.events(s, d)
        (0L to 2L).foreach { epoch =>
          appendBatch(events.filter(pmod(col("user_id"), lit(3L)) === epoch),
            dir, epoch)
        }
        compact(s, dir)
        dir
      })
    }

  private val probeOracle: String =
    """WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
      |wk AS (
      |  SELECT 'wk:' || CAST(CAST(date_trunc('week', day) AS DATE) AS VARCHAR) AS scope,
      |    CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
      |  FROM e GROUP BY 1),
      |al AS (
      |  SELECT 'all' AS scope, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
      |  FROM e)
      |SELECT scope, n_days, exact_users, TRUE AS within_bound
      |FROM (SELECT * FROM wk UNION ALL SELECT * FROM al)""".stripMargin

  /** Range-distinct answered FROM THE STORE (per ISO week + the full
    * span): `hll_union_agg` over the stored day rows only — the fact
    * table appears in the plan solely as the exact verification side the
    * oracle requires. */
  lazy val probeQuery: GraftQuery = q("sketch_store_probe", probeOracle) { (s, d) =>
    probeFrom(s, d, storeDir(s, d))
  }

  /** The SAME probe against the stream-maintained compacted store. */
  lazy val compactedProbeQuery: GraftQuery =
    q("sketch_store_compacted_probe", probeOracle) { (s, d) =>
      probeFrom(s, d, maintainedDir(s, d))
    }

  private def probeFrom(s: SparkSession, d: String, dir: String): DataFrame = {
    val sk = readStore(s, dir)
    // probe side: union stored sketches only (per week, and all-up)
    // n_days counts DISTINCT stored days, not store rows: the documented
    // appendDay/appendBatch maintenance paths legitimately leave multiple
    // partial rows per day, and the probe must be grain-invariant exactly
    // like the register-max merge itself (stream-built ≡ batch-built).
    val wkEst = sk
      .groupBy(concat(lit("wk:"),
        to_date(date_trunc("week", col("day"))).cast("string")).as("scope"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"),
        countDistinct(col("day")).as("n_days"))
    val allEst = sk
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"),
        countDistinct(col("day")).as("n_days"))
      .select(lit("all").as("scope"), col("est"), col("n_days"))
    val est = wkEst.select(col("scope"), col("est"), col("n_days"))
      .unionByName(allEst)
    // verification side: exact distinct recomputed from the fact table
    // (the oracle-reproducible truth the estimate is judged against)
    val e = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val wkExact = e
      .groupBy(concat(lit("wk:"),
        to_date(date_trunc("week", col("day"))).cast("string")).as("scope"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val allExact = e.agg(countDistinct(col("user_id")).as("exact_users"))
      .select(lit("all").as("scope"), col("exact_users"))
    est.join(wkExact.unionByName(allExact), "scope")
      .select(col("scope"), col("n_days"), col("exact_users"),
        (abs(col("est") - col("exact_users")) * 100
          <= col("exact_users") * 5).as("within_bound"))
  }

  /** Week-over-week audience OVERLAP from the store alone: HLL cannot
    * intersect, but |A∩B| = |A| + |B| − |A∪B| and all three terms are
    * unions of STORED day sketches — the classic inclusion-exclusion
    * retention estimate a dashboard derives from the cube without ever
    * rescanning facts. Differences of estimates amplify relative error,
    * so the bound is stated against the UNION size (the quantity whose
    * error actually propagates): |est∩ − exact∩| ≤ 5%·|A∪B|exact. */
  lazy val overlapQuery: GraftQuery = q("sketch_store_overlap",
    """WITH e AS (
      |  SELECT CAST(CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS VARCHAR) AS wk,
      |    user_id
      |  FROM events),
      |wks AS (SELECT DISTINCT wk FROM e),
      |pairs AS (
      |  SELECT a.wk AS wk_a, b.wk AS wk_b FROM wks a JOIN wks b ON a.wk < b.wk
      |    AND b.wk = (SELECT MIN(wk) FROM wks w WHERE w.wk > a.wk)),
      |m AS (
      |  SELECT p.wk_a, p.wk_b,
      |    CAST((SELECT COUNT(DISTINCT user_id) FROM e WHERE wk = p.wk_a) AS BIGINT) AS exact_a,
      |    CAST((SELECT COUNT(DISTINCT user_id) FROM e WHERE wk = p.wk_b) AS BIGINT) AS exact_b,
      |    CAST((SELECT COUNT(DISTINCT user_id) FROM e WHERE wk IN (p.wk_a, p.wk_b)) AS BIGINT) AS exact_union
      |  FROM pairs p)
      |SELECT wk_a, wk_b, exact_a, exact_b, exact_union,
      |  CAST(exact_a + exact_b - exact_union AS BIGINT) AS exact_overlap,
      |  TRUE AS within_bound
      |FROM m""".stripMargin) { (s, d) =>
    val dir = storeDir(s, d)
    val sk = readStore(s, dir)
      .withColumn("wk", to_date(date_trunc("week", col("day"))).cast("string"))
    // per-week sketch union (store-only), then adjacent-week pairing
    val wkSk = sk.groupBy(col("wk"))
      .agg(hll_union_agg(col("sketch")).as("wsk"))
      .localCheckpoint(eager = false) // reused by A, B, and A∪B legs
    val nextWk = wkSk.select(col("wk").as("wk_a"),
      lead(col("wk"), 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy(pmod(crc32(col("wk")), lit(1L))) // ≤ |weeks| rows, bounded
        .orderBy(col("wk"))).as("wk_b"))
      .filter(col("wk_b").isNotNull)
    val a = wkSk.select(col("wk").as("wk_a"), col("wsk").as("sk_a"))
    val b = wkSk.select(col("wk").as("wk_b"), col("wsk").as("sk_b"))
    val est = nextWk.join(a, "wk_a").join(b, "wk_b")
      .select(col("wk_a"), col("wk_b"),
        hll_sketch_estimate(col("sk_a")).as("est_a"),
        hll_sketch_estimate(col("sk_b")).as("est_b"))
    // A∪B union needs both sketches in one aggregate: explode the pair
    val unions = nextWk
      .join(sk.select(col("wk").as("wk_a"), col("sketch")), "wk_a")
      .unionByName(nextWk
        .join(sk.select(col("wk").as("wk_b"), col("sketch")), "wk_b")
        .select(col("wk_a"), col("wk_b"), col("sketch")))
      .groupBy(col("wk_a"), col("wk_b"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est_union"))
    // exact verification side from facts (the oracle-reproducible truth)
    val e = Tables.events(s, d)
      .select(to_date(date_trunc("week", to_date(col("ts")))).cast("string").as("wk"),
        col("user_id"))
    val exA = e.groupBy(col("wk").as("wk_a"))
      .agg(countDistinct(col("user_id")).as("exact_a"))
    val exB = e.groupBy(col("wk").as("wk_b"))
      .agg(countDistinct(col("user_id")).as("exact_b"))
    val exU = nextWk.join(e.select(col("wk").as("wk_a"), col("user_id")), "wk_a")
      .unionByName(nextWk
        .join(e.select(col("wk").as("wk_b"), col("user_id")), "wk_b")
        .select(col("wk_a"), col("wk_b"), col("user_id")))
      .groupBy(col("wk_a"), col("wk_b"))
      .agg(countDistinct(col("user_id")).as("exact_union"))
    est.join(unions, Seq("wk_a", "wk_b"))
      .join(exA, "wk_a").join(exB, "wk_b").join(exU, Seq("wk_a", "wk_b"))
      .select(col("wk_a"), col("wk_b"), col("exact_a"), col("exact_b"),
        col("exact_union"),
        (col("exact_a") + col("exact_b") - col("exact_union")).as("exact_overlap"),
        (abs((col("est_a") + col("est_b") - col("est_union"))
          - (col("exact_a") + col("exact_b") - col("exact_union"))) * 100
          <= col("exact_union") * 5).as("within_bound"))
  }

  /** The cube property: sketches stored at a FINER grain — (day,
    * event_type) — re-aggregate to any coarser slice by union, never by
    * fact rescan. Here: per-type audience across the full span from the
    * finer store (built once beside the daily one). */
  /** Finer-grain (day, event_type) store, built under the SAME
    * `built.synchronized` discipline as the daily store — an
    * exists-then-write check outside the lock would let two concurrent
    * probes (or a reader racing a writer) see a half-written directory. */
  private val builtByType = scala.collection.mutable.Map.empty[String, String]
  private def typeStoreDir(s: SparkSession, d: String): String =
    builtByType.synchronized {
      builtByType.getOrElseUpdate(d, {
        val dir = s"${storeDir(s, d)}_by_type"
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).deleteOnExit(p)
        Tables.events(s, d)
          .select(to_date(col("ts")).as("day"), col("event_type"), col("user_id"))
          .groupBy(col("day"), col("event_type"))
          .agg(hll_sketch_agg(col("user_id")).as("sketch"))
          .coalesce(1).write.mode("overwrite").parquet(dir)
        dir
      })
    }

  lazy val rollupQuery: GraftQuery = q("sketch_store_rollup",
    """SELECT event_type,
      |  CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  TRUE AS within_bound
      |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
    val dir = typeStoreDir(s, d)
    val est = readStore(s, dir)
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("est"))
    val exact = Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(to_date(col("ts"))).as("n_days"),
        countDistinct(col("user_id")).as("exact_users"))
    est.join(exact, "event_type")
      .select(col("event_type"), col("n_days"), col("exact_users"),
        (abs(col("est") - col("exact_users")) * 100
          <= col("exact_users") * 5).as("within_bound"))
  }
}
