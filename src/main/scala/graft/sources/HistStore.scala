package graft.sources

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted mergeable-HISTOGRAM cube: the [[SketchStore]] doctrine
  * (amortized-offline, answer-from-the-store) applied to QUANTILES.
  * Distinct-count cubes merge by HLL register max; quantile cubes merge
  * even more simply — a fixed-width integer histogram is a (day, bucket,
  * count) frame whose merge is plain SUM, associative and
  * grouping-invariant, so per-day partials re-aggregate to ANY day range
  * or rollup slice exactly. A range p50/p95 probe then locates the
  * target rank's bucket by one cumulative sum over the ≤ |domain|/W
  * merged bucket rows — never rescanning facts.
  *
  * Unlike a sketch, the histogram's answer is DETERMINISTIC: the bucket
  * containing rank k is a pure function of the data (the store holds
  * exact counts), so the oracle checks hash-exact equality — the probe's
  * store-derived quantile bucket must equal `exact_quantile div W`
  * recomputed from facts. A lost row, a double-merged partial, or a
  * bucketing mismatch anywhere in the land→merge→probe pipeline breaks
  * the equality.
  *
  * At 100 TB: the store is O(days × |value domain|/W) rows — the value
  * domain is a bounded physical metric (cents of a bounded gauge), so
  * the cube is corpus-size-independent; a year of days merges in
  * milliseconds. The exact verification side ranks value COUNTS (≤
  * |distinct cents| rows per scope, domain-bounded, not corpus-bounded)
  * — the same count-collapse that makes `a_exact_median_banded` scale.
  *
  * Reference anchor: the dashboards TimescaleDB serves with continuous
  * aggregates over `raw_meter_readings`
  * (/root/reference/database/init_scripts/01_create_schema.sql:81-101)
  * answer exactly this shape of range-percentile question; here the
  * pre-aggregate is an explicitly mergeable store.
  */
object HistStore {

  /** Bucket width in integer cents: 5.00 value units per bucket. */
  val W = 500L

  /** events.value as exact integer cents (2-decimal corpus metric). */
  private def cents(df: DataFrame): DataFrame =
    df.select(to_date(col("ts")).as("day"), col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("v_c"))

  /** One histogram row per (day, event_type, bucket) — the cube build's
    * single corpus pass (map-side partial counts, one tiny shuffle).
    * Stored at the FINER (day, type) grain so both day-range probes and
    * type rollups re-aggregate from the same store. */
  private[sources] def dailyHistograms(events: DataFrame): DataFrame =
    cents(events)
      .withColumn("bucket", expr(s"v_c div ${W}L"))
      .groupBy(col("day"), col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  def build(events: DataFrame, dir: String): Unit =
    dailyHistograms(events).coalesce(1).write.mode("overwrite").parquet(dir)

  /** Append one day's partial histogram without touching existing rows;
    * duplicate (day,bucket) rows across appended files are fine — the
    * probe's SUM merge is exactly the partial-aggregate combine. */
  def appendDay(events: DataFrame, dir: String): Unit =
    dailyHistograms(events).coalesce(1).write.mode("append").parquet(dir)

  /** Streaming maintenance, same contract as [[SketchStore.appendBatch]]:
    * per-epoch partial histograms land under `batch_id=<id>` with
    * overwrite, so a foreachBatch replay rewrites its own partition dir
    * instead of double-counting; the probe's SUM merge folds any number
    * of partial rows per (day, type, bucket) — any batch slicing sums to
    * the same histogram (HistStoreSpec stream test). */
  def appendBatch(events: DataFrame, dir: String, batchId: Long): Unit = {
    // replay guard across COMPACTIONS ([[CubeLog]] watermark): histogram
    // partials are SUM-merged, so a folded epoch re-landing would
    // double-count — unlike the register-max sketch, the algebra does
    // not forgive it
    if (CubeLog.isFolded(events.sparkSession, dir, batchId)) return
    CubeLog.claimEpoch(events.sparkSession, dir, batchId) // single-writer guard
    dailyHistograms(events)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/batch_id=$batchId")
  }

  /** Fold accumulated `batch_id=` partials into one row per (day, type,
    * bucket) — plain SUM, the histogram's own merge — under the
    * [[CubeLog]] crash-safe generation contract. Probe answers are
    * invariant (SUM is associative and grouping-invariant over any batch
    * slicing); CubeCompactSpec asserts equality before/after, the
    * directory-count drop, and post-compaction replay exactly-once. */
  def compact(spark: SparkSession, dir: String): Long =
    CubeLog.compact(spark, dir) { partials =>
      partials.groupBy(col("day"), col("event_type"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt"))
    }

  /** Store reader spanning every layout the maintenance paths produce. */
  def readStore(spark: SparkSession, dir: String): DataFrame =
    CubeLog.read(spark, dir)

  private lazy val root: String =
    s"${sys.props("java.io.tmpdir")}/graft_hist_store/${java.util.UUID.randomUUID()}"
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

  /** Locate percentile-disc-style rank buckets from merged store rows:
    * for each scope, first bucket whose cumulative count reaches the
    * target rank (lower-median convention: rank = (n+1) div 2 for p50,
    * ceil(0.95 n) for p95). The window partitions by scope and orders by
    * bucket — bounded by |domain|/W rows per scope by construction. */
  private def rankBuckets(merged: DataFrame): DataFrame = {
    val wCum = Window.partitionBy(col("scope")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withCum = merged
      .withColumn("cum", sum(col("cnt")).over(wCum))
    val tot = merged.groupBy(col("scope")).agg(sum(col("cnt")).as("n_rows"))
      .withColumn("rk50", expr("(n_rows + 1) div 2"))
      .withColumn("rk95", expr("(19 * n_rows + 19) div 20")) // ceil(0.95 n), nonneg-exact
    val j = withCum.join(tot, "scope")
    val p50 = j.filter(col("cum") >= col("rk50")
        && col("cum") - col("cnt") < col("rk50"))
      .select(col("scope"), col("bucket").as("p50_bucket"))
    val p95 = j.filter(col("cum") >= col("rk95")
        && col("cum") - col("cnt") < col("rk95"))
      .select(col("scope"), col("bucket").as("p95_bucket"))
    tot.select(col("scope"), col("n_rows")).join(p50, "scope").join(p95, "scope")
  }

  /** Exact percentile-disc p50/p95 per scope from facts — the
    * verification side. Collapses to value COUNTS first (domain-bounded),
    * then one cumulative window per scope. */
  private def exactQuantiles(scoped: DataFrame): DataFrame = {
    val vc = scoped.groupBy(col("scope"), col("v_c")).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col("scope")).orderBy(col("v_c"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val withCum = vc.withColumn("cum", sum(col("cnt")).over(wCum))
    val tot = vc.groupBy(col("scope")).agg(sum(col("cnt")).as("n"))
      .withColumn("rk50", expr("(n + 1) div 2"))
      .withColumn("rk95", expr("(19 * n + 19) div 20"))
    val j = withCum.join(tot, "scope")
    val p50 = j.filter(col("cum") >= col("rk50")
        && col("cum") - col("cnt") < col("rk50"))
      .select(col("scope"), col("v_c").as("exact_p50_c"))
    val p95 = j.filter(col("cum") >= col("rk95")
        && col("cum") - col("cnt") < col("rk95"))
      .select(col("scope"), col("v_c").as("exact_p95_c"))
    p50.join(p95, "scope")
  }

  /** Oracle body shared by probe and rollup: `eCte` supplies the scoped
    * (scope, v_c) rows; the rest is the percentile-disc location query. */
  private def oracleFor(eCte: String): String =
    s"""WITH e AS ($eCte),
       |vc AS (SELECT scope, v_c, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
       |cum AS (
       |  SELECT scope, v_c, cnt,
       |    SUM(cnt) OVER (PARTITION BY scope ORDER BY v_c) AS cum
       |  FROM vc),
       |tot AS (
       |  SELECT scope, CAST(SUM(cnt) AS BIGINT) AS n_rows,
       |    (SUM(cnt) + 1) // 2 AS rk50,
       |    (19 * SUM(cnt) + 19) // 20 AS rk95
       |  FROM vc GROUP BY 1),
       |p50 AS (
       |  SELECT c.scope, c.v_c AS exact_p50_c FROM cum c JOIN tot t USING (scope)
       |  WHERE c.cum >= t.rk50 AND c.cum - c.cnt < t.rk50),
       |p95 AS (
       |  SELECT c.scope, c.v_c AS exact_p95_c FROM cum c JOIN tot t USING (scope)
       |  WHERE c.cum >= t.rk95 AND c.cum - c.cnt < t.rk95)
       |SELECT t.scope, t.n_rows, p50.exact_p50_c, p95.exact_p95_c,
       |  p50.exact_p50_c // ${W} AS p50_bucket,
       |  p95.exact_p95_c // ${W} AS p95_bucket
       |FROM tot t JOIN p50 USING (scope) JOIN p95 USING (scope)""".stripMargin

  /** Stream-maintained + COMPACTED twin of the registered store (the
    * [[SketchStore]] pattern): three deterministic epoch slices by
    * user_id mod 3, folded through [[compact]] — oracle-gates the whole
    * land→guard→fold pipeline. SUM-merge makes the folded store
    * row-identical to the batch build, so the DETERMINISTIC quantile
    * oracle must hash-match exactly. */
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

  private val probeOracle: String = oracleFor(
    """
      |  SELECT 'wk:' || CAST(CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS VARCHAR) AS scope,
      |    CAST(round(value * 100) AS BIGINT) AS v_c
      |  FROM events
      |  UNION ALL
      |  SELECT 'all' AS scope, CAST(round(value * 100) AS BIGINT) AS v_c
      |  FROM events""".stripMargin)

  /** Range-quantile probe FROM THE STORE (per ISO week + full span): the
    * p50/p95 BUCKETS come from merged stored rows only; the exact
    * quantiles (recomputed from facts) are the oracle-reproducible truth
    * — hash equality requires store-bucket == exact div W for every
    * scope and both percentiles. */
  lazy val probeQuery: GraftQuery = q("hist_store_probe", probeOracle) { (s, d) =>
    probeFrom(s, d, storeDir(s, d))
  }

  /** The SAME probe against the stream-maintained compacted store. */
  lazy val compactedProbeQuery: GraftQuery =
    q("hist_store_compacted_probe", probeOracle) { (s, d) =>
      probeFrom(s, d, maintainedDir(s, d))
    }

  private def probeFrom(s: SparkSession, d: String, dir: String): DataFrame = {
      val st = readStore(s, dir)
        .withColumn("scope", concat(lit("wk:"),
          to_date(date_trunc("week", col("day"))).cast("string")))
      val mergedWk = st.groupBy(col("scope"), col("bucket"))
        .agg(sum(col("cnt")).as("cnt"))
      val mergedAll = st.groupBy(col("bucket")).agg(sum(col("cnt")).as("cnt"))
        .select(lit("all").as("scope"), col("bucket"), col("cnt"))
      val fromStore = rankBuckets(mergedWk.unionByName(mergedAll))
      val e = cents(Tables.events(s, d))
      val scoped = e.select(concat(lit("wk:"),
          to_date(date_trunc("week", col("day"))).cast("string")).as("scope"),
          col("v_c"))
        .unionByName(e.select(lit("all").as("scope"), col("v_c")))
      fromStore.join(exactQuantiles(scoped), "scope")
        .select(col("scope"), col("n_rows"),
          col("exact_p50_c"), col("exact_p95_c"),
          col("p50_bucket"), col("p95_bucket"))
  }

  /** The cube property on the type axis: the same (day, type, bucket)
    * store rolls up to per-type full-span quantile buckets by SUM merge
    * — no fact rescan, bucket equality with the exact side enforced by
    * the hash. */
  lazy val rollupQuery: GraftQuery = q("hist_store_rollup",
    oracleFor(
      """
        |  SELECT event_type AS scope,
        |    CAST(round(value * 100) AS BIGINT) AS v_c
        |  FROM events""".stripMargin)) { (s, d) =>
    val dir = storeDir(s, d)
    val merged = readStore(s, dir)
      .groupBy(col("event_type").as("scope"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val e = cents(Tables.events(s, d))
      .select(col("event_type").as("scope"), col("v_c"))
    rankBuckets(merged).join(exactQuantiles(e), "scope")
      .select(col("scope"), col("n_rows"),
        col("exact_p50_c"), col("exact_p95_c"),
        col("p50_bucket"), col("p95_bucket"))
  }
}
