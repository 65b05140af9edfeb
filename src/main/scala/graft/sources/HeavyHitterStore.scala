package graft.sources

import graft.GraftQuery
import graft.GraftQuery.q
import graft.ops.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The fourth mergeable summary cube, completing the quartet — counts
  * (plain SUM), distincts ([[SketchStore]], HLL register max), quantiles
  * ([[HistStore]], bucket-count SUM) — with HEAVY HITTERS: per day the
  * store keeps the exact counts of the top-K keys plus the day's
  * truncation threshold t = the (K+1)-th largest count (0 when nothing
  * was dropped). That pair is the classic mergeable top-k summary (the
  * Misra-Gries / Space-Saving guarantee in its simplest persisted form):
  * for any day range,
  *
  *   est(key) = Σ stored counts  ≤  true(key)  ≤  est(key) + Σ t(day)
  *                                              (sum over days where the
  *                                               key was truncated away)
  *
  * — the lower bound because stored counts are exact per-day counts, the
  * upper because a truncated key's day count can never exceed that day's
  * threshold. Both bounds are THEOREMS, so the probe's `within_bound`
  * verdict is deterministic and the whole output hash-checks against the
  * oracle's replica of the same summary.
  *
  * The store build runs through the engine's own [[graft.plans.TopKPerKey]]
  * operator (map-side bounded-heap pruning before the exchange) — at
  * 100 TB per-day key cardinality is corpus-scale, and selecting K+1 of
  * them is exactly the workload that operator exists for; the ranking
  * window that splits kept rows from the threshold then runs on ≤ K+1
  * rows per day by construction. The store itself is |days| × (K+1) rows
  * — corpus-size-independent, like its three siblings.
  */
object HeavyHitterStore {

  /** Counters kept per day (the summary's K). */
  val K = 20

  /** Per-day summary: kind 'top' rows carry the exact counts of the K
    * heaviest keys (ties broken by key), the single kind 'thr' row per
    * day carries the truncation threshold as cnt (user_id = -1). */
  private[sources] def dailySummaries(s: SparkSession, events: DataFrame): DataFrame = {
    if (!s.experimental.extraStrategies.contains(graft.plans.TopKPerKeyStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
    val dayCounts = events
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val topK1 = graft.plans.TopKPerKey(dayCounts,
      keys = Seq("day"), orderBy = Seq(("cnt", true), ("user_id", false)), k = K + 1)
    // rank within the ≤ K+1 surviving rows per day (bounded window)
    val rk = topK1.withColumn("rn", row_number().over(
      Window.partitionBy(col("day")).orderBy(col("cnt").desc, col("user_id"))))
    val kept = rk.filter(col("rn") <= K)
      .select(col("day"), col("user_id"), col("cnt"), lit("top").as("kind"))
    val thr = rk.groupBy(col("day"))
      .agg(coalesce(max(when(col("rn") === K + 1, col("cnt"))), lit(0L)).as("cnt"))
      .select(col("day"), lit(-1L).as("user_id"), col("cnt"), lit("thr").as("kind"))
    kept.unionByName(thr)
  }

  def build(s: SparkSession, events: DataFrame, dir: String): Unit =
    dailySummaries(s, events).coalesce(1).write.mode("overwrite").parquet(dir)

  private lazy val root: String =
    s"${sys.props("java.io.tmpdir")}/graft_hh_store/${java.util.UUID.randomUUID()}"
  private val built = scala.collection.mutable.Map.empty[String, String]
  private def storeDir(s: SparkSession, d: String): String =
    built.synchronized {
      built.getOrElseUpdate(d, {
        val dir = s"$root/${new java.io.File(d).getName}"
        val path = new org.apache.hadoop.fs.Path(dir)
        path.getFileSystem(s.sparkContext.hadoopConfiguration).deleteOnExit(path)
        build(s, Tables.events(s, d), dir)
        dir
      })
    }

  /** Full-span top-10 probe: for the EXACT top-10 keys (the verification
    * side the oracle requires), the estimate and slack come from STORED
    * rows only; `within_bound` states the summary theorem and must be
    * TRUE row-for-row. */
  lazy val probeQuery: GraftQuery = q("hh_store_probe",
    s"""WITH dc AS (
       |  SELECT CAST(ts AS DATE) AS day, user_id, COUNT(*) AS n
       |  FROM events GROUP BY 1, 2),
       |rk AS (
       |  SELECT day, user_id, n,
       |    row_number() OVER (PARTITION BY day ORDER BY n DESC, user_id) AS rn
       |  FROM dc),
       |kept AS (SELECT day, user_id, n FROM rk WHERE rn <= ${K}),
       |thr AS (
       |  SELECT day, COALESCE(MAX(CASE WHEN rn = ${K + 1} THEN n END), 0) AS t
       |  FROM rk GROUP BY 1),
       |tot AS (SELECT user_id, CAST(SUM(n) AS BIGINT) AS exact_n
       |  FROM dc GROUP BY 1),
       |top10 AS (SELECT user_id, exact_n FROM tot
       |  ORDER BY exact_n DESC, user_id LIMIT 10),
       |est AS (
       |  SELECT t10.user_id, CAST(COALESCE(SUM(k.n), 0) AS BIGINT) AS est_n
       |  FROM top10 t10 LEFT JOIN kept k ON k.user_id = t10.user_id
       |  GROUP BY 1),
       |sl AS (
       |  SELECT t10.user_id,
       |    CAST(SUM(CASE WHEN k.user_id IS NULL THEN th.t ELSE 0 END) AS BIGINT)
       |      AS slack_n
       |  FROM top10 t10 CROSS JOIN thr th
       |  LEFT JOIN kept k ON k.day = th.day AND k.user_id = t10.user_id
       |  GROUP BY 1)
       |SELECT t10.user_id, t10.exact_n, e.est_n, s.slack_n,
       |  e.est_n <= t10.exact_n AND t10.exact_n <= e.est_n + s.slack_n
       |    AS within_bound
       |FROM top10 t10 JOIN est e ON e.user_id = t10.user_id
       |JOIN sl s ON s.user_id = t10.user_id""".stripMargin) { (s, d) =>
    val dir = storeDir(s, d)
    val st = s.read.parquet(dir)
    val kept = st.filter(col("kind") === "top").select(col("day"), col("user_id"), col("cnt"))
    val thr = st.filter(col("kind") === "thr").select(col("day"), col("cnt").as("t"))
    // verification side: exact full-span top-10 from facts
    val tot = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id")).agg(sum(col("n")).as("exact_n"))
    val top10 = broadcast(tot
      .orderBy(col("exact_n").desc, col("user_id")).limit(10))
    // estimate + slack FROM THE STORE against the 10-row broadcast
    val est = top10.join(kept, Seq("user_id"), "left")
      .groupBy(col("user_id")).agg(coalesce(sum(col("cnt")), lit(0L)).as("est_n"))
    val slack = top10.select(col("user_id")).crossJoin(broadcast(thr))
      .join(kept.select(col("day"), col("user_id"), lit(1).as("present")),
        Seq("day", "user_id"), "left")
      .groupBy(col("user_id"))
      .agg(sum(when(col("present").isNull, col("t")).otherwise(0L)).as("slack_n"))
    top10.join(est, "user_id").join(slack, "user_id")
      .select(col("user_id"), col("exact_n"), col("est_n"), col("slack_n"),
        (col("est_n") <= col("exact_n")
          && col("exact_n") <= col("est_n") + col("slack_n")).as("within_bound"))
  }
}
