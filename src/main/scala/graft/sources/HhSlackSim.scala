package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** YEAR-SHAPED maintenance simulation for [[HeavyHitterStore]]: how fast
  * does the summary's slack bound widen under long-running maintenance?
  *
  * The store's range answer is est(key) = Σ stored day counts with slack
  * Σ t(day) over the days the key was truncated — both exact theorems per
  * day, but the UPPER bound widens additively with every merged day on
  * which the key fell outside the kept top-K. This runner measures that
  * growth on a deterministic one-year workload with the churn shape that
  * actually stresses it (a persistent head the summary always keeps +
  * per-key pseudo-random daily spikes that rotate mid-rank keys through
  * the truncation boundary), maintained exactly as a deployment would:
  * 365 daily [[HeavyHitterStore.appendBatch]] landings with a
  * [[HeavyHitterStore.compact]] (finalize) every 7 days, at two K values.
  *
  * For each trailing span (7/30/90/180/365 days) it reports, over the
  * span's TRUE top-10 keys: mean est/true (how much of the answer is
  * exact) and mean/max slack/true (how loose the upper bound got), after
  * `require`-checking est ≤ true ≤ est+slack row-for-row. The printed
  * markdown table is the SCALING.md section's source.
  *
  * Workload (all integer-deterministic, no RNG):
  *   cnt(day d, key k) = P(k) + R(d,k)
  *   P(k) = max(0, 45 − k)              — persistent head, keys 0..44
  *   R(d,k) = 50 / (1 + (k·31 + d·17) mod 97) — rotating daily spikes,
  *            keys 0..1999 (each day a ~20-key cohort spikes to 50,
  *            ABOVE the persistent head — so at K=20 the day's kept set
  *            is mostly that day's spikers and the year's true top keys
  *            are truncated on most days, the adversarial regime; at
  *            K=100 the head fits under the threshold's far side)
  *
  * Run: `sbt "runMain graft.sources.HhSlackSim"` (optionally
  * SPARK_GRAFT_HH_DAYS=90 for a quick pass).
  */
object HhSlackSim {

  private val NKeys = 2000
  private val Spans = Seq(7, 30, 90, 180, 365)

  /** The workload's measured shape constants: ~20 keys spike above the
    * head each day (R(d,k) = 50 at (k·31 + d·17) mod 97 = 0 over 2000
    * keys ≈ 20.6/day) and the probed spans verify the head's top keys —
    * [[HeavyHitterStore.kFor]]'s inputs for THIS workload, pinned by
    * KSizingSpec against a re-run of the landings at reduced days. */
  val SpikeCohort = 20
  val ExactHeadWidth = 20

  /** Exact per-(day, key) counts of the whole simulated year — the
    * ground truth AND the generator feeding the store landings
    * (package-visible: KSizingSpec re-drives the same workload). */
  private[sources] def truth(spark: SparkSession, days: Int): DataFrame =
    spark.range(days.toLong)
      .select(col("id").cast("int").as("d"))
      .crossJoin(broadcast(spark.range(NKeys.toLong)
        .select(col("id").as("user_id"))))
      .withColumn("p",
        greatest(lit(0L), lit(45L) - col("user_id")))
      .withColumn("r",
        (lit(50L) / (lit(1L) + pmod(col("user_id") * 31 + col("d") * 17,
          lit(97L)))).cast("long"))
      .withColumn("cnt", col("p") + col("r"))
      .filter(col("cnt") > 0)
      .withColumn("day", date_add(lit("2026-01-01").cast("date"), col("d")))
      .select(col("d"), col("day"), col("user_id"), col("cnt"))

  /** One day's counts exploded back into event rows (ts carries only the
    * date — that's all [[HeavyHitterStore.appendBatch]]'s dayCounts
    * keeps), so the store is driven through its REAL landing surface. */
  private[sources] def eventsOf(dayCounts: DataFrame): DataFrame =
    dayCounts
      .select(col("day").cast("timestamp").as("ts"), col("user_id"),
        explode(sequence(lit(1L), col("cnt"))).as("i"))
      .drop("i")

  private def runFor(spark: SparkSession, days: Int, k: Int): Seq[String] = {
    val dir = s"${sys.props("java.io.tmpdir")}/graft_hh_slack_k$k" +
      s"_${java.util.UUID.randomUUID()}"
    val t = truth(spark, days)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val t0 = System.nanoTime()
      (0 until days).foreach { d =>
        HeavyHitterStore.appendBatch(
          eventsOf(t.filter(col("d") === d)), dir, d.toLong)
        // weekly maintenance: finalize every complete day so far
        if (d % 7 == 6 || d == days - 1) {
          val cutoff = java.time.LocalDate.parse("2026-01-01").plusDays(d + 1L)
          HeavyHitterStore.compact(spark, dir, Some(cutoff.toString), k)
        }
      }
      val maintainMs = (System.nanoTime() - t0) / 1000000L
      val st = HeavyHitterStore.summaries(spark, dir, k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      st.count()
      val kept = st.filter(col("kind") === "top")
        .select(col("day"), col("user_id"), col("cnt"))
      val thr = st.filter(col("kind") === "thr")
        .select(col("day"), col("cnt").as("t"))
      val lastDay = days - 1
      val rows = Spans.filter(_ <= days).map { span =>
        val from = lastDay - span + 1
        val spanT = t.filter(col("d") >= from)
        val top10 = broadcast(spanT.groupBy(col("user_id"))
          .agg(sum(col("cnt")).as("true_n"))
          .orderBy(col("true_n").desc, col("user_id")).limit(10))
        val spanDays = spanT.select(col("day")).distinct()
        val est = top10.join(kept.join(spanDays, "day"), Seq("user_id"), "left")
          .groupBy(col("user_id"), col("true_n"))
          .agg(coalesce(sum(col("cnt")), lit(0L)).as("est_n"))
        val slack = top10.select(col("user_id"))
          .crossJoin(broadcast(thr.join(spanDays, "day")))
          .join(kept.select(col("day"), col("user_id"), lit(1).as("pr")),
            Seq("day", "user_id"), "left")
          .groupBy(col("user_id"))
          .agg(sum(when(col("pr").isNull, col("t")).otherwise(0L)).as("slack_n"))
        val m = est.join(slack, "user_id")
          .select(
            count(lit(1)).as("n"),
            sum(when(col("est_n") <= col("true_n")
              && col("true_n") <= col("est_n") + col("slack_n"), 1L)
              .otherwise(0L)).as("ok"),
            avg(col("est_n").cast("double") / col("true_n")).as("est_ratio"),
            avg(col("slack_n").cast("double") / col("true_n")).as("mean_slack"),
            max(col("slack_n").cast("double") / col("true_n")).as("max_slack"))
          .head()
        require(m.getLong(0) == m.getLong(1),
          s"summary theorem violated at span=$span k=$k")
        f"| $k | $span | ${m.getDouble(2)}%.3f | ${m.getDouble(3)}%.3f " +
          f"| ${m.getDouble(4)}%.3f | $maintainMs |"
      }
      st.unpersist()
      rows
    } finally {
      t.unpersist()
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-hh-slack-sim")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val days = sys.env.getOrElse("SPARK_GRAFT_HH_DAYS", "365").toInt
    println("| K | trailing span (days) | mean est/true | mean slack/true | max slack/true | maintain ms (year) |")
    println("|---|---|---|---|---|---|")
    // 20 = the shipped store's K (below the ~20-key daily spike cohort:
    // the adversarial regime); 40 = head partially under the threshold;
    // 100 = everything that matters is kept
    Seq(20, 40, 100).foreach { k =>
      runFor(spark, days, k).foreach(println)
    }
    spark.stop()
  }
}
