package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** [[HeavyHitterStore.kFor]] pinned against the MEASURED cliff, not a
  * constant check: HhSlackSim's year-long run showed K=20 (at the daily
  * spike cohort) collapses est/true to 0.08–0.15 while K=40 (cohort +
  * head width = kFor's sum) is EXACT at every span. This spec re-drives
  * the identical integer-deterministic workload at reduced days through
  * the real maintenance surface (appendBatch landings + weekly
  * finalizing compactions) and asserts both sides of the cliff at
  * kFor's output — so a regression in the rule, the summary algebra, or
  * the maintenance path trips a measured boundary, not a comment.
  *
  * Also pins the `_hh_k` sidecar contract (the mixed-k guard): canonical
  * rows record their truncation K; any consumer passing a different K
  * fails loudly instead of answering from a store consistent with
  * neither K. */
class KSizingSpec extends SparkSpec {
  import spark.implicits._

  private val Days = 21

  /** Land the HhSlackSim workload at `k` and return (mean est/true,
    * max slack/true) over the full span's true top-10 keys. */
  private def runAt(k: Int): (Double, Double) = {
    val dir = Files.createTempDirectory(s"hh_ksize_$k").toString + "/store"
    val t = HhSlackSim.truth(spark, Days)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      (0 until Days).foreach { d =>
        HeavyHitterStore.appendBatch(
          HhSlackSim.eventsOf(t.filter($"d" === d)), dir, d.toLong)
        if (d % 7 == 6 || d == Days - 1) {
          val cutoff = java.time.LocalDate.parse("2026-01-01").plusDays(d + 1L)
          HeavyHitterStore.compact(spark, dir, Some(cutoff.toString), k)
        }
      }
      val st = HeavyHitterStore.summaries(spark, dir, k)
      val kept = st.filter($"kind" === "top")
        .select($"user_id", $"day", $"cnt")
        .as[(Long, java.sql.Date, Long)].collect()
      val thr = st.filter($"kind" === "thr")
        .select($"day", $"cnt").as[(java.sql.Date, Long)].collect().toMap
      val top10 = t.groupBy($"user_id").agg(sum($"cnt").as("n"))
        .orderBy($"n".desc, $"user_id").limit(10)
        .as[(Long, Long)].collect()
      val keptBy = kept.groupBy(_._1)
      val ratios = top10.map { case (u, truth) =>
        val mine = keptBy.getOrElse(u, Array.empty)
        val est = mine.map(_._3).sum
        val keptDays = mine.map(_._2).toSet
        val slack = thr.collect { case (d, v) if !keptDays.contains(d) => v }.sum
        assert(est <= truth && truth <= est + slack,
          s"summary theorem violated at k=$k user=$u")
        (est.toDouble / truth, slack.toDouble / truth)
      }
      (ratios.map(_._1).sum / ratios.length, ratios.map(_._2).max)
    } finally t.unpersist()
  }

  test("kFor output sits ABOVE the cliff: exact answers at K = head + cohort") {
    val k = HeavyHitterStore.kFor(
      HhSlackSim.ExactHeadWidth, HhSlackSim.SpikeCohort)
    assert(k === 40) // the year-measured exact boundary
    val (estRatio, maxSlack) = runAt(k)
    assert(estRatio === 1.0,
      s"kFor's K=$k must keep the head every day (measured exact); got est/true=$estRatio")
    assert(maxSlack === 0.0, s"slack must be zero at K=$k; got $maxSlack")
  }

  test("the cohort alone sits BELOW the cliff: est collapses at K = cohort") {
    val (estRatio, maxSlack) = runAt(HhSlackSim.SpikeCohort)
    // year-measured: 0.08–0.15 est/true, slack ~1.0–1.3× truth
    assert(estRatio < 0.3,
      s"K=20 is the measured-useless regime; got est/true=$estRatio")
    assert(maxSlack > 0.5, s"expected wide slack below the cliff; got $maxSlack")
  }

  test("kFor validates its inputs") {
    intercept[IllegalArgumentException](HeavyHitterStore.kFor(0, 20))
    intercept[IllegalArgumentException](HeavyHitterStore.kFor(10, -1))
  }

  test("_hh_k sidecar: canonical K is persisted and a mismatched consumer fails loudly") {
    val dir = Files.createTempDirectory("hh_kpersist").toString + "/store"
    val events = graft.ops.Tables.events(spark, sf0001)
    HeavyHitterStore.build(spark, events, dir, k = 40)
    assert(HeavyHitterStore.storedK(spark, dir) === Some(40))
    // summaries at the store's own K works; the default K=20 must not
    HeavyHitterStore.summaries(spark, dir, k = 40).count()
    val ex = intercept[IllegalArgumentException](
      HeavyHitterStore.summaries(spark, dir))
    assert(ex.getMessage.contains("K=40"))
    // stream-maintained twin: the first FINALIZING compact records K; a
    // later one at a different K fails BEFORE touching data
    val dir2 = Files.createTempDirectory("hh_kpersist2").toString + "/store"
    HeavyHitterStore.appendBatch(events, dir2, 0L)
    HeavyHitterStore.compact(spark, dir2, Some("9999-12-31"), k = 40)
    assert(HeavyHitterStore.storedK(spark, dir2) === Some(40))
    intercept[IllegalArgumentException](
      HeavyHitterStore.compact(spark, dir2, Some("9999-12-31"), k = 20))
    // ... and at the recorded K still proceeds
    HeavyHitterStore.compact(spark, dir2, Some("9999-12-31"), k = 40)
    assert(HeavyHitterStore.summaries(spark, dir2, k = 40)
      .filter($"kind" === "top").count() > 0)
  }
}
