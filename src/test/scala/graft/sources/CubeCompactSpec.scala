package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The [[CubeLog]] compaction contract on all three streaming-maintained
  * cubes: (1) probe answers are invariant under compaction; (2) the
  * directory count actually drops (the small-files repair); (3) replays
  * of PRE-compaction epochs stay exactly-once (the watermark guard — the
  * folded directory must not be re-created and sums must not
  * double-count); (4) an uncommitted fold (crash before the marker) is
  * invisible to readers; (5) epochs landing after a compaction
  * participate in the next one. Plus the HeavyHitterStore quartet-closing
  * theorem: a stream-built store answers at SUMMARY grain row-for-row
  * like the batch build, before AND after compaction with finalization.
  */
class CubeCompactSpec extends SparkSpec {
  import spark.implicits._

  private def dirNames(dir: String): Set[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString)
      // writer claims (r15 single-writer guard) are commit metadata like
      // _cube_commits; the data/generation dir pins ignore them
      .filterNot(_ == "_claims").toSet

  private def landThree(append: (org.apache.spark.sql.DataFrame, Long) => Unit): Unit = {
    val events = graft.ops.Tables.events(spark, sf0001)
    (0L to 2L).foreach { ep =>
      append(events.filter(pmod($"user_id", lit(3L)) === ep), ep)
    }
  }

  test("SketchStore: compaction folds epochs, probe-invariant, replay exactly-once") {
    val dir = Files.createTempDirectory("cube_sketch_").toString + "/daily"
    landThree(SketchStore.appendBatch(_, dir, _))
    def est() = SketchStore.readStore(spark, dir)
      .groupBy($"day")
      .agg(hll_sketch_estimate(hll_union_agg($"sketch")).as("est"),
        sum($"n_rows").as("n"))
      .as[(java.sql.Date, Long, Long)].collect().toSet
    val before = est()
    assert(dirNames(dir) === Set("batch_id=0", "batch_id=1", "batch_id=2"))

    // crash-sim: an orphan fold without a commit marker is invisible
    SketchStore.readStore(spark, dir).limit(1)
      .write.mode("overwrite").parquet(s"$dir/folded_gen=99")
    assert(est() === before, "uncommitted fold must not be read")
    val fsp = new org.apache.hadoop.fs.Path(s"$dir/folded_gen=99")
    fsp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(fsp, true)

    val gen = SketchStore.compact(spark, dir)
    assert(gen === 1L)
    assert(est() === before, "compaction must not change probe answers")
    // GRACE: the batch dirs this fold absorbed survive one cycle (a
    // concurrent reader holding the pre-commit view still needs them);
    // readers ignore them via the watermark regardless
    assert(dirNames(dir) === Set("folded_gen=1", "_cube_commits",
      "batch_id=0", "batch_id=1", "batch_id=2"))

    // replay of a folded epoch: watermark guard no-ops — the retained dir
    // is untouched, answers unchanged
    val events = graft.ops.Tables.events(spark, sf0001)
    SketchStore.appendBatch(events.filter(pmod($"user_id", lit(3L)) === 1L), dir, 1L)
    assert(est() === before, "post-compaction replay must stay exactly-once")

    // a NEW epoch still lands and the next compaction folds it; the
    // grace-expired batch dirs (≤ the PREVIOUS watermark) are swept now,
    // the previous fold and the just-folded epoch stay one more cycle
    SketchStore.appendBatch(events.limit(0), dir, 3L) // empty batch is harmless
    SketchStore.appendBatch(events.filter($"user_id" === 1L), dir, 4L)
    assert(dirNames(dir).contains("batch_id=4"))
    assert(SketchStore.compact(spark, dir) === 2L)
    assert(dirNames(dir) === Set("folded_gen=1", "folded_gen=2",
      "batch_id=3", "batch_id=4", "_cube_commits")) // 3-4 grace-retained
    // user 1's rows were double-landed on purpose (epoch 1 carried them);
    // HLL forgives multiplicity, n_rows reflects the extra landing
    val after = est()
    assert(after.map(_._1) === before.map(_._1))

    // a third cycle: generation 1's grace expires, the store stays
    // bounded at ≤ 2 folds + ≤ 1 cycle of batch dirs
    SketchStore.appendBatch(events.filter($"user_id" === 2L), dir, 5L)
    assert(SketchStore.compact(spark, dir) === 3L)
    assert(dirNames(dir) === Set("folded_gen=2", "folded_gen=3",
      "batch_id=5", "_cube_commits"))
  }

  test("torn commit marker: readers fall back to the committed generation; the compactor errors instead of cleaning up") {
    val dir = Files.createTempDirectory("cube_torn_").toString + "/daily"
    landThree(SketchStore.appendBatch(_, dir, _))
    def est() = SketchStore.readStore(spark, dir)
      .groupBy($"day")
      .agg(hll_sketch_estimate(hll_union_agg($"sketch")).as("est"),
        sum($"n_rows").as("n"))
      .as[(java.sql.Date, Long, Long)].collect().toSet
    assert(SketchStore.compact(spark, dir) === 1L)
    val committed = est()

    // a new epoch lands, then a crashed/raced compactor leaves a TORN
    // (empty) marker for the next generation
    val events = graft.ops.Tables.events(spark, sf0001)
    SketchStore.appendBatch(events.filter($"user_id" === 1L), dir, 3L)
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_cube_commits/2")
    val hfs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.create(marker, true).close() // zero bytes: unparsable watermark

    // readers skip the unparsable marker and resolve generation 1 — the
    // store answers as if the torn commit never happened
    val v = CubeLog.view(spark, dir)
    assert(v.gen === 1L, "torn marker must not become the read generation")
    assert(v.liveBatches.map(_._1) === Seq(3L),
      "the post-fold epoch must stay live under the fallback generation")
    assert(est() !== committed, "epoch 3's rows must be visible")

    // the compactor targets generation 2, finds the marker already
    // present, and must FAIL before any cleanup — deleting batch dirs
    // against a commit that never happened is the order that loses data
    val err = intercept[IllegalArgumentException] {
      SketchStore.compact(spark, dir)
    }
    assert(err.getMessage.contains("generation 2"))
    assert(dirNames(dir).contains("batch_id=3"),
      "the failed compaction must not have swept the live epoch")
    assert(CubeLog.view(spark, dir).gen === 1L,
      "the store remains readable at the committed generation")
  }

  test("single-generation store with a torn marker serves the complete gen-0 view (nothing was ever swept)") {
    val dir = Files.createTempDirectory("cube_gen1torn_").toString + "/daily"
    landThree(SketchStore.appendBatch(_, dir, _))
    def est() = SketchStore.readStore(spark, dir)
      .groupBy($"day")
      .agg(hll_sketch_estimate(hll_union_agg($"sketch")).as("est"),
        sum($"n_rows").as("n"))
      .as[(java.sql.Date, Long, Long)].collect().toSet
    val before = est()
    assert(SketchStore.compact(spark, dir) === 1L)
    // gen 1's cleanup deleted nothing (previous watermark was -1): tearing
    // its marker must fall back to the COMPLETE gen-0 view, not fail
    val m1 = new org.apache.hadoop.fs.Path(s"$dir/_cube_commits/1")
    val hfs = m1.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.create(m1, true).close() // zero bytes
    val v = CubeLog.view(spark, dir)
    assert(v.gen === 0L && v.watermark === -1L)
    assert(v.liveBatches.map(_._1) === Seq(0L, 1L, 2L))
    assert(est() === before, "the gen-0 fallback must serve every landed epoch")
    // and the fsck classifies it as recoverable, not an error
    val findings = StoreCheck.checkCubeLog(spark, dir)
    assert(findings.exists(f => f.check == "torn-marker" && f.severity == "warn"),
      s"gen-1-only torn marker must be a warn, got $findings")
  }

  test("marker corrupted AFTER its commit: the grace generation recovers COMPLETE data; loud only beyond it") {
    // Generation 2 committed and its cleanup ran, then the gen-2 marker's
    // CONTENT was corrupted by an FS fault. The grace generation makes
    // this recoverable: cleanup retained gen 1's fold + marker AND the
    // epochs gen 2 folded, so the fallback view (fold 1 + retained live
    // epochs above watermark(1)) reconstructs the complete store
    // exactly-once. The failure only becomes loud when the grace window
    // itself is gone.
    val dir = Files.createTempDirectory("cube_corrupt_").toString + "/daily"
    landThree(SketchStore.appendBatch(_, dir, _))
    def est() = SketchStore.readStore(spark, dir)
      .groupBy($"day")
      .agg(hll_sketch_estimate(hll_union_agg($"sketch")).as("est"),
        sum($"n_rows").as("n"))
      .as[(java.sql.Date, Long, Long)].collect().toSet
    assert(SketchStore.compact(spark, dir) === 1L)
    SketchStore.appendBatch(
      graft.ops.Tables.events(spark, sf0001).filter($"user_id" === 1L), dir, 3L)
    assert(SketchStore.compact(spark, dir) === 2L)
    val committed = est() // the complete gen-2 answers
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // corrupt the committed gen-2 marker in place (fold dir present):
    // readers fall back to generation 1 and STILL answer completely —
    // epoch 3 is above watermark(1) and its dir survives under grace
    val m2 = new org.apache.hadoop.fs.Path(s"$dir/_cube_commits/2")
    hfs.create(m2, true).close() // now zero bytes
    val v = CubeLog.view(spark, dir)
    assert(v.gen === 1L, "readers must fall back to the grace generation")
    assert(v.liveBatches.map(_._1) === Seq(3L),
      "the grace-retained epoch must be live under the fallback view")
    assert(est() === committed,
      "the fallback view must reconstruct the complete store exactly-once")

    // beyond the grace window the loss is real and must be loud:
    // (a) the fallback generation's fold is gone too — the resolved
    // marker has no data behind it
    hfs.delete(new org.apache.hadoop.fs.Path(s"$dir/folded_gen=1"), true)
    val errA = intercept[IllegalArgumentException](CubeLog.view(spark, dir))
    assert(errA.getMessage.contains("folded_gen=1 is missing"),
      s"expected the missing-fold failure, got: ${errA.getMessage}")

    // (b) NO marker parses at all while a committed fold exists — the
    // gen-0 default view would silently drop every folded epoch
    hfs.delete(new org.apache.hadoop.fs.Path(s"$dir/_cube_commits/1"), false)
    val errB = intercept[IllegalArgumentException](CubeLog.view(spark, dir))
    assert(errB.getMessage.contains("unreadable"),
      s"expected the corrupt-committed-marker failure, got: ${errB.getMessage}")
  }

  test("HistStore: compacted store is row-identical to the batch build; replay exactly-once") {
    val dir = Files.createTempDirectory("cube_hist_").toString + "/daily"
    landThree(HistStore.appendBatch(_, dir, _))
    val events = graft.ops.Tables.events(spark, sf0001)
    def merged() = HistStore.readStore(spark, dir)
      .groupBy($"day", $"event_type", $"bucket")
      .agg(sum($"cnt").as("cnt"))
      .as[(java.sql.Date, String, Long, Long)].collect().toSet
    val expect = HistStore.dailyHistograms(events)
      .as[(java.sql.Date, String, Long, Long)].collect().toSet
    assert(merged() === expect, "stream partials must sum to the batch histogram")

    assert(HistStore.compact(spark, dir) === 1L)
    assert(merged() === expect, "compaction must preserve the histogram exactly")
    // after the fold the store IS one row per (day,type,bucket)
    val storeRows = HistStore.readStore(spark, dir)
      .as[(java.sql.Date, String, Long, Long)].collect().toSet
    assert(storeRows === expect, "folded store must be row-identical to the batch build")
    assert(dirNames(dir) === Set("folded_gen=1", "_cube_commits",
      "batch_id=0", "batch_id=1", "batch_id=2")) // grace-retained, reader-ignored

    // replay of folded epoch 0: SUM algebra does NOT forgive double-count
    // — the watermark guard must make it a no-op
    HistStore.appendBatch(events.filter(pmod($"user_id", lit(3L)) === 0L), dir, 0L)
    assert(merged() === expect, "post-compaction replay double-counted")
  }

  test("HeavyHitterStore: stream-built ≡ batch-built at summary grain, pre and post compaction") {
    val dir = Files.createTempDirectory("cube_hh_").toString + "/daily"
    val batchDir = Files.createTempDirectory("cube_hh_batch_").toString + "/daily"
    val events = graft.ops.Tables.events(spark, sf0001)
    HeavyHitterStore.build(spark, events, batchDir)
    landThree(HeavyHitterStore.appendBatch(_, dir, _))

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"day", $"user_id", $"cnt", $"kind")
      .as[(java.sql.Date, Long, Long, String)].collect().toSet
    val expect = rows(spark.read.parquet(batchDir))

    // BEFORE compaction: the summaries() fold already matches the batch
    // build row-for-row (partials are exact and sum-mergeable)
    assert(rows(HeavyHitterStore.summaries(spark, dir)) === expect,
      "stream-built summaries must equal the batch build before compaction")

    // compact with every day closed: the STORE ITSELF becomes the
    // canonical K-bounded form, row-identical to the batch build
    assert(HeavyHitterStore.compact(spark, dir, Some("9999-12-31")) === 1L)
    assert(rows(CubeLog.read(spark, dir)) === expect,
      "finalized store rows must equal the batch build")
    assert(rows(HeavyHitterStore.summaries(spark, dir)) === expect)
    assert(dirNames(dir) === Set("folded_gen=1", "_cube_commits",
      "batch_id=0", "batch_id=1", "batch_id=2")) // grace-retained, reader-ignored

    // replay of a folded epoch: counts must not double
    HeavyHitterStore.appendBatch(
      events.filter(pmod($"user_id", lit(3L)) === 2L), dir, 2L)
    assert(rows(HeavyHitterStore.summaries(spark, dir)) === expect,
      "post-compaction replay double-counted the heavy-hitter store")

    // open-day semantics: without a cutoff the fold keeps lossless 'part'
    // rows — a second store folded open then closed converges to the same
    val dir2 = Files.createTempDirectory("cube_hh2_").toString + "/daily"
    landThree(HeavyHitterStore.appendBatch(_, dir2, _))
    assert(HeavyHitterStore.compact(spark, dir2, None) === 1L)
    val open = CubeLog.read(spark, dir2)
    assert(open.filter($"kind" =!= "part").count() === 0L)
    // lossless: one merged row per (day,key), exact counts
    assert(rows(HeavyHitterStore.summaries(spark, dir2)) === expect)
    // closing the day on a QUIET store (no epochs since the last fold)
    // must still re-fold — the force path — and converge exactly
    assert(HeavyHitterStore.compact(spark, dir2, Some("9999-12-31")) === 2L)
    assert(rows(CubeLog.read(spark, dir2)) === expect,
      "open-then-closed fold must converge to the batch build")
  }

  test("HeavyHitterStore: a late partial for a finalized day fails loudly — no duplicate per-day summaries") {
    val dir = Files.createTempDirectory("cube_hh_late_").toString + "/daily"
    val events = graft.ops.Tables.events(spark, sf0001)
    landThree(HeavyHitterStore.appendBatch(_, dir, _))
    HeavyHitterStore.compact(spark, dir, finalizeBefore = Some("9999-12-31"))
    val days = HeavyHitterStore.summaries(spark, dir)
      .select($"day").distinct().count()

    // a NEW epoch (above the watermark, so the replay guard lets it in)
    // carries late rows for days the finalization already closed
    HeavyHitterStore.appendBatch(events.filter($"user_id" === 1L), dir, 7L)
    val errS = intercept[IllegalArgumentException] {
      HeavyHitterStore.summaries(spark, dir).collect()
    }
    assert(errS.getMessage.contains("finalized day"))
    val errC = intercept[IllegalArgumentException] {
      HeavyHitterStore.compact(spark, dir)
    }
    assert(errC.getMessage.contains("finalized day"))

    // the repair the error message names: drop the late epoch, re-land
    // the affected days via appendDay from complete facts — then the
    // store answers again (day count unchanged: appendDay is canonical)
    val bp = new org.apache.hadoop.fs.Path(s"$dir/batch_id=7")
    bp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(bp, true)
    assert(HeavyHitterStore.summaries(spark, dir)
      .select($"day").distinct().count() === days)
  }

  test("appendDay lands canonical complete-day summaries beside a build") {
    val dir = Files.createTempDirectory("cube_hh_day_").toString + "/daily"
    val events = graft.ops.Tables.events(spark, sf0001).cache()
    try {
      val days = events.select(to_date($"ts").as("d")).distinct()
        .orderBy($"d").as[java.sql.Date].collect()
      assert(days.length >= 2)
      val (head, tail) = (days.head, days.tail.toSet)
      HeavyHitterStore.build(spark,
        events.filter(to_date($"ts") === head), dir)
      HeavyHitterStore.appendDay(spark,
        events.filter(to_date($"ts").isin(tail.toSeq: _*)), dir)
      val expect = HeavyHitterStore.dailySummaries(spark, events)
        .as[(java.sql.Date, Long, Long, String)].collect().toSet
      val got = HeavyHitterStore.summaries(spark, dir)
        .as[(java.sql.Date, Long, Long, String)].collect().toSet
      assert(got === expect)
    } finally events.unpersist()
  }

  test("an in-flight epoch dir (only _temporary inside) is invisible to readers and folds — the offline-compactor race") {
    val dir = Files.createTempDirectory("cube_inflight_").toString + "/vec"
    val emb = graft.ops.Tables.embeddingsParallel(spark, sf0001)
      .select($"vec_id", $"label", $"embedding")
    VecStoreLog.appendBatch(emb.filter($"vec_id" % 2 === 0), dir, 0L)

    // simulate a landing mid-write: the committer's staging dir exists,
    // no data file has committed yet (exactly what the ivfpq streaming
    // sweep's mid-run fold collided with)
    Files.createDirectories(Paths.get(s"$dir/batch_id=1/_temporary/0"))

    val v = CubeLog.view(spark, dir)
    assert(v.liveBatches.map(_._1) === Seq(0L),
      "a half-written epoch must not appear in the reader view")
    // the fold proceeds over committed epochs only; the pending dir is
    // neither absorbed nor swept, and the watermark does not skip past it
    VecStoreLog.compact(spark, dir, cellK = Some(VecStore.CellK))
    val v2 = CubeLog.view(spark, dir)
    assert(v2.gen === 1L && v2.watermark === 0L)
    assert(Files.exists(Paths.get(s"$dir/batch_id=1/_temporary/0")))

    // the landing completes (the overwrite-idempotent replay shape):
    // epoch 1 becomes visible and probes serve base ∪ delta
    VecStoreLog.appendBatch(emb.filter($"vec_id" % 2 === 1), dir, 1L)
    assert(CubeLog.view(spark, dir).liveBatches.map(_._1) === Seq(1L))
    assert(VecStoreLog.vectors(spark, dir).count() === emb.count())
  }
}
