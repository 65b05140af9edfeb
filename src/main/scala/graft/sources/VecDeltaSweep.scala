package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe-cost sweep for the MAINTAINED ANN index ([[VecStoreLog]]):
  * how does probe latency and candidate volume grow with the live-delta
  * fraction — i.e., what does deferring compaction actually cost?
  *
  * The maintained probe = cell-pruned base + brute-scored delta, so per
  * query the candidate count is (probed cells' share of base) +
  * (ALL of delta): candidates grow linearly in the delta fraction with
  * slope n, which is exactly why compaction cadence — not corpus size —
  * bounds the probe. This runner measures it: the same corpus split into
  * folded base + live delta at several fractions, 3 probe reps each
  * (median wall), mean candidates per query from the result itself.
  *
  * Run: `sbt "runMain graft.sources.VecDeltaSweep"` (sf dir via
  * SPARK_GRAFT_SF_DIR, default sf0.1). Prints the SCALING.md table.
  */
object VecDeltaSweep {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-vec-delta-sweep")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val emb = graft.ops.Tables.embeddingsParallel(spark, d)
      .select(col("vec_id"), col("label"), col("embedding"))
      .localCheckpoint(eager = true)
    val n = emb.count()
    val queries = graft.ops.Tables.embeddings(spark, d)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(eager = true)
    val k = VecStore.cellKFor(n)
    val pc = VecStore.probeCellsFor(k)
    println(s"corpus n=$n, derived cell_k=$k, probe_cells=$pc, " +
      s"queries=${queries.count()}")
    println("| delta fraction | delta rows | probe p50 ms (3 reps) | mean cands/query | cands/base-only |")
    println("|---|---|---|---|---|")
    var baseCands = 0.0
    Seq(0.0, 0.05, 0.25, 0.5).foreach { f =>
      val dir = s"${sys.props("java.io.tmpdir")}/graft_vec_delta_" +
        s"${java.util.UUID.randomUUID()}"
      val cut = (n * (1 - f)).toLong
      // deterministic split on vec_id rank: base = first (1-f) share
      VecStoreLog.appendBatch(emb.filter(col("vec_id") < lit(cut)), dir, 0L)
      VecStoreLog.compact(spark, dir, Some(k))
      val deltaRows =
        if (f > 0) {
          VecStoreLog.appendBatch(emb.filter(col("vec_id") >= lit(cut)), dir, 1L)
          n - cut
        } else 0L
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        VecStoreLog.probeTopK(spark, dir, queries, pc).count()
        (System.nanoTime() - t0) / 1000000L
      }.sorted
      val cands = VecStoreLog.probeTopK(spark, dir, queries, pc)
        .groupBy(col("query_id")).agg(first(col("n_cands")).as("c"))
        .agg(avg(col("c"))).head().getDouble(0)
      if (f == 0.0) baseCands = cands
      println(f"| ${f}%.2f | $deltaRows | ${times(1)} | ${cands}%.0f " +
        f"| ${cands / baseCands}%.2f |")
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }

    // Part 2 — the same growth under the AUTO-CADENCE landing path
    // ([[VecStoreLog.appendBatchAuto]]: fold iff the delta fraction
    // could push a probe past [[VecStoreLog.MaxProbeRatio]] × its
    // all-folded twin): the corpus arrives as 20 equal epochs and every
    // step's probe cost is compared against a fresh ALL-FOLDED twin of
    // the identical corpus-so-far — the ratio column is the guarantee
    // the derived trigger buys (the first sweep measured the naive
    // budget-share trigger peaking at 1.44×, which is why the trigger
    // is solved from the bound).
    println()
    println("auto-cadence sweep (20 equal epochs via appendBatchAuto):")
    println("| epoch | corpus rows | folded this step | mean cands/query | all-folded twin | ratio |")
    println("|---|---|---|---|---|---|")
    val adir = s"${sys.props("java.io.tmpdir")}/graft_vec_auto_" +
      s"${java.util.UUID.randomUUID()}"
    val epochs = 20
    var maxRatio = 0.0
    val hconf = spark.sparkContext.hadoopConfiguration
    (0 until epochs).foreach { e =>
      val lo = n * e / epochs
      val hi = n * (e + 1) / epochs
      val slice = emb.filter(col("vec_id") >= lit(lo) && col("vec_id") < lit(hi))
      val folded = VecStoreLog.appendBatchAuto(slice, adir, e.toLong)
      def meanCands(dir: String): Double =
        VecStoreLog.probeTopK(spark, dir, queries,
          VecStore.probeCellsFor(VecStore.cellKFor(hi)))
          .groupBy(col("query_id")).agg(first(col("n_cands")).as("c"))
          .agg(avg(col("c"))).head().getDouble(0)
      val cands = meanCands(adir)
      // the all-folded twin of the identical corpus-so-far
      val tdir = s"${sys.props("java.io.tmpdir")}/graft_vec_auto_twin_" +
        s"${java.util.UUID.randomUUID()}"
      VecStoreLog.appendBatch(emb.filter(col("vec_id") < lit(hi)), tdir, 0L)
      VecStoreLog.compact(spark, tdir)
      val twin = meanCands(tdir)
      val tp = new org.apache.hadoop.fs.Path(tdir)
      tp.getFileSystem(hconf).delete(tp, true)
      val ratio = cands / twin
      maxRatio = math.max(maxRatio, ratio)
      println(f"| $e | $hi | ${if (folded) "FOLD" else "-"} | $cands%.0f | $twin%.0f | $ratio%.2f |")
    }
    println(f"max cands/query ratio vs all-folded under auto-cadence: $maxRatio%.2f")
    val ap = new org.apache.hadoop.fs.Path(adir)
    ap.getFileSystem(hconf).delete(ap, true)
    spark.stop()
  }
}
