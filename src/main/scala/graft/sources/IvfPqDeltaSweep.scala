package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe-cost sweep for the MAINTAINED IVF-PQ index ([[IvfPqLog]]) — the
  * [[VecDeltaSweep]] method on the compressed store, with one extra
  * measurement the compressed store uniquely needs: the per-candidate
  * cost RATIO between the exact delta leg (64-dim codegen'd fixed-point
  * dot per live vector per query) and the ADC leg (8 table lookups per
  * probed code), because [[IvfPqLog.shouldCompact]]'s derived trigger
  * weighs the delta by exactly that ratio. Part 1 measures probe wall at
  * pinned delta fractions and back-solves the implied ratio from the
  * cost model (s + ρf)/(s(1 + f)); part 2 drives the AUTO-cadence
  * landing path and compares every step's probe against a fresh
  * all-folded twin — the measured guarantee the trigger buys.
  *
  * Run: `sbt "runMain graft.sources.IvfPqDeltaSweep"` (sf dir via
  * SPARK_GRAFT_SF_DIR, default sf0.1). Prints the SCALING.md table.
  */
object IvfPqDeltaSweep {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ivfpq-delta-sweep")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val hconf = spark.sparkContext.hadoopConfiguration
    val emb = graft.ops.Tables.embeddingsParallel(spark, d)
      .select(col("vec_id"), col("label"), col("embedding"))
      .localCheckpoint(eager = true)
    val n = emb.count()
    val queries = VecStore.qn(
      graft.ops.Tables.embeddings(spark, d).filter(col("vec_id") % 50 === 0)
        .select(col("vec_id"), col("label"), col("embedding")))
      .select(col("vec_id"), col("qv"), col("norm2"))
      .localCheckpoint(eager = true)
    val s = IvfPqLog.ProbeCells.toDouble / IvfPqLog.CoarseK
    println(s"corpus n=$n, coarse k=${IvfPqLog.CoarseK}, probed share s=$s, " +
      s"queries=${queries.count()}")

    println("| delta fraction f | delta rows | probe p50 ms (3 reps) | wall ratio vs all-folded | model ratio at rho=1 | implied rho |")
    println("|---|---|---|---|---|---|")
    var baseWall = 0.0
    Seq(0.0, 0.05, 0.22, 0.45).foreach { f =>
      val dir = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_delta_" +
        s"${java.util.UUID.randomUUID()}"
      val cut = (n * (1 - f)).toLong
      IvfPqLog.appendBatch(emb.filter(col("vec_id") < lit(cut)), dir, 0L)
      // ρ is calibrated at the PINNED geometry (the model column above
      // uses s = 3/8); the auto-cadence sweep below runs the shipped
      // scale-derived geometry
      IvfPqLog.compact(spark, dir, Some(IvfPqLog.CoarseK))
      val deltaRows =
        if (f > 0) {
          IvfPqLog.appendBatch(emb.filter(col("vec_id") >= lit(cut)), dir, 1L)
          n - cut
        } else 0L
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        IvfPqLog.probeTopK(spark, dir, Some(queries)).count()
        (System.nanoTime() - t0) / 1000000L
      }.sorted
      if (f == 0.0) baseWall = times(1).toDouble
      val ratio = times(1) / baseWall
      val model = (s + f) / (s * (1 + f))
      // implied per-candidate cost ratio from the measured wall:
      // ratio = (s + rho*f)/(s*(1+f))  =>  rho = s*(ratio*(1+f) - 1)/f
      val implied =
        if (f == 0.0) Double.NaN else s * (ratio * (1 + f) - 1) / f
      println(f"| $f%.2f | $deltaRows | ${times(1)} | $ratio%.2f | $model%.2f " +
        (if (f == 0.0) "| - |" else f"| $implied%.2f |"))
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(hconf).delete(p, true)
    }

    // Part 2 — growth under the AUTO-CADENCE landing path: the corpus
    // arrives as 12 equal epochs through appendBatchAuto; every step's
    // probe wall is compared against a fresh ALL-FOLDED twin of the
    // identical corpus-so-far. The ratio column is the probe-cost
    // guarantee the derived trigger buys on the compressed store.
    println()
    println("auto-cadence sweep (12 equal epochs via appendBatchAuto):")
    println("| epoch | corpus rows | folded this step | probe ms | all-folded twin ms | wall ratio |")
    println("|---|---|---|---|---|---|")
    val adir = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_auto_" +
      s"${java.util.UUID.randomUUID()}"
    val epochs = 12
    var maxRatio = 0.0
    (0 until epochs).foreach { e =>
      val lo = n * e / epochs
      val hi = n * (e + 1) / epochs
      val slice = emb.filter(col("vec_id") >= lit(lo) && col("vec_id") < lit(hi))
      val folded = IvfPqLog.appendBatchAuto(slice, adir, e.toLong)
      def wall(dir: String): Long = {
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          IvfPqLog.probeTopK(spark, dir, Some(queries)).count()
          (System.nanoTime() - t0) / 1000000L
        }.sorted
        ts(1)
      }
      val w = wall(adir)
      val tdir = s"${sys.props("java.io.tmpdir")}/graft_ivfpq_auto_twin_" +
        s"${java.util.UUID.randomUUID()}"
      IvfPqLog.appendBatch(emb.filter(col("vec_id") < lit(hi)), tdir, 0L)
      IvfPqLog.compact(spark, tdir)
      val tw = wall(tdir)
      val tp = new org.apache.hadoop.fs.Path(tdir)
      tp.getFileSystem(hconf).delete(tp, true)
      val ratio = w.toDouble / tw
      maxRatio = math.max(maxRatio, ratio)
      println(f"| $e | $hi | ${if (folded) "FOLD" else "-"} | $w | $tw | $ratio%.2f |")
    }
    println(f"max probe wall ratio vs all-folded under auto-cadence: $maxRatio%.2f")
    val ap = new org.apache.hadoop.fs.Path(adir)
    ap.getFileSystem(hconf).delete(ap, true)
    spark.stop()
  }
}
