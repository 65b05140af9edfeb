package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev helper (not part of the driver contract): stage attribution for
  * `dedup_lsh_recall_eval`'s scale growth — the r9 watch item. The query
  * composes three stages; this times each in isolation on a given SF dir
  * so SCALING.md can state which one carries the 12.8×/decade growth and
  * what its bound is:
  *
  *  - `lsh`: the banded multi-probe LSH pair generation under evaluation
  *    ([[Similarity.lshPairs]] — bucket joins + inline exact verify);
  *  - `truth`: the EXACT all-pairs ground truth (broadcast BNLJ over
  *    n²/2 fixed-point cosines — verification-scale by design, Θ(n²) by
  *    definition: recall cannot be scored against anything smaller);
  *  - `score`: the confusion join of the two pair sets (|pairs|-sized).
  *
  * `runMain graft.llm.LshEvalStages [sfDir] [reps]` → one JSON line of
  * min-of-reps seconds per stage plus pair counts.
  */
object LshEvalStages {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-lsh-eval-stages")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(f: () => Long): (Double, Long) = {
      var best = Double.MaxValue
      var rows = 0L
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        rows = f()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        spark.catalog.clearCache()
      }
      (best, rows)
    }

    val qe = Similarity.quantized(spark, src).localCheckpoint(eager = true)
    val n = qe.count()

    val (lshSec, nLsh) = timed(() => Similarity.lshPairs(spark, src).count())

    def truth() = qe.as("a")
      .join(broadcast(qe.as("b")), col("a.vec_id") < col("b.vec_id"))
      .filter((Similarity.dot("a.qv", "b.qv").cast("double")
        / (sqrt(col("a.norm2").cast("double")) * sqrt(col("b.norm2").cast("double"))))
        >= 0.4)
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
    val (truthSec, nTruth) = timed(() => truth().count())

    // score stage timed over PRE-MATERIALIZED pair sets, so it carries
    // only the confusion join, not a re-run of the producers
    val lshMat = Similarity.lshPairs(spark, src)
      .select(col("v1"), col("v2")).localCheckpoint(eager = true)
    val truthMat = truth().localCheckpoint(eager = true)
    val (scoreSec, nCommon) = timed(() => lshMat.join(truthMat, Seq("v1", "v2")).count())

    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    println(s"""{"src":"$src","n_vecs":$n,"lsh_sec":${f(lshSec)},""" +
      s""""truth_sec":${f(truthSec)},"score_sec":${f(scoreSec)},""" +
      s""""n_lsh":$nLsh,"n_truth":$nTruth,"n_common":$nCommon}""")
    spark.stop()
  }
}
