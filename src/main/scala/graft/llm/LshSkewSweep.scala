package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-skew measurement for the MinHash-LSH candidate join: what
  * does a duplicate FLOOD (many copies of one document — mirror pages,
  * boilerplate headers, scraped templates) cost the band-bucket self-join?
  *
  * All N copies share every band key, so the naive join emits
  * ~bands · N²/2 candidate rows before verification can touch them — the
  * one quadratic an equi-join-only dedup pipeline can still hide. The
  * shipped [[Dedup.minhashPairs]] collapses signature-identical documents
  * to one representative BEFORE banding (exact: identical signatures ⇒
  * est_jaccard = 1.0), so the flood contributes N−1 star pairs instead.
  * This runner measures both paths on planted corpora — the naive twin is
  * reconstructed here verbatim as the measurement baseline.
  *
  * Run: `sbt "runMain graft.llm.LshSkewSweep"` (sf dir via
  * SPARK_GRAFT_SF_DIR, default sf0.1). Prints the SCALING.md table.
  */
object LshSkewSweep {

  /** The PRE-GUARD candidate join (bands over every doc), kept only as
    * the baseline this sweep measures the guard against. */
  private def naiveCandidates(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until Dedup.bandsCount).map { b =>
      val key = (1 until TextHash.BandRows)
        .foldLeft(col(s"s${b * TextHash.BandRows}")) {
          (acc, r) => acc * 31 + col(s"s${b * TextHash.BandRows + r}")
        }
      struct(lit(b).as("band"), key.as("key"))
    }
    val bands = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-lsh-skew-sweep")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.ops.Tables.documentsParallel(spark, d)
      .select(col("doc_id"), col("text")).localCheckpoint(eager = true)
    val n = docs.count()
    val text0 = docs.filter(col("doc_id") === 0L).select("text").head().getString(0)
    println(s"corpus n=$n docs; flood = doc_ids 1..P rewritten to doc 0's text")
    println("| planted copies | naive band-join rows | naive wall s | guarded band-join rows | true pairs out | guarded wall s | join-volume ratio |")
    println("|---|---|---|---|---|---|---|")
    Seq(0L, n / 100, n / 20, n / 10).foreach { p =>
      val corpus = docs.withColumn("text",
        when(col("doc_id") > 0L && col("doc_id") <= p, lit(text0))
          .otherwise(col("text")))
        .localCheckpoint(eager = true)
      val sigs = Dedup.sigsOf(corpus)
      val t0 = System.nanoTime()
      val naive = naiveCandidates(sigs).count()
      val tNaive = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val out = Dedup.minhashPairs(corpus).count()
      val tGuard = (System.nanoTime() - t1) / 1e9
      // the guarded band join's own volume: one doc per identical group
      val grouped = sigs.groupBy((0 until TextHash.NumHashes)
        .map(j => col(s"s$j")): _*).agg(min(col("doc_id")).as("rep"))
      val reps = grouped.select(col("rep").as("doc_id") +:
        (0 until TextHash.NumHashes).map(j => grouped(s"s$j")): _*)
      val guardedCands = naiveCandidates(reps).count()
      println(f"| $p | $naive | $tNaive%.1f | $guardedCands | $out " +
        f"| $tGuard%.1f | ${naive.toDouble / math.max(1L, guardedCands)}%.1f |")
    }
    spark.stop()
  }
}
