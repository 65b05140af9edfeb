package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Landing-cost decomposition for the indexed corpus ingest
  * ([[DocStream.startIndexedIngest]]): what does keeping the corpus
  * SEARCHABLE and DEDUP-LABELED at landing time cost on top of the
  * bronze write itself? Each epoch is driven through the same three
  * calls the foreachBatch body makes — bronze
  * ([[graft.sources.DocStore.appendDedupedLanded]]), posting index
  * ([[graft.sources.PostingLog.appendBatch]]), dedup state
  * ([[graft.llm.DedupLog.appendEpoch]]) — and each surface's wall is
  * measured separately, so the table attributes the cost instead of
  * reporting one opaque total. Landings run through the AUTO-cadence
  * variants (the shipped foreachBatch shape), so each store's own fold
  * fires mid-sweep and its cost lands in that epoch's column — deferred
  * maintenance is not hidden.
  *
  * Run: `sbt "runMain graft.streaming.DocIngestSweep"` (sf dir via
  * SPARK_GRAFT_SF_DIR, default sf0.1). Prints the SCALING.md table.
  */
object DocIngestSweep {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-doc-ingest-sweep")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.ops.Tables.documentsParallel(spark, d)
      .select(col("doc_id"), col("text"))
      .localCheckpoint(eager = true)
    val n = docs.count()
    val maxId = docs.agg(max(col("doc_id")).cast("long")).head().getLong(0)
    val epochs = 10
    val root = s"${sys.props("java.io.tmpdir")}/graft_doc_ingest_" +
      s"${java.util.UUID.randomUUID()}"
    println(s"corpus n=$n docs in $epochs epochs; per-surface landing wall (ms)")
    println("| epoch | docs landed | bronze ms | posting ms | dedup ms | total ms |")
    println("|---|---|---|---|---|---|")
    var (tB, tP, tD, landedTot) = (0L, 0L, 0L, 0L)
    (0 until epochs).foreach { e =>
      val lo = (maxId + 1) * e / epochs
      val hi = (maxId + 1) * (e + 1) / epochs
      val slice = docs.filter(col("doc_id") >= lit(lo) && col("doc_id") < lit(hi))
      val t0 = System.nanoTime()
      val landed = graft.sources.DocStore
        .appendDedupedLanded(spark, slice, s"$root/store", e.toLong)
      val t1 = System.nanoTime()
      landed.foreach { fresh =>
        graft.sources.PostingLog.appendBatchAuto(fresh, s"$root/postings", e.toLong)
      }
      val t2 = System.nanoTime()
      landed.foreach { fresh =>
        graft.llm.DedupLog.appendEpochAuto(fresh, s"$root/dedup", e.toLong)
      }
      val t3 = System.nanoTime()
      val nl = landed.map(_.count()).getOrElse(0L)
      landedTot += nl
      val (b, p, dd) =
        ((t1 - t0) / 1000000L, (t2 - t1) / 1000000L, (t3 - t2) / 1000000L)
      tB += b; tP += p; tD += dd
      println(s"| $e | $nl | $b | $p | $dd | ${b + p + dd} |")
    }
    val tot = tB + tP + tD
    println(f"cumulative: bronze $tB ms (${100.0 * tB / tot}%.0f%%), " +
      f"posting $tP ms (${100.0 * tP / tot}%.0f%%), " +
      f"dedup $tD ms (${100.0 * tD / tot}%.0f%%); " +
      f"$landedTot docs at ${landedTot * 1000.0 / tot}%.0f docs/s all-surfaces")
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    spark.stop()
  }
}
