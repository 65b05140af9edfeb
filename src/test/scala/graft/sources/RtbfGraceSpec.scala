package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.io.File

/** Grace-generation retention vs RTBF: the [[CubeLog]] grace dirs are a
  * byte-level copy of PRE-ERASE state, so every store erase must end by
  * purging them ([[CubeLog.purgeGraceRetained]]) — otherwise erased
  * documents' rows persist on disk until a compaction a quiesced store
  * never runs, and the torn-newest-marker fallback would SERVE them.
  * This spec drives the failure shape on all three CubeLog erase
  * surfaces (posting index, dedup state, vector index): build a store
  * with real grace state (two compactions), erase, then prove by a full
  * on-disk sweep that no parquet file anywhere under the store still
  * carries an erased id — and that a torn newest marker AFTER the purge
  * fails loudly instead of resurrecting pre-erase answers. */
class RtbfGraceSpec extends SparkSpec {
  import spark.implicits._

  private def corpusDocs = graft.ops.Tables.documentsParallel(spark, sf0001)
    .select($"doc_id", $"text")
  private def corpusVecs = graft.ops.Tables.embeddingsParallel(spark, sf0001)
    .select($"vec_id", $"label", $"embedding")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/store"

  /** All parquet data files under `dir`, recursively. */
  private def parquetFilesUnder(dir: String): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
    walk(new File(dir))
  }

  /** Count rows carrying one of `ids` in `idCol`, across EVERY parquet
    * file under `dir` — including grace dirs readers never resolve. Files
    * are read one by one (sibling dirs hold different schemas); files
    * without the id column (centroid sidecars, label tables keyed
    * differently) are checked on the given column only if present. */
  private def idRowsOnDisk(dir: String, idCol: String, ids: Set[Long]): Long =
    parquetFilesUnder(dir).map { f =>
      val df = spark.read.parquet(f.getPath)
      if (!df.columns.contains(idCol)) 0L
      else df.filter(col(idCol).isin(ids.toSeq: _*)).count()
    }.sum

  private def graceDirsOf(dir: String): (Set[Long], Set[Long]) = {
    val kids = Option(new File(dir).listFiles()).getOrElse(Array.empty).toSeq
    val folds = kids.filter(_.getName.startsWith("folded_gen="))
      .map(_.getName.stripPrefix("folded_gen=").toLong).toSet
    val batches = kids.filter(_.getName.startsWith("batch_id="))
      .map(_.getName.stripPrefix("batch_id=").toLong).toSet
    (folds, batches)
  }

  /** Build grace state the way production reaches it: two compaction
    * cycles with landings between (after the second commit, the first
    * fold + the cycle's batch dirs are grace-retained), plus one live
    * epoch. `land` lands slice `e` of 4 under epoch id e. */
  private def buildWithGrace(dir: String, land: (Long, Long) => Unit,
      compact: () => Unit): Unit = {
    land(0L, 0L); land(1L, 1L)
    compact() // gen 1: watermark 1, batch 0-1 grace-retained
    land(2L, 2L)
    compact() // gen 2: fold 1 + batch 2 grace-retained, batch 0-1 swept
    land(3L, 3L) // live epoch
  }

  private val erasedIds = ErasureStore.eraseIdsUpTo(400L).toSet

  test("posting erase purges grace dirs; no erased posting anywhere on disk; torn marker after erase fails loudly") {
    val dir = tmp("rtbf_grace_post_")
    buildWithGrace(dir,
      (e, id) => { PostingLog.appendBatch(
        corpusDocs.filter(pmod($"doc_id", lit(4L)) === e), dir, id); () },
      () => { PostingLog.compact(spark, dir); () })
    val (folds0, batches0) = graceDirsOf(dir)
    assert(folds0 === Set(1L, 2L) && batches0 === Set(2L, 3L),
      "precondition: real grace state (previous fold + folded batch dir) on disk")
    assert(idRowsOnDisk(dir, "doc_id", erasedIds) > 0L,
      "precondition: the request must have postings to erase")

    PostingLog.eraseDocs(spark, dir, erasedIds.toSeq)

    val (folds, batches) = graceDirsOf(dir)
    assert(folds === Set(2L), s"grace folds must be purged, saw $folds")
    assert(batches === Set(3L), s"grace batch dirs must be purged, saw $batches")
    assert(idRowsOnDisk(dir, "doc_id", erasedIds) === 0L,
      "an erased doc's postings survive on disk (grace retention leak)")
    // the store still answers, and the fsck is clean
    assert(PostingLog.booleanAnd(spark, dir, Seq("data", "join", "scan"))
      .count() > 0L)
    val findings = StoreCheck.checkPostingLog(spark, dir)
    assert(!findings.exists(_.severity == "error"), findings.mkString("; "))

    // torn newest marker AFTER the purge: the fallback generation is gone
    // BY DESIGN (it held pre-erase state) — the view must fail loudly,
    // never serve resurrected pre-erase answers
    val marker = new File(s"$dir/_cube_commits/2")
    java.nio.file.Files.write(marker.toPath, "not-a-number".getBytes)
    val ex = intercept[IllegalArgumentException] { CubeLog.view(spark, dir) }
    assert(ex.getMessage.contains("restore the marker"))
  }

  test("dedup erase purges grace dirs; no erased signature or label anywhere on disk") {
    val dir = tmp("rtbf_grace_dedup_")
    buildWithGrace(dir,
      (e, id) => { graft.llm.DedupLog.appendEpoch(
        corpusDocs.filter(pmod($"doc_id", lit(4L)) === e), dir, id); () },
      () => { graft.llm.DedupLog.compact(spark, dir); () })
    assert(idRowsOnDisk(dir, "doc_id", erasedIds) > 0L,
      "precondition: erased docs must hold stored signatures")

    graft.llm.DedupLog.eraseDocs(spark, dir, erasedIds.toSeq)

    val (folds, batches) = graceDirsOf(dir)
    assert(folds.size <= 1, s"grace folds must be purged, saw $folds")
    assert(idRowsOnDisk(dir, "doc_id", erasedIds) === 0L,
      "an erased doc's signature survives on disk (grace retention leak)")
    assert(idRowsOnDisk(dir, "node", erasedIds) === 0L,
      "an erased doc's label row survives on disk (grace retention leak)")
    val findings = StoreCheck.checkDedupLog(spark, dir)
    assert(!findings.exists(_.severity == "error"), findings.mkString("; "))
  }

  test("vector erase purges grace dirs; no erased vector anywhere on disk") {
    val dir = tmp("rtbf_grace_vec_")
    buildWithGrace(dir,
      (e, id) => { VecStoreLog.appendBatch(
        corpusVecs.filter(pmod($"vec_id", lit(4L)) === e), dir, id); () },
      () => { VecStoreLog.compact(spark, dir, cellK = Some(VecStore.CellK)); () })
    assert(idRowsOnDisk(dir, "vec_id", erasedIds) > 0L,
      "precondition: erased ids must hold stored vectors")

    VecStoreLog.eraseByIds(spark, dir, erasedIds.toSeq)

    val (folds, batches) = graceDirsOf(dir)
    assert(folds === Set(2L), s"grace folds must be purged, saw $folds")
    assert(batches === Set(3L), s"grace batch dirs must be purged, saw $batches")
    assert(idRowsOnDisk(dir, "vec_id", erasedIds) === 0L,
      "an erased vector survives on disk (grace retention leak)")
    val findings = StoreCheck.checkVecStoreLog(spark, dir)
    assert(!findings.exists(_.severity == "error"), findings.mkString("; "))
  }

  test("ivfpq erase purges grace dirs; no erased code or quantized vector anywhere on disk") {
    val dir = tmp("rtbf_grace_ivfpq_")
    buildWithGrace(dir,
      (e, id) => { IvfPqLog.appendBatch(
        corpusVecs.filter(pmod($"vec_id", lit(4L)) === e), dir, id); () },
      () => { IvfPqLog.compact(spark, dir); () })
    assert(idRowsOnDisk(dir, "vec_id", erasedIds) > 0L,
      "precondition: erased ids must hold stored codes/vectors")

    IvfPqLog.eraseByIds(spark, dir, erasedIds.toSeq)

    val (folds, _) = graceDirsOf(dir)
    assert(folds === Set(2L), s"grace folds must be purged, saw $folds")
    assert(idRowsOnDisk(dir, "vec_id", erasedIds) === 0L,
      "an erased id's code/vector survives on disk (grace retention leak)")
    val findings = StoreCheck.checkIvfPqLog(spark, dir)
    assert(!findings.exists(_.severity == "error"), findings.mkString("; "))
  }
}
