package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Consistency audit (fsck) for the maintained stores — the check an
  * on-call runs BEFORE trusting a store after an incident, and the
  * monitoring job runs on a schedule. Two layers:
  *
  *  - **structural** ([[checkCubeLog]]): the [[CubeLog]] transaction-log
  *    invariants, reported instead of thrown — torn/unreadable markers
  *    (with whether the grace generation still covers recovery), a
  *    committed generation whose fold is missing, orphan folds from
  *    crashed compactions, leftover `.tmp` markers, grace-retained batch
  *    dirs (informational: readers ignore them by watermark);
  *  - **semantic** ([[checkPostingLog]], [[checkDedupLog]]): cross-row
  *    invariants a targeted-rewrite bug would break silently — the
  *    posting store's additive stats rows vs a recount from the postings
  *    themselves, (term, doc) uniqueness, the dedup store's
  *    label↔signature referential integrity (an erased doc that still
  *    anchors a label is an RTBF failure), per-doc signature uniqueness.
  *
  * Severity contract: `error` = the store answers wrongly or not at all
  * (repair before serving); `warn` = recoverable state needing action
  * (e.g. torn marker within the grace window); `info` = expected
  * byproducts of the log discipline (grace retention, orphan folds).
  * Checks read metadata + narrow column scans only — never payload
  * columns (embeddings, positions, text). */
object StoreCheck {

  final case class Finding(severity: String, check: String, detail: String)

  private def fsOf(spark: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Structural audit of any CubeLog-managed store directory. */
  def checkCubeLog(spark: SparkSession, dir: String): Seq[Finding] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Finding]
    val (hfs, p) = fsOf(spark, dir)
    if (!hfs.exists(p)) return Seq(Finding("error", "exists", s"store dir missing: $dir"))
    val kids = hfs.listStatus(p).toSeq
    val commitsDir = new org.apache.hadoop.fs.Path(p, "_cube_commits")
    val markers =
      if (hfs.exists(commitsDir)) hfs.listStatus(commitsDir).toSeq else Seq.empty
    markers.filter(_.getPath.getName.endsWith(".tmp")).foreach { st =>
      out += Finding("warn", "tmp-marker",
        s"leftover uncommitted marker ${st.getPath.getName} (crashed commit; " +
          "swept by the next successful compaction)")
    }
    val parsed = markers
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption.map(_ -> st.getPath))
      .sortBy(-_._1)
      .map { case (g, path) =>
        val wm = scala.util.Try {
          val in = hfs.open(path)
          try scala.io.Source.fromInputStream(in).mkString.trim.toLong
          finally in.close()
        }.toOption
        (g, wm)
      }
    val foldGens = kids.filter(st => st.isDirectory &&
      st.getPath.getName.startsWith("folded_gen="))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("folded_gen=").toLong).toOption)
      .toSet
    parsed.filter(_._2.isEmpty).foreach { case (g, _) =>
      val fallback = parsed.find { case (g2, wm) => g2 < g && wm.nonEmpty }
      // generation-1-only torn: gen 1's cleanup deleted nothing (snapshot
      // watermark −1), so the gen-0 view of live batch dirs is complete —
      // CubeLog.view serves it (see its all-unparsable carve-out)
      val gen1Only = g == 1L && parsed.map(_._1) == Seq(1L)
      val recoverable = gen1Only || fallback.exists { case (g2, _) =>
        g2 == 0L || foldGens.contains(g2) }
      if (recoverable)
        out += Finding("warn", "torn-marker",
          s"marker for generation $g unreadable; generation " +
            s"${fallback.map(_._1).getOrElse(0L)} still covers recovery " +
            "(grace window) — restore the marker (content = the fold's max batch id)")
      else
        out += Finding("error", "torn-marker",
          s"marker for generation $g unreadable and no readable generation " +
            "survives — the store cannot prove its watermark; restore the marker")
    }
    val resolved = parsed.collectFirst { case (g, Some(wm)) => (g, wm) }
    resolved.foreach { case (g, wm) =>
      if (g > 0L && !foldGens.contains(g))
        out += Finding("error", "missing-fold",
          s"committed generation $g resolved from the marker log but " +
            s"folded_gen=$g is missing — refusing state; restore the fold or " +
            "the newer marker")
      val live = kids.filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("batch_id="))
        .flatMap(st => scala.util.Try(
          st.getPath.getName.stripPrefix("batch_id=").toLong).toOption)
      val retained = live.count(_ <= wm)
      if (retained > 0)
        out += Finding("info", "grace-retained",
          s"$retained folded batch dir(s) at or under watermark $wm retained " +
            "for the grace window (readers ignore them; next compaction sweeps)")
      foldGens.filter(fg => fg != g && !parsed.exists(_._1 == fg)).foreach { fg =>
        out += Finding("info", "orphan-fold",
          s"folded_gen=$fg has no commit marker (crashed compaction before " +
            "commit; invisible to readers, overwritten by the next run)")
      }
    }
    if (resolved.isEmpty && foldGens.nonEmpty && parsed.isEmpty)
      out += Finding("info", "orphan-fold",
        s"fold dir(s) ${foldGens.toSeq.sorted.mkString(",")} with an empty " +
          "marker log — crashed first compaction; readers serve live batches")
    out.toSeq
  }

  /** Semantic audit of a [[PostingLog]] store: the additive stats rows
    * must equal a recount from the postings, and (term, doc) must be
    * unique store-wide. Reads (doc_id, dl, tb) / (term, doc_id, tb) —
    * never positions. */
  def checkPostingLog(spark: SparkSession, dir: String): Seq[Finding] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Finding]
    out ++= checkCubeLog(spark, dir)
    if (out.exists(_.severity == "error")) return out.toSeq
    val v = CubeLog.view(spark, dir)
    val roots = v.foldedDir.toSeq ++ v.liveBatches.map(_._2)
    if (roots.isEmpty) return out.toSeq
    def all(cols: Seq[String]): DataFrame =
      roots.map(r => spark.read.parquet(r).select(cols.map(col): _*))
        .reduce(_ unionByName _)
    val stats = all(Seq("tf", "dl", "tb")).filter(col("tb") === PostingLog.StatsBucket)
      .agg(coalesce(sum(col("tf")), lit(0L)).as("n"),
        coalesce(sum(col("dl")), lit(0L)).as("t"))
      .head()
    val recount = all(Seq("doc_id", "dl", "tb")).filter(col("tb") =!= PostingLog.StatsBucket)
      .groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("t"))
      .head()
    if (stats.getLong(0) != recount.getLong(0) || stats.getLong(1) != recount.getLong(1))
      out += Finding("error", "stats-drift",
        s"stats rows say (n_docs=${stats.getLong(0)}, total_dl=${stats.getLong(1)}) " +
          s"but the postings recount to (${recount.getLong(0)}, ${recount.getLong(1)}) — " +
          "a landing or erase updated one side only; rebuild the stats row at the next fold")
    val dupes = all(Seq("term", "doc_id", "tb")).filter(col("tb") =!= PostingLog.StatsBucket)
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).count()
    if (dupes > 0)
      out += Finding("error", "duplicate-posting",
        s"$dupes (term, doc) pairs appear more than once — a doc landed in " +
          "two epochs (landing-contract violation); boolean/BM25 answers are inflated")
    out.toSeq
  }

  /** Semantic audit of a [[graft.llm.DedupLog]] store: every label row's
    * node AND keeper must have a stored signature (a dangling node means
    * an erase removed signatures without repairing labels — the RTBF
    * failure mode), and signatures are unique per doc. */
  def checkDedupLog(spark: SparkSession, dir: String): Seq[Finding] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Finding]
    out ++= checkCubeLog(spark, dir)
    if (out.exists(_.severity == "error")) return out.toSeq
    val sigs = graft.llm.DedupLog.sigsAll(spark, dir).select(col("doc_id"))
      .localCheckpoint(eager = true)
    val sigDupes = sigs.groupBy(col("doc_id")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).count()
    if (sigDupes > 0)
      out += Finding("error", "duplicate-signature",
        s"$sigDupes doc(s) carry more than one stored signature — a doc " +
          "landed in two epochs; pair estimates may duplicate")
    val labels = graft.llm.DedupLog.labelsView(spark, dir)
    val danglingNodes = labels.join(sigs, labels("node") === sigs("doc_id"), "left_anti").count()
    val danglingKeepers = labels.select(col("label").as("doc_id")).distinct()
      .join(sigs, Seq("doc_id"), "left_anti").count()
    if (danglingNodes > 0)
      out += Finding("error", "dangling-label-node",
        s"$danglingNodes label row(s) reference a doc with no stored signature — " +
          "an erase removed signatures without repairing labels (RTBF leak)")
    if (danglingKeepers > 0)
      out += Finding("error", "dangling-keeper",
        s"$danglingKeepers cluster keeper id(s) have no stored signature — " +
          "keeper re-election did not run after an erase")
    out.toSeq
  }
}
