package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.io.File

/** RTBF on the maintained ANN index ([[VecStoreLog.eraseByIds]]): the
  * targeted rewrite removes exactly the requested vectors from BOTH
  * surfaces (folded `cell=` partitions and live delta epochs), leaves
  * every untouched cell directory byte-identical, deletes fully-emptied
  * cells, and replays as a no-op — the [[ErasureSpec]] contract carried
  * to the vector store, where the bucket of an id is an assignment that
  * must be FOUND (column-pruned), not arithmetic. */
class VecErasureSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.ops.Tables.embeddingsParallel(spark, sf0001)
    .select($"vec_id", $"label", $"embedding")

  private def queries = graft.ops.Tables.embeddings(spark, sf0001)
    .filter($"vec_id" % 50 === 0).select($"vec_id", $"embedding")

  /** (fileName → (length, modTime, md5)) for every parquet under a dir
    * (empty when the dir is gone — a fully-emptied cell is deleted). */
  private def snapshot(dir: String): Map[String, (Long, Long, String)] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          .map("%02x".format(_)).mkString
        f.getName -> ((f.length(), f.lastModified(), md5))
      }.toMap

  private def buildStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("vec_erase_").toString + "/idx"
    (0L to 1L).foreach { ep =>
      VecStoreLog.appendBatch(emb.filter(pmod($"vec_id", lit(3L)) === ep), dir, ep)
    }
    VecStoreLog.compact(spark, dir, Some(VecStore.CellK))
    VecStoreLog.appendBatch(emb.filter(pmod($"vec_id", lit(3L)) === 2L), dir, 2L)
    dir
  }

  test("erase removes exactly the requested ids from fold AND delta; untouched cells byte-identical; replay no-ops") {
    val dir = buildStore()
    val fold = CubeLog.view(spark, dir).foldedDir.get.stripPrefix("file:")
    val ids = (0L to 500L by 37L) // 0,37,…,481 — lands in both surfaces
    // the affected cells, found the same way the erase must find them
    val affected = spark.read.parquet(fold).select($"vec_id", $"cell")
      .filter($"vec_id" % 37 === 0)
      .select($"cell".cast("long")).distinct().as[Long].collect().toSet
    assert(affected.nonEmpty && affected.size < VecStore.CellK,
      "the request must touch some but not all cells for this test to bite")
    val before = new File(fold).listFiles().filter(_.isDirectory)
      .filter(d => d.getName.startsWith("cell="))
      .map(d => d.getName -> snapshot(d.getPath)).toMap

    val removed = VecStoreLog.eraseByIds(spark, dir, ids)
    assert(removed === ids.count(_ <= 499L),
      "every landed requested id must be removed; ids past the corpus max are a no-op")

    // surviving set is exactly the declarative complement, on both legs
    val left = VecStoreLog.vectors(spark, dir).select($"vec_id").as[Long].collect()
    assert(left.length === 500 - removed.toInt)
    assert(!left.exists(_ % 37 == 0))
    // the live epoch was rewritten in place (same dir name, watermark intact)
    val v = CubeLog.view(spark, dir)
    assert(v.liveBatches.map(_._1) === Seq(2L))
    assert(spark.read.parquet(v.liveBatches.head._2)
      .filter($"vec_id" % 37 === 0).count() === 0)

    // untouched cell dirs: identical file lists, lengths, mtimes, content
    before.foreach { case (cellName, snap) =>
      val cellId = cellName.stripPrefix("cell=").toLong
      if (!affected.contains(cellId)) {
        assert(snapshot(s"$fold/$cellName") === snap,
          s"$cellName holds no requested id and must not be rewritten")
      } else if (new File(s"$fold/$cellName").exists()) {
        assert(spark.read.parquet(s"$fold/$cellName")
          .filter($"vec_id" % 37 === 0).count() === 0)
      } // an affected cell fully emptied by the request is deleted — fine
    }

    // probes answer from survivors only
    val probed = VecStoreLog.probeTopK(spark, dir, queries, VecStore.ProbeCells)
      .select($"vec_id").as[Long].collect()
    assert(!probed.exists(_ % 37 == 0))

    // idempotent: the replayed request finds nothing and rewrites nothing
    val snapAfter = before.keys.map(c => c -> snapshot(s"$fold/$c")).toMap
    assert(VecStoreLog.eraseByIds(spark, dir, ids) === 0L)
    assert(before.keys.forall(c => snapshot(s"$fold/$c") === snapAfter(c)),
      "a zero-hit replay must not rewrite any cell")

    // the full fsck is clean after the erase (orphan cells, norm drift,
    // duplicate vectors would all be error findings)
    val findings = StoreCheck.checkVecStoreLog(spark, dir)
    assert(!findings.exists(_.severity == "error"), findings.mkString("; "))
  }

  test("a cell fully emptied by the request has its directory deleted; the store still answers") {
    val dir = buildStore()
    val fold = CubeLog.view(spark, dir).foldedDir.get.stripPrefix("file:")
    // empty one whole cell: request every id it holds
    val byCell = spark.read.parquet(fold).select($"cell".cast("long"), $"vec_id")
      .as[(Long, Long)].collect().groupBy(_._1)
    val (victim, members) = byCell.minBy(_._2.length)
    val removed = VecStoreLog.eraseByIds(spark, dir, members.map(_._2).toSeq)
    assert(removed === members.length.toLong)
    assert(!new File(s"$fold/cell=$victim").exists(),
      "an emptied cell must not keep its old files")
    // probing still works — including probes whose budget includes the gone cell
    val out = VecStoreLog.probeTopK(spark, dir, queries, VecStore.ProbeCells)
    assert(out.groupBy($"query_id").count().filter($"count" =!= 5).count() === 0)
  }

  test("registered erase query: survivors only, both legs, oracle-shaped output") {
    val out = graft.SparkEntry.queries("vecstore_erase_probe")(spark, sf0001)
      .cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"vec_id" % 37 === 0).count() === 0,
        "no erased vector may appear in any probe answer")
    } finally out.unpersist()
  }
}
