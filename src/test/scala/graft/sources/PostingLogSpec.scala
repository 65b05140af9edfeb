package graft.sources

import graft.SparkSpec
import graft.llm.TextAnalysis
import org.apache.spark.sql.functions._
import java.io.File

/** The maintained inverted index ([[PostingLog]]): epoch landings +
  * watermark guard + fold ≡ the build-once index; the additive stats rows
  * are exact through landings, folds, and RTBF; erase rewrites ONLY the
  * affected term buckets (untouched `tb=` dirs byte-identical — the
  * [[VecErasureSpec]] contract on the retrieval surface) and replays as
  * a no-op. */
class PostingLogSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("data", "join", "scan")

  private def corpusDocs = graft.ops.Tables.documentsParallel(spark, sf0001)
    .select($"doc_id", $"text")

  private def buildStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("posting_log_").toString + "/idx"
    (0L to 1L).foreach { e =>
      PostingLog.appendBatch(corpusDocs.filter(pmod($"doc_id", lit(3L)) === e), dir, e)
    }
    PostingLog.compact(spark, dir)
    PostingLog.appendBatch(corpusDocs.filter(pmod($"doc_id", lit(3L)) === 2L), dir, 2L)
    dir
  }

  private def snapshot(dir: String): Map[String, (Long, Long, String)] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
          .map("%02x".format(_)).mkString
        f.getName -> ((f.length(), f.lastModified(), md5))
      }.toMap

  test("maintained probe ≡ build-once index; folded-epoch replay no-ops; stats exact on fold ∪ live") {
    val dir = buildStore()

    // boolean-AND answers through fold + live epoch ≡ the build-once store
    val maintained = PostingLog.booleanAnd(spark, dir, terms)
      .as[(Long, Long)].collect().toSet
    val once = PostingStore.probe(spark, PostingStore.build(spark, sf0001), terms)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_terms"))
      .filter($"n_terms" === terms.size)
      .as[(Long, Long)].collect().toSet
    assert(maintained === once)
    assert(maintained.nonEmpty, "the term set must match some docs for this test to bite")

    // replay of a folded epoch lands nothing and changes no answer
    assert(PostingLog.appendBatch(
      corpusDocs.filter(pmod($"doc_id", lit(3L)) === 0L), dir, 0L) === 0L)
    assert(PostingLog.booleanAnd(spark, dir, terms)
      .as[(Long, Long)].collect().toSet === maintained)

    // stats rows (one in the fold + one per live epoch) sum to the truth
    val (nDocs, totalDl) = PostingLog.stats(spark, dir)
      .as[(Long, Long)].head()
    val truth = corpusDocs
      .select(size(TextAnalysis.words($"text")).cast("long").as("dl"))
      .agg(count(lit(1)), sum($"dl")).as[(Long, Long)].head()
    assert((nDocs, totalDl) === truth)

    // fold everything: answers and stats unchanged, stats now ONE row
    PostingLog.compact(spark, dir)
    assert(CubeLog.view(spark, dir).liveBatches.isEmpty)
    assert(PostingLog.booleanAnd(spark, dir, terms)
      .as[(Long, Long)].collect().toSet === maintained)
    assert(PostingLog.stats(spark, dir).as[(Long, Long)].head() === truth)
    val fold = CubeLog.view(spark, dir).foldedDir.get
    assert(spark.read.parquet(fold).filter($"tb" === PostingLog.StatsBucket)
      .count() === 1L)
  }

  test("BM25 through the maintained index ≡ the corpus-scan scorer") {
    val dir = buildStore()
    val viaIndex = PostingLog.bm25TopK(spark, dir, terms)
      .as[(Long, Long)].collect().toSeq

    // the Search scorer's arithmetic recomputed from the raw corpus
    val docs = corpusDocs
    val lens = docs.select($"doc_id",
      size(TextAnalysis.words($"text")).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum($"dl").as("total_dl"))
    val tf = docs
      .select($"doc_id", explode(TextAnalysis.words($"text")).as("term"))
      .filter($"term".isin(terms: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val direct = tf.join(broadcast(dfreq), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("term_score", expr(
        "((n_docs * 1000000) div df) * tf * 2200 " +
          "div (tf * 1000 + (1200 * (250 + (750 * ((dl * 1000 * n_docs) div total_dl)) " +
          "div 1000)) div 1000)"))
      .groupBy($"doc_id").agg(sum($"term_score").as("score_scaled"))
      .orderBy($"score_scaled".desc, $"doc_id").limit(10)
      .as[(Long, Long)].collect().toSeq
    assert(viaIndex === direct)
  }

  test("erase rewrites only affected buckets; stats decrement exactly; replay no-ops; emptied bucket deleted") {
    // crafted corpus: single-term docs whose buckets we control
    val pool = ('a' to 'z').map(c => s"$c$c$c")
    val tbOf = (t: String) => PostingStore.h64(t) % PostingLog.NBuckets
    // three terms in three DISTINCT buckets (precondition for the test)
    val distinctTerms = pool.groupBy(tbOf).values.map(_.head).take(3).toSeq
    assert(distinctTerms.map(tbOf).distinct.size === 3)
    val Seq(tA, tB, tC) = distinctTerms

    val docs = Seq(
      (1L, s"$tA $tA"), // dl 2, bucket A
      (2L, tB), // dl 1, bucket B
      (3L, s"$tC $tC $tC"), // dl 3, bucket C
      (4L, s"$tA $tB") // dl 2, buckets A and B
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("posting_erase_").toString + "/idx"
    PostingLog.appendBatch(docs.filter($"doc_id" <= 3L), dir, 0L)
    PostingLog.compact(spark, dir)
    PostingLog.appendBatch(docs.filter($"doc_id" === 4L), dir, 1L) // live
    val fold = CubeLog.view(spark, dir).foldedDir.get.stripPrefix("file:")

    val before = new File(fold).listFiles().filter(_.isDirectory)
      .map(d => d.getName -> snapshot(d.getPath)).toMap

    // erase doc 1 (bucket A only, folded) and doc 4 (live epoch)
    val removed = PostingLog.eraseDocs(spark, dir, Seq(1L, 4L))
    assert(removed === 3L, "doc 1 has 1 posting, doc 4 has 2")

    // untouched buckets of the fold stay byte-identical; A was rewritten
    val bA = s"tb=${tbOf(tA)}"
    before.foreach { case (name, snap) =>
      if (name == bA || name == s"tb=${PostingLog.StatsBucket}")
        assert(snapshot(s"$fold/$name") !== snap, s"$name must be rewritten")
      else
        assert(snapshot(s"$fold/$name") === snap, s"$name must not be rewritten")
    }

    // stats decremented exactly: fold loses doc 1 (dl 2); live loses doc 4 (dl 2)
    assert(PostingLog.stats(spark, dir).as[(Long, Long)].head() === ((2L, 4L)))
    // the live epoch dir was rewritten in place, watermark intact
    val v = CubeLog.view(spark, dir)
    assert(v.liveBatches.map(_._1) === Seq(1L))

    // answers come from survivors only
    assert(PostingLog.probe(spark, dir, Seq(tA)).count() === 0L)
    assert(PostingLog.booleanAnd(spark, dir, Seq(tB)).as[(Long, Long)]
      .collect().toSet === Set((2L, 1L)))

    // replay: zero hits, zero rewrites
    val after = new File(fold).listFiles().filter(_.isDirectory)
      .map(d => d.getName -> snapshot(d.getPath)).toMap
    assert(PostingLog.eraseDocs(spark, dir, Seq(1L, 4L)) === 0L)
    after.foreach { case (name, snap) =>
      assert(snapshot(s"$fold/$name") === snap, s"replay must not rewrite $name")
    }

    // empty a whole bucket: doc 3 is bucket C's only posting source
    assert(PostingLog.eraseDocs(spark, dir, Seq(3L)) === 1L)
    assert(!new File(s"$fold/tb=${tbOf(tC)}").exists(),
      "an emptied bucket must not keep its old files")
    assert(PostingLog.stats(spark, dir).as[(Long, Long)].head() === ((1L, 1L)))
    assert(PostingLog.booleanAnd(spark, dir, Seq(tB)).as[(Long, Long)]
      .collect().toSet === Set((2L, 1L)))
  }

  test("positional probes: phrase and proximity through the index ≡ corpus-scan recompute") {
    val dir = buildStore()
    val post = corpusDocs
      .select($"doc_id",
        posexplode(TextAnalysis.words($"text")).as(Seq("pos0", "term")))
      .select($"doc_id", $"term", ($"pos0" + 1).as("pos"))

    val phrase = PostingLog.phraseCount(spark, dir, "the", "data")
      .as[(Long, Long)].collect().toSet
    val a = post.filter($"term" === "the").select($"doc_id", $"pos")
    val b = post.filter($"term" === "data")
      .select($"doc_id".as("b_doc"), $"pos".as("b_pos"))
    val phraseDirect = a
      .join(b, $"b_doc" === $"doc_id" && $"b_pos" === $"pos" + 1)
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toSet
    assert(phrase === phraseDirect)
    assert(phrase.nonEmpty, "the phrase must occur for this test to bite")

    val prox = PostingLog.proximity(spark, dir, "data", "scan", 4)
      .as[(Long, Long, Long)].collect().toSet
    val pa = post.filter($"term" === "data").select($"doc_id", $"pos")
    val pb = post.filter($"term" === "scan")
      .select($"doc_id".as("b_doc"), $"pos".as("b_pos"))
    val proxDirect = pa
      .join(pb, $"b_doc" === $"doc_id" && abs($"b_pos" - $"pos") <= 4)
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n"), min(abs($"b_pos" - $"pos")).cast("long").as("d"))
      .as[(Long, Long, Long)].collect().toSet
    assert(prox === proxDirect)
    assert(prox.nonEmpty)
  }

  test("compaction cadence: fold fires exactly at the live-epoch bound; auto landing applies it") {
    val dir = java.nio.file.Files.createTempDirectory("posting_cadence_").toString + "/idx"
    val docs = corpusDocs
    (0L to 2L).foreach { e =>
      PostingLog.appendBatch(docs.filter(pmod($"doc_id", lit(4L)) === e), dir, e)
    }
    assert(!PostingLog.shouldCompact(spark, dir, maxLive = 4), "3 live < bound 4")
    assert(PostingLog.appendBatchAuto(
      docs.filter(pmod($"doc_id", lit(4L)) === 3L), dir, 3L, maxLive = 4),
      "the 4th landing reaches the bound and must fold")
    assert(CubeLog.view(spark, dir).liveBatches.isEmpty)
    assert(CubeLog.view(spark, dir).gen === 1L)
    // the folded store still answers exactly
    val maintained = PostingLog.booleanAnd(spark, dir, terms)
      .as[(Long, Long)].collect().toSet
    val once = PostingStore.probe(spark, PostingStore.build(spark, sf0001), terms)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_terms"))
      .filter($"n_terms" === terms.size)
      .as[(Long, Long)].collect().toSet
    assert(maintained === once)
  }

  test("the bucket count is a store property: probes prune each root at its OWN recorded count (r14)") {
    val dir = buildStore()
    assert(PostingLog.storedNBuckets(spark, dir).contains(PostingLog.NBuckets),
      "the first landing must persist the _nb layout sidecar")
    val before = PostingLog.probe(spark, dir, terms)
      .select($"term", $"doc_id").as[(String, Long)].collect().toSet
    // pre-r14 the store-level count was a compile-time contract and a
    // mismatch failed loudly; now every root records the count its tb=
    // layout was written at, so even a corrupted/foreign STORE sidecar
    // cannot send a probe to the wrong bucket of a self-describing root
    val p = new org.apache.hadoop.fs.Path(s"$dir/_nb")
    val hfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = hfs.create(p, true)
    try out.write("8".getBytes("UTF-8")) finally out.close()
    assert(PostingLog.probe(spark, dir, terms)
      .select($"term", $"doc_id").as[(String, Long)].collect().toSet === before,
      "self-describing roots answer exactly under a wrong store sidecar")
    // …and a NEW landing now buckets at the (flipped) store count — the
    // store is mid-resize by definition, which probes handle per root; an
    // explicit conflicting count still fails loudly (RebucketSpec)
    PostingLog.appendBatch(corpusDocs.limit(50)
      .select(($"doc_id" + 900000L).as("doc_id"), $"text"), dir, 9L)
    assert(PostingLog.probe(spark, dir, terms)
      .select($"term", $"doc_id").as[(String, Long)].collect().toSet
      .filterNot(_._2 >= 900000L) === before,
      "a mixed-count store still answers the old roots exactly")
  }

  test("bucketsFor: NBuckets floor, power-of-two, ~150MB target; BytesPerToken calibrated on a real store") {
    // rule properties
    assert(PostingLog.bucketsFor(1L, 1L) === PostingLog.NBuckets, "parallelism floor")
    val big = PostingLog.bucketsFor(1000000000L, 500L) // 1B docs × 500 tokens × 16B = 8TB
    assert((big & (big - 1)) === 0L, "power of two")
    assert(big >= 8L * 1024L * 1024L * 1024L * 1024L / PostingLog.TargetBucketBytes / 2,
      "a 1B-doc corpus needs tens of thousands of buckets, not 16")
    // monotone in both inputs
    assert(PostingLog.bucketsFor(2000000L, 100L) <= PostingLog.bucketsFor(4000000L, 100L))
    assert(PostingLog.bucketsFor(2000000L, 100L) <= PostingLog.bucketsFor(2000000L, 200L))
    // the estimated bucket never exceeds the target at the chosen count
    val (n, dl) = (123456789L, 300L)
    val b = PostingLog.bucketsFor(n, dl)
    assert(n * dl * PostingLog.BytesPerToken / b <= PostingLog.TargetBucketBytes)

    // BytesPerToken calibration: a real store over the test corpus must
    // land within a generous band of the estimate (sizing, not accounting
    // — 2× off still yields fine task sizes; 10× off means the model is
    // wrong and buckets degenerate)
    val dir = buildStore()
    def du(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
      else if (f.getName.endsWith(".parquet")) f.length() else 0L
    // measure the READER view only (grace-retained dirs are transient copies)
    val bytes = CubeLog.view(spark, dir).dataPaths
      .map(p => du(new java.io.File(p.stripPrefix("file:")))).sum
    val (nDocs, totalDl) = PostingLog.stats(spark, dir).as[(Long, Long)].head()
    val measured = bytes.toDouble / totalDl
    assert(measured <= PostingLog.BytesPerToken * 4.0 &&
      measured >= PostingLog.BytesPerToken / 8.0,
      f"measured $measured%.1f B/token vs pinned ${PostingLog.BytesPerToken} — recalibrate")
  }

  test("stats count only docs with postings; empty epochs land nothing") {
    val dir = java.nio.file.Files.createTempDirectory("posting_stats_").toString + "/idx"

    // a null-text doc lands zero postings — it must not count in the
    // stats row either, or the erase decrement (recovered from postings)
    // and the fsck recount (over postings) drift from the landing forever
    val withNull = Seq((1L, "alpha beta alpha"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(PostingLog.appendBatch(withNull, dir, 0L) === 1L)
    val st = PostingLog.stats(spark, dir).head()
    assert(st.getLong(0) === 1L, s"n_docs must count posting-bearing docs only, saw ${st.getLong(0)}")
    assert(st.getLong(1) === 3L)
    val findings = StoreCheck.checkPostingLog(spark, dir)
    assert(!findings.exists(_.check == "stats-drift"), findings.mkString("; "))

    // an empty epoch (empty micro-batch, or all-null text) lands NOTHING:
    // no epoch dir, no zero stats row, no cadence fan-in contribution
    assert(PostingLog.appendBatch(withNull.limit(0), dir, 1L) === 0L)
    assert(PostingLog.appendBatch(
      Seq((3L, null.asInstanceOf[String])).toDF("doc_id", "text"), dir, 2L) === 0L)
    assert(CubeLog.view(spark, dir).liveBatches.map(_._1) === Seq(0L))
  }
}
