package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Policy-filter invariants that the DuckDB oracle can't express:
  * composite-flag consistency, keep-set semantics, histogram mass
  * conservation, top-token determinism. */
class TextPolicySpec extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf0001)

  test("gopher: pass_gopher == conjunction of the individual rule flags") {
    val df = run("text_gopher_rules")
    val bad = df.filter(
      col("pass_gopher") =!=
        (col("f_word_count") * col("f_mean_word_len") * col("f_stopwords")
          * col("f_alpha") * col("f_distinct")))
    assert(bad.count() === 0)
    // every flag is strictly 0/1
    val flags = Seq("f_word_count", "f_mean_word_len", "f_stopwords", "f_alpha",
      "f_distinct", "pass_gopher")
    assert(df.filter(flags.map(f => !col(f).isin(0L, 1L)).reduce(_ || _)).count() === 0)
    // the rules actually discriminate on this corpus (not all-pass/all-fail)
    val n = df.count()
    val p = df.filter(col("pass_gopher") === 1).count()
    assert(p > 0 && p < n, s"degenerate policy: $p of $n pass")
  }

  test("c4: keep-set drops every non-first duplicate copy and nothing else unexpected") {
    val df = run("text_c4_policy").cache()
    try {
      // one kept copy per duplicate group unless the group fails other rules
      val dupGroups = df.filter(col("n_copies") > 1)
      if (dupGroups.count() > 0) {
        assert(dupGroups.filter(col("copy_rank") > 1 && col("keep") === 1).count() === 0)
      }
      // keep == conjunction
      val bad = df.filter(col("keep") =!=
        when(col("n_words") >= 5 && col("has_banned") === 0 && col("copy_rank") === 1, 1L)
          .otherwise(0L))
      assert(bad.count() === 0)
    } finally df.unpersist()
  }

  test("histogram: bucket mass sums back to corpus totals; buckets are powers of two") {
    val docs = graft.ops.Tables.documents(spark, sf0001)
    val nDocs = docs.count()
    val nWords = docs.select(sum(size(split(col("text"), " ", -1)).cast("long")))
      .head.getLong(0)
    val h = run("text_length_histogram")
    val agg = h.select(sum("n_docs"), sum("total_words")).head
    assert(agg.getLong(0) === nDocs)
    assert(agg.getLong(1) === nWords)
    // doc word counts land in the right bucket: 2^p <= n_words < 2^(p+1),
    // asserted per document against the recomputed word count
    val perDoc = docs
      .select(size(split(col("text"), " ", -1)).cast("long").as("n_words"))
      .withColumn("p", (length(bin(col("n_words"))) - 1).cast("long"))
    assert(perDoc.filter(
      col("n_words") < pow(lit(2.0), col("p")).cast("long") ||
        col("n_words") >= pow(lit(2.0), col("p") + 1).cast("long")).count() === 0)
    assert(h.filter(col("bucket_pow2") < 0 || col("bucket_pow2") > 30).count() === 0)
  }

  test("top tokens: exactly 20 ranked rows, counts non-increasing, deterministic") {
    val t = run("text_top_tokens").orderBy("rank").collect()
    assert(t.length === 20)
    val counts = t.map(_.getAs[Long]("n"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    val again = run("text_top_tokens").orderBy("rank").collect()
    assert(t.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("unpivot: long form carries exactly |flags|×3 rows and round-trips the aggregate") {
    val long = run("unpivot_metrics_long").cache()
    try {
      val flagsN = graft.ops.Tables.lineitem(spark, sf0001)
        .select(countDistinct(col("l_returnflag"))).head.getLong(0)
      assert(long.count() === flagsN * 3)
      assert(long.select(countDistinct(col("metric"))).head.getLong(0) === 3)
    } finally long.unpersist()
  }

  test("hof arrays: norm2 is nonnegative, dim constant, n_pos bounded by dim") {
    val df = run("e_hof_arrays").cache()
    try {
      assert(df.filter(col("norm2") < 0).count() === 0)
      assert(df.select(countDistinct(col("dim"))).head.getLong(0) === 1)
      assert(df.filter(col("n_pos") > col("dim")).count() === 0)
      assert(df.filter(col("q_max") < col("q_min")).count() === 0)
    } finally df.unpersist()
  }

  test("centroid classifier: train error count equals apply disagreement; model beats majority class") {
    val train = run("quality_classifier_centroid").head
    val apply = run("quality_classifier_apply").cache()
    try {
      val n = train.getAs[Long]("n_docs")
      val nPos = train.getAs[Long]("n_pos")
      val nErr = train.getAs[Long]("n_errors")
      // the two queries share training, so the reported training error
      // must equal the per-doc disagreement count exactly
      val disagree = apply.filter(col("agree") === 0).count()
      assert(nErr === disagree, s"train says $nErr errors, apply says $disagree")
      assert(apply.count() === n)
      // the learned filter must genuinely beat the majority-class
      // baseline (otherwise it is a degenerate one-class predictor —
      // the failure mode that disqualified the batch perceptron)
      val majorityErr = math.min(nPos, n - nPos)
      assert(nErr < majorityErr,
        s"model errs $nErr >= majority-class baseline $majorityErr")
      assert(train.getAs[Long]("error_ppm") <= 200000L,
        "training accuracy fell below 0.8")
      // predictions are strictly ±1 and agree is their match indicator
      assert(apply.filter(!col("y_pred").isin(1L, -1L)).count() === 0)
      assert(apply.filter(col("agree") =!=
        when(col("y_pred") === col("y_rule"), 1L).otherwise(0L)).count() === 0)
    } finally apply.unpersist()
  }

  test("centroid classifier: shipped threshold is the exact empirical-risk minimizer") {
    // brute-force twin at sf0.001: for every candidate threshold (each
    // distinct projection + the all-positive sentinel), recount errors
    // driver-side and confirm the banded prefix-sum scan picked the
    // minimum (ties broken toward the smallest threshold)
    val train = run("quality_classifier_centroid").head
    val apply = run("quality_classifier_apply")
    val t = train.getAs[Long]("threshold")
    val nErr = train.getAs[Long]("n_errors")
    // recover each doc's projection side from its prediction: y_pred=+1
    // iff proj > t, so reconstruct (y_rule, proj) directly instead —
    // recompute projections from the published weights and raw features
    val docs = graft.ops.Tables.documents(spark, sf0001)
    val w = split(col("text"), " ", -1)
    val x1 = size(w).cast("long")
    val feats = docs.select(
      (least(x1, lit(1000L)) * 1000L).as("f1"),
      (length(col("text")).cast("long") * 1000L / x1).cast("long").as("f2"),
      (size(filter(w, x => Seq("the", "a", "of", "and").map(v => x === v).reduce(_ || _)))
        .cast("long") * 1000000L / x1).cast("long").as("f3"),
      (size(filter(w, _.rlike("^[a-z]+$"))).cast("long") * 1000000L / x1).cast("long").as("f4"),
      (size(array_distinct(w)).cast("long") * 1000000L / x1).cast("long").as("f5"),
      x1.as("x1"),
      (size(filter(w, x => Seq("the", "a", "of", "and").map(v => x === v).reduce(_ || _))))
        .cast("long").as("x3"),
      size(filter(w, _.rlike("^[a-z]+$"))).cast("long").as("x4"),
      size(array_distinct(w)).cast("long").as("x5"))
    val proj = Seq("f1", "f2", "f3", "f4", "f5").zip(
      Seq("w_words", "w_mwl", "w_stop", "w_alpha", "w_distinct"))
      .map { case (f, wn) => col(f) * lit(train.getAs[Long](wn)) }.reduce(_ + _)
    val y = when(col("x1").between(50L, 100000L) &&
      col("x3") * 50 >= col("x1") && col("x4") * 5 >= col("x1") * 4 &&
      col("x5") * 10 >= col("x1") * 3, 1L).otherwise(-1L)
    val py = feats.select(proj.as("proj"), y.as("y")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def errsAt(thr: Long): Long =
      py.count { case (p, yy) => if (p > thr) yy == -1L else yy == 1L }.toLong
    assert(errsAt(t) === nErr, "reported error count disagrees with brute force")
    val cands = py.map(_._1).distinct :+ (py.map(_._1).min - 1)
    val bruteBest = cands.map(c => (errsAt(c), c)).min
    assert((nErr, t) === bruteBest,
      s"scan picked ($nErr, $t) but brute force found $bruteBest")
  }
}
