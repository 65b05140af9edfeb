package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev helper (not part of the driver contract): measures the VecStore
  * probe's retrieval quality at a given corpus scale with the SCALE-AWARE
  * sizing rule ([[VecStore.cellKFor]] ≈ √n cells,
  * [[VecStore.probeCellsFor]] ≤ 25% of cells probed) — the evidence
  * behind SCALING.md's recall-vs-scale rows. Builds the index in a
  * scratch dir, probes every 50th vector, scores against the exact
  * brute-force top-5, prints ONE JSON line.
  *
  * `runMain graft.sources.VecStoreRecall [srcDir] [cellK] [probeCells]`
  * (cellK/probeCells default to the derived rule; pass explicit values to
  * reproduce the shipped fixed-k=16 point).
  */
object VecStoreRecall {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-vecstore-recall")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .localCheckpoint(eager = true)
    val n = emb.count()
    val cellK = if (args.length > 1) args(1).toInt else VecStore.cellKFor(n)
    val probeCells =
      if (args.length > 2) args(2).toInt else VecStore.probeCellsFor(cellK)

    val dir = s"${sys.props("java.io.tmpdir")}/graft_vecstore_recall/" +
      s"${java.util.UUID.randomUUID()}"
    val t0 = System.nanoTime()
    VecStore.build(emb, dir, cellK)
    val buildSec = (System.nanoTime() - t0) / 1e9

    val queries = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"), col("embedding"))
    val t1 = System.nanoTime()
    val probe = VecStore.probeTopK(spark, dir, queries, probeCells)
      .select(col("query_id").cast("long"), col("vec_id").cast("long"),
        col("n_cands"))
      .localCheckpoint(eager = true)
    val probeSec = (System.nanoTime() - t1) / 1e9

    // exact ground truth: brute-force cosine top-5 over the full corpus
    // (fixed-point arithmetic identical to the index side)
    def qn(df: DataFrame): DataFrame = df
      .withColumn("qv", expr(s"transform(embedding, x -> " +
        s"CAST(round(CAST(x AS DOUBLE) * ${graft.llm.Similarity.Q}) AS BIGINT))"))
      .withColumn("norm2", graft.functions.FixedPointDot(col("qv"), col("qv")))
    val qq = qn(queries)
    val truth = qn(emb).as("b")
      .join(broadcast(qq.as("a")), col("b.vec_id") =!= col("a.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("vec_id"),
        (graft.functions.FixedPointDot(col("a.qv"), col("b.qv")).cast("double")
          / (sqrt(col("a.norm2").cast("double")) * sqrt(col("b.norm2").cast("double"))))
          .as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id").cast("long"), col("vec_id").cast("long"))

    val got = probe.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val want = truth.as[(Long, Long)].collect().toSet
    val recall = (got & want).size.toDouble / want.size
    val meanCands = probe.select(col("query_id"), col("n_cands")).distinct()
      .agg(avg(col("n_cands"))).head().getDouble(0)
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    println(s"""{"n":$n,"cell_k":$cellK,"probe_cells":$probeCells,""" +
      s""""recall5":${f(recall)},"probed_frac":${f(meanCands / n)},""" +
      s""""build_sec":${f(buildSec)},"probe_sec":${f(probeSec)},"src":"$src"}""")
    spark.stop()
  }
}
