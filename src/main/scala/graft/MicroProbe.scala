package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev helper: isolate the per-row cost of the vector-kernel expression
  * pipeline (guide §1.1 first-principles check — 2000 rows × 64 dims should
  * cost microseconds, the bench charges whole seconds). Times each stage of
  * the assignRanked chain with the noop-style toRdd sink. Not part of the
  * driver contract. */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val k = if (args.length > 1) args(1).toInt else 45
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.Similarity

    val emb = graft.ops.Tables.embeddingsParallel(spark, sfDir)
      .localCheckpoint(eager = true)
    val qe = Similarity.quantizedOf(emb).localCheckpoint(eager = true)
    val cents = Similarity.lloydCentroids(
      qe.select(col("vec_id"), col("qv"), col("norm2")), k, 2)
    val packed = Similarity.centsRow(cents).localCheckpoint(eager = true)

    def time(name: String, reps: Int)(df: => org.apache.spark.sql.DataFrame): Unit = {
      // warm once
      df.queryExecution.toRdd.foreach(_ => ())
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => df.queryExecution.toRdd.foreach(_ => ()))
      println(f"[micro] $name%-34s ${(System.nanoTime() - t0) / 1e9 / reps}%8.3f s/rep")
    }

    time("baseline: qe scan", 3)(qe.select(col("vec_id"), col("qv"), col("norm2")))
    time("quantize transform+round", 3)(Similarity.quantizedOf(emb))
    time("dotmulti only", 3)(
      qe.crossJoin(broadcast(packed))
        .select(col("vec_id"),
          graft.functions.FixedPointDotMulti(col("qv"), col("cqvs")).as("dots")))
    time("dotmulti + ranked sort", 3)(Similarity.assignRankedPacked(qe, packed)
      .select(col("vec_id"), col("ranked")))
    time("ranked[0].id only", 3)(Similarity.assignRankedPacked(qe, packed)
      .select(col("vec_id"), expr("ranked[0].id").as("cell")))
    val dimSums = (0 until 64).map(i => sum(col("qv")(i)).as(s"s$i"))
    time("assign + 64-col agg (1 lloyd rd)", 3)(
      Similarity.assignRankedPacked(qe, packed)
        .select(expr("ranked[0].id").as("c_id"), col("qv"))
        .groupBy(col("c_id"))
        .agg(count(lit(1)).as("n"), dimSums: _*))
    def timeU(name: String, reps: Int)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime()
      (0 until reps).foreach(_ => f)
      println(f"[micro] $name%-34s ${(System.nanoTime() - t0) / 1e9 / reps}%8.3f s/rep")
    }
    timeU("full lloyd k=45 x2 (materialize)", 3) {
      Similarity.lloydCentroids(
        qe.select(col("vec_id"), col("qv"), col("norm2")), k, 2)
        .queryExecution.toRdd.foreach(_ => ())
    }
    timeU("full VecStore.build k=45", 2) {
      val dir = s"${sys.props("java.io.tmpdir")}/graft_micro/${java.util.UUID.randomUUID()}"
      graft.sources.VecStore.build(emb, dir, k)
    }
    spark.stop()
  }
}
