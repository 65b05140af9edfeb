package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev helper (not part of the driver contract): materializes a synthetic
  * 10× corpus — "sf1" — from the largest driver-provided scale factor, so
  * the data-bound tail of SCALING.md can be measured one decade further
  * than the shipped testdata reaches (`runMain graft.ScaleGen [srcDir]
  * [outDir] [factor]`).
  *
  * Construction: each table is the union of `factor` copies with
  * PRIMARY-KEY COLUMNS SHIFTED by copy-index × (max_key + 1), so keys stay
  * unique and join fan-outs stay realistic (10× orders spread over 10×
  * order keys, 10× events over 10× users/events); foreign keys into
  * replicated tables shift in lockstep (lineitem.l_orderkey follows
  * orders.o_orderkey). Content columns replicate verbatim — per-row and
  * per-document work (fingerprinting, PII scans, JSON codecs) is
  * insensitive to content identity, which is what the tail queries
  * measure. Only the four tables the high-ratio queries read are scaled;
  * dims they join stay at source scale (the realistic shape: facts grow,
  * dims don't).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scale-gen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Union `factor` key-shifted copies; `shifted` are BIGINT key columns
      * that must stay globally unique across copies. */
    def replicate(df: DataFrame, shifted: Seq[String]): DataFrame = {
      val spans = shifted.map(c =>
        c -> (df.agg(max(col(c))).head.getLong(0) + 1L)).toMap
      (0 until factor).map { i =>
        shifted.foldLeft(df) { case (d, c) =>
          d.withColumn(c, col(c) + lit(i * spans(c)))
        }
      }.reduce(_ unionByName _)
    }

    def write(name: String, df: DataFrame): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scale-gen] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }

    val events = spark.read.parquet(s"$src/events.parquet")
    write("events", replicate(events, Seq("event_id", "user_id")))
    val documents = spark.read.parquet(s"$src/documents.parquet")
    write("documents", replicate(documents, Seq("doc_id")))
    // orders/lineitem shift the SAME order-key span so the FK stays valid
    val orders = spark.read.parquet(s"$src/orders.parquet")
    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    val okSpan = orders.agg(max(col("o_orderkey"))).head.getLong(0) + 1L
    write("orders", (0 until factor).map(i =>
      orders.withColumn("o_orderkey", col("o_orderkey") + lit(i * okSpan)))
      .reduce(_ unionByName _))
    write("lineitem", (0 until factor).map(i =>
      lineitem.withColumn("l_orderkey", col("l_orderkey") + lit(i * okSpan)))
      .reduce(_ unionByName _))
    // embeddings scale with DISTINCT vectors: copy i circularly rotates
    // every embedding by 3i components (an orthogonal permutation — a
    // copy's internal cluster geometry is preserved exactly, while
    // cross-copy vectors occupy genuinely different directions). Verbatim
    // replication would plant 9 exact twins per vector and turn any
    // recall measurement into a find-your-own-copy triviality; rotation
    // keeps the corpus's cosine regime (true neighbors at 0.32-0.49)
    // intact one decade up, which is what the VecStore sf1 recall row
    // must measure.
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vidSpan = emb.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    // rotation amounts (i*3) % dim must be pairwise DISTINCT across
    // copies, or colliding copies are exact twins and the recall
    // measurement degenerates to find-your-own-copy — fail loudly rather
    // than silently reintroduce the triviality the rotation prevents
    require(factor * 3 <= dim,
      s"embedding replication factor $factor needs 3*factor <= dim=$dim " +
        "for distinct per-copy rotations; raise dim or shrink factor")
    write("embeddings", (0 until factor).map { i =>
      val r = (i * 3) % dim
      emb.withColumn("vec_id", col("vec_id") + lit(i * vidSpan))
        .withColumn("embedding",
          if (r == 0) col("embedding")
          else expr(s"concat(slice(embedding, ${r + 1}, ${dim - r}), " +
            s"slice(embedding, 1, $r))"))
    }.reduce(_ unionByName _))
    // dims + remaining tables pass through at source scale
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
        println(s"[scale-gen] $t: passthrough")
      }
    spark.stop()
  }
}
