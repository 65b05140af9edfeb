package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The mergeable-sketch cube contract: a union of per-day HLL sketches
  * answers EXACTLY like one sketch built over the whole range (register
  * max is associative and grouping-invariant), appends touch no existing
  * file, and the store-answered estimates stay inside the bound the
  * registered query asserts. */
class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private def events = graft.ops.Tables.events(spark, sf0001)

  test("union of stored per-day sketches ≡ one direct sketch over the range (estimate-exact)") {
    val dir = Files.createTempDirectory("sketch_store_").toString + "/daily"
    SketchStore.build(events, dir)
    val merged = spark.read.parquet(dir)
      .agg(hll_sketch_estimate(hll_union_agg($"sketch")).as("est"))
      .head.getLong(0)
    val direct = events
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"))
      .head.getLong(0)
    assert(merged === direct,
      "grouping by day then unioning must reproduce the direct sketch's registers")
    // and the cube is corpus-size-independent: one row per day
    val days = events.select(to_date($"ts")).distinct().count()
    assert(spark.read.parquet(dir).count() === days)
  }

  test("appending a day is additive: existing files untouched, union picks it up") {
    val dir = Files.createTempDirectory("sketch_store_app_").toString + "/daily"
    val d0 = events.select(to_date($"ts").as("day")).agg(min($"day")).head.getDate(0)
    val head = events.filter(to_date($"ts") === lit(d0))
    val rest = events.filter(to_date($"ts") =!= lit(d0))
    SketchStore.build(rest, dir)
    val before = spark.read.parquet(dir).select(input_file_name()).distinct()
      .as[String].collect().toSet
    SketchStore.appendDay(head, dir)
    val after = spark.read.parquet(dir).select(input_file_name()).distinct()
      .as[String].collect().toSet
    assert(before.subsetOf(after), "append must not rewrite existing sketch files")
    val merged = spark.read.parquet(dir)
      .agg(hll_sketch_estimate(hll_union_agg($"sketch"))).head.getLong(0)
    val direct = events
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id"))).head.getLong(0)
    assert(merged === direct, "the appended day must fold into the union")
  }

  test("registered probe: every scope within bound; n_days partition the calendar") {
    val out = graft.SparkEntry.queries("sketch_store_probe")(spark, sf0001).cache()
    try {
      assert(out.count() > 1, "weekly scopes + the all row")
      assert(out.filter(!$"within_bound").count() === 0)
      val all = out.filter($"scope" === "all").head
      val wkDays = out.filter($"scope" =!= "all").agg(sum($"n_days")).head.getLong(0)
      assert(all.getAs[Long]("n_days") === wkDays,
        "weekly day counts must partition the full span")
    } finally out.unpersist()
  }
}
