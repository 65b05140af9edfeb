package graft.sources

import graft.SparkSpec
import graft.meter.MeterGen
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Physical-layout behavior: day chunking on disk, partition pruning in
  * the plan, per-file meter/time clustering (O1/O2 parity). */
class StoreSpec extends SparkSpec {

  test("bronze: day-partitioned layout, pruned single-day scan, clustered files") {
    val dir = Files.createTempDirectory("bronze").toString + "/t"
    val readings = MeterGen.readings(spark, 10, 192) // 2 days
    Store.writeBronze(readings, dir)

    // one directory per day chunk (S11)
    val parts = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.contains("reading_date=")).sorted
    assert(parts.map(_.split("reading_date=").last).toSeq ==
      Seq("2026-01-01", "2026-01-02"))

    // a day predicate prunes to one partition (O1)
    val day = Store.readDay(spark, dir, "2026-01-02")
    assert(day.count() == 10 * 96)
    val plan = day.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(day.queryExecution.executedPlan.collectLeaves().exists { l =>
      l.toString.contains("reading_date")
    })

    // within each file rows are clustered by (meter_id, ts) (O2): the
    // sequence of meter_ids is non-decreasing in file order
    val firstFile = Files.list(Paths.get(parts.head)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head
    val meterSeq = spark.read.parquet(firstFile)
      .select(col("meter_id")).collect().map(_.getInt(0)).toSeq
    assert(meterSeq == meterSeq.sorted, "file not clustered by meter_id")

    // full round trip preserves the data
    assert(Store.readBronze(spark, dir).count() == readings.count())
  }

  test("mart store: full-refresh overwrite semantics (S8)") {
    val dir = Files.createTempDirectory("mart").toString + "/m"
    val stg = graft.meter.Staging.stgMeterReadings(MeterGen.readings(spark, 5, 96))
    val mart = graft.meter.Marts.factCustomerBillingDaily(
      stg, MeterGen.metersDim(spark, 5), MeterGen.customers(spark, 5),
      MeterGen.tariffRates(spark))
    Store.writeMart(mart, dir, "billing_date")
    val n1 = spark.read.parquet(dir).count()
    Store.writeMart(mart, dir, "billing_date") // re-run = same table
    assert(spark.read.parquet(dir).count() == n1)
  }

  test("chunk compaction collapses a day's small files, preserving data and neighbors") {
    val dir = Files.createTempDirectory("bronze_c").toString + "/t"
    val readings = MeterGen.readings(spark, 10, 192) // 2 days
    // simulate micro-batch appends: many small files in each day chunk
    readings
      .withColumn("reading_date", to_date(col("reading_timestamp")))
      .repartition(8)
      .write.partitionBy("reading_date").parquet(dir)
    def files(day: String) = Files.list(Paths.get(s"$dir/reading_date=$day"))
      .toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted
    assert(files("2026-01-01").length == 8, "expected small-file layout")
    val day2Before = files("2026-01-02")
    val before = spark.read.parquet(dir).orderBy("meter_id", "reading_timestamp").collect()

    Store.compactChunk(spark, dir, "2026-01-01", targetFiles = 1)

    assert(files("2026-01-01").length == 1, "day 1 should compact to one file")
    assert(files("2026-01-02").toSeq == day2Before.toSeq, "day 2 files must be untouched")
    val after = spark.read.parquet(dir).orderBy("meter_id", "reading_timestamp").collect()
    assert(after.toSeq == before.toSeq, "compaction must not change the data")
    // compacted file is meter/time-clustered like a fresh bronze write
    val meterSeq = spark.read.parquet(files("2026-01-01").head)
      .select(col("meter_id")).collect().map(_.getInt(0)).toSeq
    assert(meterSeq == meterSeq.sorted)
  }

  test("incremental refresh rewrites only the updated day's partition") {
    val dir = Files.createTempDirectory("mart_inc").toString + "/m"
    def mart(nIntervals: Long) = graft.meter.Marts.factCustomerBillingDaily(
      graft.meter.Staging.stgMeterReadings(MeterGen.readings(spark, 5, nIntervals)),
      MeterGen.metersDim(spark, 5), MeterGen.customers(spark, 5),
      MeterGen.tariffRates(spark))
    Store.writeMart(mart(96 * 3), dir, "billing_date") // 3 days
    val filesBefore = Files.walk(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted
    def mtime(p: String) = Files.getLastModifiedTime(Paths.get(p)).toMillis
    val day1Before = filesBefore.filter(_.contains("billing_date=2026-01-01")).map(mtime)
    Thread.sleep(1100) // ensure distinguishable mtimes

    // "late data" arrives for day 2 only: refresh that one slice
    val updated = mart(96 * 3).filter(col("billing_date") === lit("2026-01-02").cast("date"))
    Store.refreshMartPartitions(updated, dir, "billing_date")

    val after = spark.read.parquet(dir)
    assert(after.count() == 15, "3 days x 5 customers survive the refresh")
    assert(after.select(countDistinct(col("billing_date"))).head().getLong(0) == 3)
    // untouched partitions keep their original files
    val day1After = Files.walk(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted
      .filter(_.contains("billing_date=2026-01-01")).map(mtime)
    assert(day1After.toSeq == day1Before.toSeq,
      "day-1 chunk must not be rewritten by a day-2 refresh")
  }

  test("retention drops only chunks older than the cutoff, byte-identically elsewhere") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val dir = JFiles.createTempDirectory("retain").toString + "/bronze"
    val raw = MeterGen.readings(spark, 5, 96 * 3) // 3 days
    Store.writeBronze(raw, dir)
    assert(spark.read.parquet(dir)
      .select(countDistinct(col("reading_date"))).head().getLong(0) == 3)
    def mtimes = JFiles.walk(JPaths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted
      .map(p => p -> JFiles.getLastModifiedTime(JPaths.get(p)).toMillis).toSeq

    val before = mtimes.filterNot(_._1.contains("reading_date=2026-01-01"))
    val dropped = Store.dropChunksOlderThan(dir, "2026-01-02")
    assert(dropped == Seq("2026-01-01"))
    val after = spark.read.parquet(dir)
    assert(after.select(countDistinct(col("reading_date"))).head().getLong(0) == 2)
    assert(after.filter(col("reading_date") === lit("2026-01-01").cast("date")).count() == 0)
    assert(after.count() == raw.count() * 2 / 3)
    // surviving chunks untouched (no rewrite)
    assert(mtimes == before)
    // idempotent: nothing older remains
    assert(Store.dropChunksOlderThan(dir, "2026-01-02").isEmpty)
  }

  test("schema evolution: old chunks read alongside a widened new chunk") {
    import spark.implicits._
    val dir = Files.createTempDirectory("evolve").toString + "/bronze"
    // day-1 chunk written before the schema gained `quality_score`
    Seq((1, "2026-01-01", 100L), (2, "2026-01-01", 200L))
      .toDF("meter_id", "reading_date", "cons")
      .write.partitionBy("reading_date").parquet(dir)
    // day-2 chunk written by the upgraded pipeline (extra nullable column)
    Seq((1, "2026-01-02", 150L, 0.97), (2, "2026-01-02", 260L, 0.88))
      .toDF("meter_id", "reading_date", "cons", "quality_score")
      .write.mode("append").partitionBy("reading_date").parquet(dir)

    val all = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(all.count() == 4)
    assert(all.columns.contains("quality_score"))
    // old rows surface NULL for the new column; new rows keep their values
    assert(all.filter(col("reading_date") === "2026-01-01")
      .filter(col("quality_score").isNotNull).count() == 0)
    assert(all.filter(col("reading_date") === "2026-01-02")
      .filter(col("quality_score").isNull).count() == 0)
    // aggregations spanning the boundary stay correct
    assert(all.agg(sum(col("cons"))).head().getLong(0) == 710L)
  }

  test("bucketed tables co-locate the join: zero exchanges in the plan") {
    import graft.ops.Tables
    // bucketBy on the join key at write time = the co-located-join scale
    // strategy: both sides land pre-partitioned on disk, so the join
    // plans with NO shuffle exchange at any size ratio
    Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("b_orders")
    Tables.customer(spark, sf0001)
      .select(col("c_custkey"), col("c_name"))
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("b_cust")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("b_orders")
        .join(spark.table("b_cust"), col("o_custkey") === col("c_custkey"))
      assert(j.count() == Tables.orders(spark, sf0001).count())
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_cust")
    }
  }
}
