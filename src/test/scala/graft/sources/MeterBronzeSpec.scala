package graft.sources

import graft.SparkSpec
import graft.meter.MeterGen
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The composite-layout governance contract on the reference's own
  * domain: RTBF by meter touches ONLY the affected mbucket directories
  * (byte-identical everything else, across every date chunk), retention
  * drops whole date chunks with zero rows read, and replay is a no-op.
  * The DuckDB oracle proves the surviving SET; these prove the physical
  * discipline at the composite (chunk_date × mbucket) layout.
  */
class MeterBronzeSpec extends SparkSpec {

  private def snapshot(dir: String): Map[String, (Long, Long)] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        (Files.getLastModifiedTime(p).toMillis, Files.size(p)))
      .toMap

  private val nMeters = 40L
  private val nIntervals = 192L // 2 days -> 2 chunk_date partitions

  private def freshStore(): (String, org.apache.spark.sql.DataFrame) = {
    val dir = Files.createTempDirectory("meter_bronze_spec_").toString + "/bronze"
    val readings = MeterGen.readings(spark, nMeters, nIntervals)
    MeterBronze.build(readings, dir)
    (dir, readings)
  }

  test("RTBF erase rewrites only the affected buckets, every date chunk else byte-identical") {
    val (dir, readings) = freshStore()
    val ids = Seq(3L, 17L)
    val affected = ids.map(MeterBronze.bucketOf(_)).distinct.toSet
    val before = snapshot(dir)

    // read side lists only |dates| x |affected buckets| composite dirs
    val slice = spark.read.parquet(dir)
      .filter(col("mbucket").isin(affected.toSeq: _*))
    val scans = slice.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.selectedPartitions.partitionCount === 2 * affected.size,
      "erase slice listed more composite partitions than dates x request buckets")

    val erased = MeterBronze.eraseByMeterIds(spark, dir, ids)
    assert(erased === ids.size * nIntervals)

    // survivors equal the original minus the requested meters, column-exact
    val after = spark.read.parquet(dir).drop("chunk_date", "mbucket")
    val expect = readings.filter(!col("meter_id").isin(ids: _*))
    val cols = expect.columns.sorted.toIndexedSeq
    assert(after.count() === expect.count())
    assert(after.selectExpr(cols: _*).except(expect.selectExpr(cols: _*)).count() === 0)
    assert(expect.selectExpr(cols: _*).except(after.selectExpr(cols: _*)).count() === 0)

    // untouched buckets byte-identical in EVERY date chunk; affected replaced
    val post = snapshot(dir)
    before.foreach { case (p, stamp) =>
      val b = "mbucket=(\\d+)".r.findFirstMatchIn(p).get.group(1).toLong
      if (affected(b)) assert(!post.contains(p) || post(p) != stamp,
        s"affected bucket $b file $p survived the rewrite untouched")
      else assert(post(p) === stamp, s"untouched bucket $b file $p was rewritten")
    }
  }

  test("retention drop_chunks analogue: old date chunk removed driver-side, newer chunk untouched") {
    val (dir, _) = freshStore()
    val dates = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("chunk_date="))
      .map(_.stripPrefix("chunk_date=")).toSeq.sorted
    assert(dates.size === 2)
    val keepSnapshot = snapshot(s"$dir/chunk_date=${dates.last}")
    assert(MeterBronze.dropChunksBefore(spark, dir, dates.last) === 1)
    assert(!Files.exists(Paths.get(s"$dir/chunk_date=${dates.head}")))
    assert(snapshot(s"$dir/chunk_date=${dates.last}") === keepSnapshot,
      "retention must not touch surviving chunks")
    // dropping again: nothing older remains
    assert(MeterBronze.dropChunksBefore(spark, dir, dates.last) === 0)
  }

  test("fully-emptied composite partitions are deleted; absent ids and replay are no-ops") {
    val (dir, _) = freshStore()
    // erase every meter landing in one bucket -> that bucket dir empties
    // under BOTH date chunks
    val target = MeterBronze.bucketOf(1L)
    val bucketIds = (1L to nMeters).filter(MeterBronze.bucketOf(_) == target)
    assert(bucketIds.nonEmpty)
    assert(MeterBronze.eraseByMeterIds(spark, dir, bucketIds) ===
      bucketIds.size * nIntervals)
    val leftover = Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString == s"mbucket=$target")
      .toSeq
    assert(leftover.isEmpty,
      s"fully-erased bucket dirs must be deleted under every date chunk: $leftover")

    // absent ids: clean no-op; replay: zero removed, store unchanged
    val before = snapshot(dir)
    assert(MeterBronze.eraseByMeterIds(spark, dir, Seq(999999L)) === 0L)
    assert(MeterBronze.eraseByMeterIds(spark, dir, bucketIds) === 0L)
    assert(snapshot(dir) === before)
  }

  test("bucketsFor: constant rewrite unit, NBuckets floor, power-of-two") {
    import MeterBronze._
    // the BASELINE 1M-meter fleet is exactly the shipped constant
    assert(bucketsFor(1000000L) === NBuckets.toLong)
    // tiny test fleets keep the parallelism/pruning floor
    assert(bucketsFor(NMeters) === NBuckets.toLong)
    // above the floor: bucket-day never exceeds the target unit, never
    // undershoots half of it (power-of-two ceiling), and is monotone
    var prev = 0L
    for (fleet <- Seq(2000000L, 5000000L, 16000000L, 123456789L)) {
      val b = bucketsFor(fleet)
      val rowsPerBucketDay = fleet * ReadingsPerMeterDay / b
      assert(rowsPerBucketDay <= TargetRowsPerBucketDay,
        s"fleet=$fleet buckets=$b unit=$rowsPerBucketDay exceeds target")
      assert(rowsPerBucketDay * 2 > TargetRowsPerBucketDay / 2,
        s"fleet=$fleet buckets=$b over-shards")
      assert((b & (b - 1)) === 0L, s"buckets=$b not a power of two")
      assert(b >= prev, "bucket count must be monotone in fleet size")
      prev = b
    }
    // driver/engine bucket arithmetic stays bit-identical at derived counts
    val b = bucketsFor(16000000L)
    val viaCol = graft.ops.Tables.events(spark, sf0001).limit(1)
      .select(MeterBronze.bucketCol(org.apache.spark.sql.functions.lit(42L), b))
      .head().getLong(0)
    assert(viaCol === MeterBronze.bucketOf(42L, b))
  }

  test("registered query equals the declarative survivor set") {
    val got = graft.SparkEntry.queries("meter_erase_rewrite")(spark, sf0001)
    val expect = MeterGen.readings(spark, MeterBronze.NMeters, MeterBronze.NIntervals)
      .filter(col("meter_id") % 37 =!= 0)
    assert(got.count() === expect.count())
    assert(got.except(expect).count() === 0)
    assert(expect.except(got).count() === 0)
  }
}
