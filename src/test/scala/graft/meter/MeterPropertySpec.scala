package graft.meter

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5): telescoping-sum and idempotence
  * invariants over generator-drawn parameters (plain scalacheck Gen with a
  * fixed seed — scalatestplus isn't available in the offline cache).
  */
class MeterPropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("Σ(deltas) == last cumulative per meter, for arbitrary sizes") {
    val params = samples(Gen.zip(Gen.choose(1, 12), Gen.choose(2, 60)), 5)
    assert(params.nonEmpty)
    params.foreach { case (nMeters, nIntervals) =>
      val raw = MeterGen.readings(spark, nMeters, nIntervals)
      val stg = Staging.stgMeterReadings(raw)
      val sums = stg.groupBy("meter_id").agg(sum("consumption_delta_mwh").as("s"))
      val last = raw.groupBy("meter_id").agg(max("reading_consumption_milliwatts").as("l"))
      val bad = sums.join(last, "meter_id").filter(col("s") =!= col("l"))
      assert(bad.count() == 0, s"telescoping violated at n=$nMeters t=$nIntervals")
    }
  }

  test("production deltas telescope too (solar meters only)") {
    val params = samples(Gen.zip(Gen.choose(2, 10), Gen.choose(2, 48)), 3)
    params.foreach { case (nMeters, nIntervals) =>
      val raw = MeterGen.readings(spark, nMeters, nIntervals)
      val stg = Staging.stgMeterReadings(raw)
      val sums = stg.filter(col("has_solar"))
        .groupBy("meter_id").agg(sum("production_delta_mwh").as("s"))
      val last = raw.filter(col("reading_production_milliwatts").isNotNull)
        .groupBy("meter_id").agg(max("reading_production_milliwatts").as("l"))
      val bad = sums.join(last, "meter_id").filter(col("s") =!= col("l"))
      assert(bad.count() == 0)
    }
  }

  test("idempotent ingest: appending the same batch twice equals appending once") {
    samples(Gen.choose(1, 8), 3).foreach { nMeters =>
      val dir = java.nio.file.Files.createTempDirectory("prop").toString
      val batch = MeterGen.readings(spark, nMeters, 8)
      graft.streaming.Ingest.idempotentAppend(batch, s"$dir/b")
      val once = spark.read.parquet(s"$dir/b").count()
      graft.streaming.Ingest.idempotentAppend(batch, s"$dir/b")
      val twice = spark.read.parquet(s"$dir/b").count()
      assert(once == twice && once == nMeters * 8L)
    }
  }
}
