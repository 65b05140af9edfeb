package graft.quality

import graft.SparkSpec
import graft.meter.MeterGen
import org.apache.spark.sql.functions._

/** The dbt-test-parity check library: clean data yields zero violations,
  * planted defects are counted exactly. */
class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("clean generated data passes the reference's declared test suite") {
    val readings = MeterGen.readings(spark, 10, 48)
    val meters = MeterGen.metersDim(spark, 10)
    val zones = MeterGen.gridZones(spark)
    val results = Checks.suite(Seq(
      Checks.notNull(readings, "reading_timestamp"),
      Checks.notNull(readings, "meter_id"),
      Checks.acceptedValues(readings, "status", Seq("V", "E", "R")),
      Checks.nonNegative(readings, "reading_consumption_milliwatts"),
      Checks.atLeastOnePresent(readings,
        Seq("reading_consumption_milliwatts", "reading_production_milliwatts")),
      Checks.unique(readings, Seq("reading_timestamp", "meter_id")),
      Checks.unique(meters, Seq("meter_id")),
      Checks.referentialIntegrity(meters, "grid_zone_id", zones, "grid_zone_id")))
    assert(results.count() == 8)
    assert(results.filter(col("violations") =!= 0L).count() == 0)
  }

  test("singlePass fuses same-table checks into one scan with identical results") {
    val docs = graft.ops.Tables.documents(spark, sf0001)
    val checks = Seq(
      Checks.notNullCheck("doc_id"),
      Checks.nonNegativeCheck("n_chars"),
      Checks.acceptedValuesCheck("lang", Seq("en", "de", "zh", "fr", "es")),
      Checks.atLeastOnePresentCheck(Seq("text", "source")))
    val fused = Checks.singlePass(docs, checks)

    // one physical scan of the parquet table, however many checks run
    val scans = fused.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1, s"expected 1 scan:\n${fused.queryExecution.sparkPlan}")

    // identical (check_name, col_name, violations, total) rows as the
    // one-check-at-a-time formulation
    val separate = Checks.suite(Seq(
      Checks.notNull(docs, "doc_id"),
      Checks.nonNegative(docs, "n_chars"),
      Checks.acceptedValues(docs, "lang", Seq("en", "de", "zh", "fr", "es")),
      Checks.atLeastOnePresent(docs, Seq("text", "source"))))
    assert(fused.collect().toSet == separate.collect().toSet)
    assert(fused.count() == 4)
  }

  test("planted defects are counted exactly") {
    val bad = Seq(
      (Some(1), Some("V"), Some(10L)),
      (Some(1), Some("X"), Some(-5L)), // dup key, bad status, negative
      (None, Some("E"), None), // null id, all-null measure pair handled below
      (Some(2), None, Some(3L)))
      .toDF("meter_id", "status", "cons")
    assert(Checks.notNull(bad, "meter_id").head().getAs[Long]("violations") == 1L)
    assert(Checks.notNull(bad, "status").head().getAs[Long]("violations") == 1L)
    // NULL passes accepted_values (dbt semantics: not_null is a separate check)
    assert(Checks.acceptedValues(bad, "status", Seq("V", "E", "R"))
      .head().getAs[Long]("violations") == 1L)
    assert(Checks.nonNegative(bad, "cons").head().getAs[Long]("violations") == 1L)
    assert(Checks.unique(bad, Seq("meter_id")).head().getAs[Long]("violations") == 1L)
  }
}
