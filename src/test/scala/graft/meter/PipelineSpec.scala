package graft.meter

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** End-to-end pipeline run: bronze landed, marts refreshed, results equal
  * the direct (unmaterialized) computation. */
class PipelineSpec extends SparkSpec {

  test("full batch run: bronze + both marts, consistent with direct computation") {
    val dir = Files.createTempDirectory("pipeline").toString
    val (billing, grid) = Pipeline.run(spark, nMeters = 20, nIntervals = 192, dir)

    assert(billing.count() == 20 * 2) // 20 customers × 2 days
    assert(grid.count() > 0)

    // bronze landed chunked
    val p = Pipeline.Paths(dir)
    assert(Files.list(Paths.get(p.bronze)).toArray.map(_.toString)
      .count(_.contains("reading_date=")) == 2)

    // materialized mart equals the direct computation (modulo row order)
    val direct = Marts.factCustomerBillingDaily(
      Staging.stgMeterReadings(MeterGen.readings(spark, 20, 192)),
      MeterGen.metersDim(spark, 20), MeterGen.customers(spark, 20),
      MeterGen.tariffRates(spark))
    val cols = direct.columns.sorted.toIndexedSeq
    assert(billing.selectExpr(cols: _*).except(direct.selectExpr(cols: _*)).count() == 0)
    assert(direct.selectExpr(cols: _*).except(billing.selectExpr(cols: _*)).count() == 0)

    // grid mart invariant: per-hour zone rows bounded by zones × hours
    assert(grid.select(col("grid_zone_id")).distinct().count() <= 20)
  }
}
