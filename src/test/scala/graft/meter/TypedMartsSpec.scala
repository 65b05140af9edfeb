package graft.meter

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Typed ≡ untyped: the `Dataset[T]`/`Aggregator` billing mart must be
  * bit-identical to the DataFrame mart, and its plan must keep the dims
  * broadcast (the typed API may change codegen, never shuffle structure).
  */
class TypedMartsSpec extends SparkSpec {

  private def both() = {
    val stg = Staging.stgMeterReadings(MeterGen.readings(spark, 40, 96))
    val meters = MeterGen.metersDim(spark, 40)
    val customers = MeterGen.customers(spark, 40)
    val tariff = MeterGen.tariffRates(spark)
    (Marts.factCustomerBillingDaily(stg, meters, customers, tariff),
      TypedMarts.factCustomerBillingDailyTyped(stg, meters, customers, tariff))
  }

  test("typed billing mart is bit-identical to the untyped mart") {
    val (untyped, typed) = both()
    assert(typed.columns.sorted.toSeq == untyped.columns.sorted.toSeq)
    val cols = untyped.columns.map(col).toSeq
    // exact equality both directions — doubles compare bit-wise through except
    assert(typed.select(cols: _*).except(untyped.select(cols: _*)).count() == 0)
    assert(untyped.select(cols: _*).except(typed.select(cols: _*)).count() == 0)
    assert(typed.count() == untyped.count())
  }

  test("typed mart plan keeps dimension joins broadcast") {
    val (_, typed) = both()
    val plan = typed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast dim joins in:\n$plan")
    // no shuffle-side (sort-merge) join should appear for the tiny dims
    assert(!plan.contains("SortMergeJoin"), s"unexpected SortMergeJoin in:\n$plan")
  }
}
