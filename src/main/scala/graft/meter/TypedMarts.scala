package graft.meter

import java.sql.Timestamp
import java.time.{LocalDate, ZoneOffset}

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` / `Aggregator` formulation of the daily billing mart —
  * the same computation as [[Marts.factCustomerBillingDaily]] expressed
  * through the type-safe API surface: case-class rows, `groupByKey` +
  * custom `Aggregator`s, typed broadcast `joinWith`, and compiler-checked
  * field access end to end.
  *
  * Semantics are kept BIT-IDENTICAL to the untyped mart (TypedMartsSpec
  * asserts full equality, and the registered query shares the untyped
  * mart's DuckDB oracle): all sums run on exact integer mWh and convert to
  * kWh once after aggregation; the all-NULL production column stays NULL
  * through both aggregation levels (`Option[Long]` + seen flag, matching
  * SQL `SUM`'s null-skipping); day truncation uses UTC epoch arithmetic
  * identical to `to_date(date_trunc('day', ts))` under the UTC session.
  *
  * Scale note: typed `Aggregator`s run as ObjectHashAggregate with the
  * same partial/final two-phase shape as the codegen'd hash aggregate,
  * and `joinWith(broadcast(...))` keeps the dim joins broadcast — the plan
  * differs in codegen (object serialization at the agg boundary), not in
  * shuffle structure. The untyped mart remains the hot path; this surface
  * exists for pipelines that want compile-time row contracts.
  */
object TypedMarts {

  // ---- typed row contracts ----

  case class StgReading(
      reading_timestamp: Timestamp,
      meter_id: Int,
      consumption_delta_mwh: Long,
      production_delta_mwh: Option[Long],
      is_valid: Boolean,
      is_estimated: Boolean,
      is_error: Boolean,
      has_solar: Boolean)

  case class DayMeterKey(billing_date: LocalDate, meter_id: Int)

  /** Aggregation buffer: `prodSeen` distinguishes SUM-of-all-NULLs (NULL)
    * from a true zero, matching SQL aggregate null semantics. */
  case class MeterDayAcc(
      cons: Long, prodSum: Long, prodSeen: Boolean, net: Long,
      n: Long, valid: Long, estimated: Long, error: Long, hasSolar: Boolean)

  case class MeterDay(
      billing_date: LocalDate, meter_id: Int,
      cons_mwh: Long, prod_mwh: Option[Long], net_mwh: Long,
      reading_count: Long, valid_reading_count: Long,
      estimated_reading_count: Long, error_reading_count: Long,
      has_solar: Boolean)

  case class MeterDim(meter_id: Int, customer_id: Int)
  case class CustomerDim(customer_id: Int, customer_name: String)
  case class TariffRow(base_rate_per_kwh: java.math.BigDecimal)

  case class CustKey(billing_date: LocalDate, customer_id: Int, customer_name: String)

  case class CustAcc(
      cons: Long, prodSum: Long, prodSeen: Boolean, net: Long,
      meters: Long, readings: Long, valid: Long, estimated: Long, error: Long,
      hasSolar: Boolean)

  case class BillingDaily(
      billing_date: LocalDate, customer_id: Int, customer_name: String,
      total_consumption_kwh: Double, total_production_kwh: Option[Double],
      total_net_consumption_kwh: Double,
      consumption_charge: Double, production_credit: Option[Double],
      net_charge: Double,
      meter_count: Long, total_reading_count: Long, valid_reading_count: Long,
      estimated_reading_count: Long, error_reading_count: Long,
      has_solar: Boolean, data_quality_pct: Double)

  // ---- aggregators ----

  /** Per-(day, meter) rollup of staged readings. */
  object DailyMeterAgg extends Aggregator[StgReading, MeterDayAcc, MeterDayAcc] {
    def zero: MeterDayAcc = MeterDayAcc(0L, 0L, false, 0L, 0L, 0L, 0L, 0L, false)
    def reduce(a: MeterDayAcc, r: StgReading): MeterDayAcc = MeterDayAcc(
      a.cons + r.consumption_delta_mwh,
      a.prodSum + r.production_delta_mwh.getOrElse(0L),
      a.prodSeen || r.production_delta_mwh.isDefined,
      a.net + r.consumption_delta_mwh - r.production_delta_mwh.getOrElse(0L),
      a.n + 1,
      a.valid + (if (r.is_valid) 1 else 0),
      a.estimated + (if (r.is_estimated) 1 else 0),
      a.error + (if (r.is_error) 1 else 0),
      a.hasSolar || r.has_solar)
    def merge(a: MeterDayAcc, b: MeterDayAcc): MeterDayAcc = MeterDayAcc(
      a.cons + b.cons, a.prodSum + b.prodSum, a.prodSeen || b.prodSeen,
      a.net + b.net, a.n + b.n, a.valid + b.valid,
      a.estimated + b.estimated, a.error + b.error, a.hasSolar || b.hasSolar)
    def finish(a: MeterDayAcc): MeterDayAcc = a
    def bufferEncoder: Encoder[MeterDayAcc] = Encoders.product[MeterDayAcc]
    def outputEncoder: Encoder[MeterDayAcc] = Encoders.product[MeterDayAcc]
  }

  /** Per-(day, customer) re-aggregation of the per-meter rollups. Inputs
    * are unique per (day, meter) by construction, so counting inputs IS
    * the distinct meter count the untyped mart computes. */
  object CustomerAgg extends Aggregator[MeterDay, CustAcc, CustAcc] {
    def zero: CustAcc = CustAcc(0L, 0L, false, 0L, 0L, 0L, 0L, 0L, 0L, false)
    def reduce(a: CustAcc, m: MeterDay): CustAcc = CustAcc(
      a.cons + m.cons_mwh,
      a.prodSum + m.prod_mwh.getOrElse(0L),
      a.prodSeen || m.prod_mwh.isDefined,
      a.net + m.net_mwh,
      a.meters + 1,
      a.readings + m.reading_count,
      a.valid + m.valid_reading_count,
      a.estimated + m.estimated_reading_count,
      a.error + m.error_reading_count,
      a.hasSolar || m.has_solar)
    def merge(a: CustAcc, b: CustAcc): CustAcc = CustAcc(
      a.cons + b.cons, a.prodSum + b.prodSum, a.prodSeen || b.prodSeen,
      a.net + b.net, a.meters + b.meters, a.readings + b.readings,
      a.valid + b.valid, a.estimated + b.estimated, a.error + b.error,
      a.hasSolar || b.hasSolar)
    def finish(a: CustAcc): CustAcc = a
    def bufferEncoder: Encoder[CustAcc] = Encoders.product[CustAcc]
    def outputEncoder: Encoder[CustAcc] = Encoders.product[CustAcc]
  }

  /** UTC day of a timestamp — epoch-instant arithmetic, identical to
    * `to_date(date_trunc('day', ts))` under the UTC session. */
  private def utcDay(ts: Timestamp): LocalDate =
    ts.toInstant.atOffset(ZoneOffset.UTC).toLocalDate

  // ---- the typed mart ----

  def factCustomerBillingDailyTyped(
      stg: DataFrame, meters: DataFrame, customers: DataFrame,
      tariff: DataFrame): DataFrame = {
    val spark = stg.sparkSession
    import spark.implicits._

    val readings: Dataset[StgReading] = stg
      .select(col("reading_timestamp"), col("meter_id"),
        col("consumption_delta_mwh"), col("production_delta_mwh"),
        col("is_valid"), col("is_estimated"), col("is_error"), col("has_solar"))
      .as[StgReading]

    val perMeterDay: Dataset[MeterDay] = readings
      .groupByKey(r => DayMeterKey(utcDay(r.reading_timestamp), r.meter_id))
      .agg(DailyMeterAgg.toColumn)
      .map { case (k, a) =>
        MeterDay(k.billing_date, k.meter_id, a.cons,
          if (a.prodSeen) Some(a.prodSum) else None,
          a.net, a.n, a.valid, a.estimated, a.error, a.hasSolar)
      }

    val metersDs = meters.select(col("meter_id"), col("customer_id")).as[MeterDim]
    val customersDs = customers.select(col("customer_id"), col("customer_name")).as[CustomerDim]
    val tariffDs = tariff.select(col("base_rate_per_kwh")).as[TariffRow]

    val withMeterDim: Dataset[(MeterDay, MeterDim)] = perMeterDay
      .joinWith(broadcast(metersDs), perMeterDay("meter_id") === metersDs("meter_id"))
    val withCustomer: Dataset[(MeterDay, CustomerDim)] = withMeterDim
      .joinWith(broadcast(customersDs),
        withMeterDim("_2.customer_id") === customersDs("customer_id"))
      .map { case ((day, _), cust) => (day, cust) }

    val perCustomer: Dataset[(CustKey, CustAcc)] = withCustomer
      .groupByKey { case (day, cust) =>
        CustKey(day.billing_date, cust.customer_id, cust.customer_name)
      }
      .mapValues(_._1)
      .agg(CustomerAgg.toColumn)

    perCustomer
      .joinWith(broadcast(tariffDs), lit(true))
      .map { case ((k, a), t) =>
        val rate = t.base_rate_per_kwh.doubleValue
        val consKwh = a.cons / 1000000.0
        val prodKwh = if (a.prodSeen) Some(a.prodSum / 1000000.0) else None
        val netKwh = a.net / 1000000.0
        BillingDaily(
          k.billing_date, k.customer_id, k.customer_name,
          consKwh, prodKwh, netKwh,
          consKwh * rate, prodKwh.map(_ * rate), netKwh * rate,
          a.meters, a.readings, a.valid, a.estimated, a.error, a.hasSolar,
          if (a.readings > 0) a.valid.toDouble / a.readings.toDouble * 100 else 0.0)
      }
      .toDF()
  }
}
