package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming version of the hourly grid-load mart (SURVEY.md §2.8 ST7
  * extension): instead of the reference's full-refresh batch rebuild
  * (`dbt run` → CREATE TABLE AS), the mart maintains itself incrementally
  * on the delta stream — watermarked 1-hour tumbling windows, stream-static
  * broadcast joins against the meter/zone dims, append-mode emission of
  * each closed hour.
  *
  * Differences from the batch mart, dictated by streaming semantics:
  *  - `active_meter_count` is approx_count_distinct (exact distinct needs
  *    the whole window's rows held in state; HLL state is constant-size)
  *  - rows emit once per (hour, zone) when the watermark passes the window
  *    end — late readings beyond the watermark are dropped (the reference
  *    has no late-data story at all, README.md:134)
  */
object StreamingMarts {

  /** @param deltas streaming per-reading deltas ([[Ingest.streamingDeltas]]
    *               output or equivalent) with reading_timestamp, meter_id,
    *               consumption_delta_mwh, production_delta_mwh
    * @param meters static dim (meter_id, grid_zone_id)
    * @param zones  static dim (grid_zone_id, zone_name, zone_type,
    *               max_capacity_megawatts) */
  def hourlyGridLoad(
      deltas: DataFrame, meters: DataFrame, zones: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    deltas
      .withWatermark("reading_timestamp", watermark)
      .join(broadcast(meters.select(col("meter_id"), col("grid_zone_id"))), Seq("meter_id"))
      .join(broadcast(zones.select(
        col("grid_zone_id"), col("zone_name"), col("zone_type"),
        col("max_capacity_megawatts"))), Seq("grid_zone_id"))
      .groupBy(
        window(col("reading_timestamp"), "1 hour").as("load_window"),
        col("grid_zone_id"), col("zone_name"), col("zone_type"),
        col("max_capacity_megawatts"))
      .agg(
        (sum(col("consumption_delta_mwh")) / 1000000.0).as("total_consumption_kwh"),
        (sum(col("consumption_delta_mwh") - coalesce(col("production_delta_mwh"), lit(0L)))
          / 1000000.0).as("total_net_consumption_kwh"),
        approx_count_distinct(col("meter_id")).as("active_meter_count"),
        count(lit(1)).as("total_reading_count"))
      .select(
        col("load_window.start").as("load_hour"),
        col("grid_zone_id"), col("zone_name"), col("zone_type"),
        col("max_capacity_megawatts"),
        col("total_consumption_kwh"), col("total_net_consumption_kwh"),
        (col("total_net_consumption_kwh") / 1000.0).as("total_net_consumption_mwh"),
        col("active_meter_count"), col("total_reading_count"))
}
