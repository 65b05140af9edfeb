package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical table layout (SURVEY.md §1.3-§1.4, §4 O1/O2, §2.1 S8/S11/S12):
  * the Spark analogue of TimescaleDB's 1-day hypertable chunks with
  * columnar compression segmented by meter and ordered by time
  * (`01_create_schema.sql:98-101,126-136`).
  *
  *  - day chunks        → `partitionBy(reading_date)` directories: Catalyst
  *    prunes partitions for time predicates (no custom rule needed — O1)
  *  - segmentby/orderby → `repartition(reading_date)` +
  *    `sortWithinPartitions(meter_id, reading_timestamp)`: each file is
  *    clustered by meter then time, so parquet min/max row-group stats
  *    skip on meter_id, and the downstream LAG window reads pre-sorted
  *    runs (O2)
  *  - mart full refresh → `mode(overwrite)` = dbt `CREATE TABLE AS`
  *    (S8, `dbt_project.yml:29-33`); btree indexes have no analogue —
  *    partitioning + clustering + pushdown replace them (O3-O5)
  *
  * At 100 TB: one shuffle on the partition column per write (unavoidable
  * to get one writer task per date chunk), everything else narrow.
  */
object Store {

  /** Bronze raw_meter_readings: date-chunked, meter/time-clustered. */
  def writeBronze(readings: DataFrame, dir: String): Unit =
    readings
      .withColumn("reading_date", to_date(col("reading_timestamp")))
      .repartition(col("reading_date"))
      .sortWithinPartitions(col("meter_id"), col("reading_timestamp"))
      .write.mode("overwrite").partitionBy("reading_date").parquet(dir)

  def readBronze(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** One day's chunk — the predicate prunes to a single partition
    * directory (verify: explain shows PartitionFilters, one partition). */
  def readDay(spark: SparkSession, dir: String, day: String): DataFrame =
    readBronze(spark, dir).filter(col("reading_date") === lit(day).cast("date"))

  /** Retention enforcement — the TimescaleDB `drop_chunks` / Kafka 7-day
    * topic-retention analogue (docker-compose.yml:36-42): whole
    * `reading_date=` partition directories strictly older than `cutoff`
    * are deleted. Partition-level deletes only — no scan, no rewrite;
    * surviving chunks keep their files byte-identical. Returns the dropped
    * chunk dates (for the maintenance job's audit log). */
  def dropChunksOlderThan(dir: String, cutoff: String): Seq[String] = {
    val cutoffDate = java.time.LocalDate.parse(cutoff)
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(root)) return Seq.empty
    val prefix = "reading_date="
    val dropped = java.nio.file.Files.list(root).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => p.getFileName.toString.startsWith(prefix))
      .filter { p =>
        java.time.LocalDate.parse(p.getFileName.toString.stripPrefix(prefix))
          .isBefore(cutoffDate)
      }
    dropped.foreach { p =>
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    }
    dropped.map(_.getFileName.toString.stripPrefix(prefix)).sorted
  }

  /** Mart materialization: full refresh, chunked by its date/hour grain. */
  def writeMart(mart: DataFrame, dir: String, partitionCol: String): Unit =
    mart
      .repartition(col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol).parquet(dir)

  /** Chunk compaction — the small-file repair for a streaming-ingested
    * bronze table (micro-batch appends leave one file per batch per day;
    * thousands of tiny files kill scan planning and HDFS/S3 metadata at
    * 100 TB). Rewrites ONE day chunk to `targetFiles` meter/time-clustered
    * files via dynamic partition overwrite; every other chunk's files are
    * untouched. Run from a maintenance job on closed (past-watermark)
    * days. */
  def compactChunk(spark: SparkSession, dir: String, day: String,
      targetFiles: Int = 1): Unit = {
    // localCheckpoint materializes the chunk before the write: Spark
    // (correctly) refuses to overwrite a path still present in the plan.
    // reading_date leads the sort so the writer's required partition-column
    // ordering is already satisfied — FileFormatWriter skips its own
    // (non-stable) sort and the meter/time clustering survives the write.
    val chunk = readDay(spark, dir, day)
      .localCheckpoint()
      .repartition(targetFiles)
      .sortWithinPartitions(col("reading_date"), col("meter_id"), col("reading_timestamp"))
    // per-WRITER dynamic overwrite (r15): the previous set/restore of the
    // session-wide conf raced concurrent store maintenance — an
    // interleaved restore could flip a sibling drive's in-flight
    // overwrite to STATIC semantics (whole-root delete). The writer
    // option needs no mutation and no restore.
    chunk.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("reading_date").parquet(dir)
  }

  /** Incremental mart refresh (the dbt `materialized='incremental'`
    * pattern the reference doesn't have — it full-refreshes both marts on
    * every `dbt run`, README.md:119): recompute ONLY the partitions
    * present in `updatedSlice` and overwrite exactly those directories,
    * leaving every other chunk untouched. `partitionOverwriteMode=dynamic`
    * makes `mode(overwrite)` replace just the partitions the write
    * produces — at 100 TB a daily refresh rewrites one day, not the mart.
    * The mode rides on the WRITER (never the session conf — see
    * [[refreshMartPartitionsBy]]). */
  def refreshMartPartitions(
      updatedSlice: DataFrame, dir: String, partitionCol: String): Unit =
    refreshMartPartitionsBy(updatedSlice, dir, Seq(partitionCol))

  /** [[refreshMartPartitions]] for composite partitioning (e.g. the
    * calendar-chunked stores' (chunk_date, bucket) trees): dynamic
    * overwrite of exactly the composite partitions present in the slice. */
  def refreshMartPartitionsBy(
      updatedSlice: DataFrame, dir: String, partitionCols: Seq[String]): Unit =
    // per-WRITER dynamic overwrite (r15): setting the session-wide conf
    // and restoring it raced concurrent per-surface maintenance drives
    // (CorpusRtbf overlaps them) — a drive whose write planned while a
    // sibling's finally-restore flipped the conf back to STATIC would
    // delete the whole table root instead of its own partitions. The
    // writer-level option is consulted by the insert command directly,
    // mutates nothing, and needs no restore.
    updatedSlice
      .repartition(partitionCols.map(col): _*)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*).parquet(dir)
}
