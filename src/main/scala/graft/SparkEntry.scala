package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator-by-operator harness surface (one entry per
  * SURVEY.md §2 inventory item); `oracleSql` carries the DuckDB-runnable
  * ANSI SQL equivalent for each SQL-expressible entry. Column names match
  * between the two by construction (the driver sorts columns by name and
  * hashes values).
  */
object SparkEntry {

  private def registry: Seq[GraftQuery] =
    ops.Relational.all ++ ops.TimeSeries.all ++ ops.TimeSeriesExt.all ++
      ops.TimeSeriesTk.all ++
      ops.SqlSurface.all ++ ops.Scd.all ++ ops.Spatial.all ++
      meter.MeterPipeline.all ++
      llm.TextAnalysis.all ++ llm.TextPolicy.all ++ llm.TypedDocs.all ++
      llm.Dedup.all ++ llm.SpanDedup.all ++ llm.Similarity.all ++ llm.Multimodal.all ++
      llm.TrainingPipeline.all ++ llm.CorpusSignals.all ++
      llm.Search.all ++ graph.GraphOps.all ++
      streaming.IngestBench.all ++ sources.Formats.all :+
      sources.VecStore.probeQuery :+ sources.VecStore.scaledProbeQuery :+
      sources.PostingStore.probeQuery :+
      sources.PostingLog.maintainedProbeQuery :+
      sources.PostingLog.bm25MaintainedQuery :+
      sources.PostingLog.phraseMaintainedQuery :+
      sources.PostingLog.proximityMaintainedQuery :+
      sources.PostingLog.hybridMaintainedQuery :+
      sources.PostingLog.hybridMultiQuery :+
      sources.PostingLog.eraseProbeQuery :+
      sources.PostingLog.expireProbeQuery :+
      llm.DedupLog.expireClustersQuery :+
      sources.ErasureStore.eraseQuery :+ sources.MeterBronze.eraseQuery :+
      sources.SketchStore.probeQuery :+ sources.SketchStore.overlapQuery :+
      sources.SketchStore.rollupQuery :+
      sources.SketchStore.compactedProbeQuery :+
      sources.HistStore.probeQuery :+ sources.HistStore.rollupQuery :+
      sources.HistStore.compactedProbeQuery :+
      sources.HeavyHitterStore.probeQuery :+
      sources.HeavyHitterStore.maintainedProbeQuery :+
      sources.VecStoreLog.maintainedProbeQuery :+
      sources.VecStoreLog.multiQueryProbeQuery :+
      sources.VecStoreLog.liveDeltaProbeQuery :+
      sources.VecStoreLog.eraseProbeQuery :+
      sources.VecStoreLog.expireProbeQuery :+
      sources.IvfPqLog.maintainedProbeQuery :+
      sources.IvfPqLog.eraseProbeQuery :+
      sources.IvfPqLog.expireProbeQuery :+
      llm.DedupLog.incrementalClustersQuery :+
      llm.DedupLog.incrementalEraseQuery :+
      sources.CorpusRtbf.eraseEverywhereQuery :+
      sources.CorpusRtbf.expireEverywhereQuery

  /** Flagship: the reference's billing mart end-to-end (generate → LAG
    * staging → two-level agg + dim joins + tariff). Driver smoke-checks
    * rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("meter_billing_daily")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
