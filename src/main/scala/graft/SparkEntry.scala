package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator family:
  *   - graft.operators.RelationalQueries — SURVEY §2.4/§2.5 SQL inventory
  *   - graft.operators.{Dedup, Similarity, TextAnalysis, Multimodal} —
  *     large-scale training-data pipeline extensions (SURVEY §7.2 item 8)
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The end-to-end corpus cleaning pipeline (quality gate → dedup →
    * per-language stats) — the engine's reason to exist in one plan.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Pipeline.pp01CorpusStats(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.RelationalQueries.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.TextAnalysis.queries ++
      operators.Multimodal.queries ++
      operators.Skew.queries ++
      operators.Graph.queries ++
      operators.JoinOps.queries ++
      operators.Pipeline.queries ++
      operators.Curation.queries ++
      streaming.EventsStreaming.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    operators.RelationalQueries.oracleSql ++
      operators.Dedup.oracleSql ++
      operators.Similarity.oracleSql ++
      operators.TextAnalysis.oracleSql ++
      operators.Multimodal.oracleSql ++
      operators.Skew.oracleSql ++
      operators.Graph.oracleSql ++
      operators.JoinOps.oracleSql ++
      operators.Pipeline.oracleSql ++
      operators.Curation.oracleSql ++
      streaming.EventsStreaming.oracleSql
}
