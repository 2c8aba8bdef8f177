package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** The flagship end-to-end shape: a training-data CLEANING PIPELINE
  * composed from the operator families — quality gate (tx02 rules) →
  * exact dedup on content fingerprint (dd02 shape) → per-language corpus
  * statistics. One scan, one dedup shuffle on the 128-bit digest, one
  * aggregation shuffle on lang; every stage is the 100 TB formulation
  * (no text on any exchange after the first projection... the digest and
  * the counters ride the shuffles).
  *
  * This is what "a user of the reference could switch" looks like in
  * practice: the reference ran SELECTs over one snapshot; a pipeline
  * user chains the same declarative operators over a corpus and gets
  * Catalyst's plan (pushdown, partial aggregation, AQE) for free.
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  /** pp01: quality-gated, deduplicated per-language corpus stats. */
  val pp01CorpusStats: Q = (s, d) => {
    val toks = length(col("text")) -
      length(regexp_replace(col("text"), " ", "")) + 1
    val gated = t(s, d, "documents")
      .withColumn("n_tokens", toks.cast("bigint"))
      .filter(col("n_tokens") >= 10 && col("n_chars") >= 50)
    val deduped = gated
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"),
        // min, not first: deterministic under any partitioning (per-fp
        // values are unique anyway — identical text ⇒ identical stats)
        min(col("lang")).as("lang"),
        min(col("n_tokens")).as("n_tokens"),
        min(col("n_chars")).as("n_chars"))
    deduped
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        round(avg("n_tokens"), 2).as("avg_tokens"),
        round(avg("n_chars"), 2).as("avg_chars"))
      .orderBy("lang")
  }

  val queries: Map[String, Q] = Map("pp01_corpus_pipeline" -> pp01CorpusStats)

  val oracleSql: Map[String, String] = Map(
    "pp01_corpus_pipeline" ->
      """WITH gated AS (
        |  SELECT doc_id, lang, n_chars,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        |      AS n_tokens,
        |    md5(text) AS fp
        |  FROM documents
        |  WHERE length(text) - length(replace(text, ' ', '')) + 1 >= 10
        |    AND n_chars >= 50),
        |deduped AS (
        |  SELECT fp, min(doc_id) AS doc_id,
        |    min(lang) AS lang, min(n_tokens) AS n_tokens,
        |    min(n_chars) AS n_chars
        |  FROM gated GROUP BY fp)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  round(avg(n_tokens), 2) AS avg_tokens,
        |  round(avg(n_chars), 2) AS avg_chars
        |FROM deduped GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
