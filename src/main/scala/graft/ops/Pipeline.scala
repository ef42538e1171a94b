package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Det

/** End-to-end curation pipeline — the capstone composition query.
  *
  * A training-data pipeline is not one operator but a CHAIN: dedup →
  * quality filter → language ID → stable split → reporting. This module
  * declares that chain as a single query composed FROM the already-
  * declared operators (`q_dedup_exact` keepers ⋈ `q_text_quality` ⋈
  * `q_text_langid` + the hash-split rule from [[Sampling]]), so the
  * oracle verifies the composition end to end, not just the stages.
  *
  * Scale notes (100 TB): the chain is three broadcast-or-keyed joins on
  * doc_id over per-doc feature frames, each itself one scan + one keyed
  * aggregation; the final report is a tiny grouped aggregate. Nothing
  * materializes between stages — Catalyst fuses the whole chain into
  * one plan (scan-level column pruning applies across the composition).
  */
object Pipeline {
  type Q = (SparkSession, String) => DataFrame

  private val MinQuality = 0.5
  private val MinTokens = 10L

  private val curate: Q = (s, d) => {
    val keepers = Dedup.queries("q_dedup_exact")(s, d)
      .select(col("keeper").as("doc_id"))
    val quality = Text.queries("q_text_quality")(s, d)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val lang = Text.queries("q_text_langid")(s, d)
      .select(col("doc_id"), col("predicted"))
    keepers.join(quality, "doc_id").join(lang, "doc_id")
      .filter(col("quality") >= MinQuality && col("n_tokens") >= MinTokens)
      .withColumn("split",
        when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
          < "cc", "train").otherwise("test"))
      .groupBy(col("split"), col("predicted").as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        Det.davg(col("quality")).as("avg_quality"))
      .orderBy(col("split").asc, col("lang_pred").asc)
  }

  val queries: Map[String, Q] = Map(
    "q_pipeline_curate" -> curate,
  )

  private def sqlToks = Text.sqlToks

  val oracle: Map[String, String] = Map(
    "q_pipeline_curate" ->
      s"""WITH k AS (
         |  SELECT MIN(doc_id) AS doc_id
         |  FROM documents GROUP BY md5(LOWER(TRIM(text)))),
         |qt AS (
         |  SELECT doc_id, $sqlToks AS toks, n_chars FROM documents),
         |qc AS (
         |  SELECT doc_id,
         |         CAST(LEN(toks) AS BIGINT) AS n_tokens,
         |         CAST(LEN(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |         CAST(LEN(list_filter(toks,
         |           w -> list_contains(['the','a','of','to','and'], w))) AS BIGINT)
         |           AS n_stop
         |  FROM qt),
         |q AS (
         |  SELECT doc_id, n_tokens,
         |         ${Det.sqlR4(
               "CAST(n_distinct AS DOUBLE) / NULLIF(n_tokens, 0) * 0.5 + " +
               "(1.0 - CAST(n_stop AS DOUBLE) / NULLIF(n_tokens, 0)) * 0.3 + " +
               "LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.2")} AS quality
         |  FROM qc),
         |lt AS (SELECT doc_id, list_distinct($sqlToks) AS toks FROM documents),
         |ls AS (SELECT doc_id,
         |       ${Text.sqlLangScores}
         |       FROM lt),
         |lb AS (SELECT *, GREATEST(s_en, s_de, s_es, s_fr, s_zh) AS best FROM ls),
         |l AS (SELECT doc_id, ${Text.sqlPred} AS predicted FROM lb),
         |j AS (
         |  SELECT k.doc_id, q.n_tokens, q.quality, l.predicted,
         |         CASE WHEN SUBSTRING(md5(CAST(k.doc_id AS VARCHAR)), 1, 2) < 'cc'
         |              THEN 'train' ELSE 'test' END AS split
         |  FROM k JOIN q USING (doc_id) JOIN l USING (doc_id)
         |  WHERE q.quality >= $MinQuality AND q.n_tokens >= $MinTokens)
         |SELECT split, predicted AS lang_pred, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |       ${Det.sqlDavg("quality")} AS avg_quality
         |FROM j
         |GROUP BY split, predicted
         |ORDER BY split ASC, lang_pred ASC""".stripMargin,
  )
}
