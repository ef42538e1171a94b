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
      .withColumn("split", Sampling.splitCol(col("doc_id")))
      .groupBy(col("split"), col("predicted").as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        Det.davg(col("quality")).as("avg_quality"))
      .orderBy(col("split").asc, col("lang_pred").asc)
  }

  /** The curation chain with RANK-BASED keeper selection — the keeper
    * signal ([[Dedup]]'s PageRank centrality over the stored near-dup
    * graph) consumed by the declared action: instead of min-id
    * exact-hash keepers, each NEAR-dup cluster contributes its
    * argmax-PageRank member (q_dedup_keepers_rank), and only those
    * canonical copies flow through the quality → language → split →
    * report chain. Near-dup families are collapsed before the split,
    * so train/test leakage through near-copies is structurally gone —
    * the keeper set has at most one member per cluster.
    *
    * Plan: the keeper frame reads the STORED label table + five
    * pagerank rounds over the STORED pair table (nothing re-verifies
    * signatures), then the same three doc-keyed joins as
    * [[curate]]. The oracle recomputes CC + the unrolled PageRank
    * rounds + keeper argmax + quality + langid in one statement, so
    * the driver hash-compare certifies the full composition. */
  private val curateRank: Q = (s, d) => {
    val keepers = Dedup.queries("q_dedup_keepers_rank")(s, d)
      .select(col("keeper_id").as("doc_id"))
    val quality = Text.queries("q_text_quality")(s, d)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val lang = Text.queries("q_text_langid")(s, d)
      .select(col("doc_id"), col("predicted"))
    keepers.join(quality, "doc_id").join(lang, "doc_id")
      .filter(col("quality") >= MinQuality && col("n_tokens") >= MinTokens)
      .withColumn("split", Sampling.splitCol(col("doc_id")))
      .groupBy(col("split"), col("predicted").as("lang_pred"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        Det.davg(col("quality")).as("avg_quality"))
      .orderBy(col("split").asc, col("lang_pred").asc)
  }

  val queries: Map[String, Q] = Map(
    "q_pipeline_curate" -> curate,
    "q_pipeline_curate_rank" -> curateRank,
  )

  val oracle: Map[String, String] = Map(
    "q_pipeline_curate" ->
      s"""WITH k AS (
         |  SELECT MIN(doc_id) AS doc_id
         |  FROM documents GROUP BY md5(LOWER(TRIM(text)))),
         |${Text.sqlQualityCtes},
         |${Text.sqlLangIdCtes},
         |j AS (
         |  SELECT k.doc_id, q.n_tokens, q.quality, l.predicted,
         |         ${Sampling.sqlSplit("k.doc_id")} AS split
         |  FROM k JOIN q USING (doc_id) JOIN l USING (doc_id)
         |  WHERE q.quality >= $MinQuality AND q.n_tokens >= $MinTokens)
         |SELECT split, predicted AS lang_pred, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |       ${Det.sqlDavg("quality")} AS avg_quality
         |FROM j
         |GROUP BY split, predicted
         |ORDER BY split ASC, lang_pred ASC""".stripMargin,
    // the full composition in one statement: signature pairs → CC →
    // unrolled PageRank → per-cluster argmax keeper → quality/langid →
    // split/report; CTE names are collision-free by construction
    // (sig/bands/cand/v | ed/cc/lab | pe/dg/rN | qc/q | li_*/l)
    "q_pipeline_curate_rank" ->
      s"""${Dedup.sqlMinhashEstCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |${Dedup.sqlCcCtes},
         |${Dedup.sqlPagerankCtes},
         |kr AS (
         |  SELECT doc_id FROM (
         |    SELECT lab.doc_id,
         |           ROW_NUMBER() OVER (PARTITION BY lab.cluster_id
         |             ORDER BY r.rank_q DESC, lab.doc_id ASC) AS rn
         |    FROM lab JOIN r${Dedup.PrRounds} r ON r.doc_id = lab.doc_id)
         |  WHERE rn = 1),
         |${Text.sqlQualityCtes},
         |${Text.sqlLangIdCtes},
         |j AS (
         |  SELECT kr.doc_id, q.n_tokens, q.quality, l.predicted,
         |         ${Sampling.sqlSplit("kr.doc_id")} AS split
         |  FROM kr JOIN q USING (doc_id) JOIN l USING (doc_id)
         |  WHERE q.quality >= $MinQuality AND q.n_tokens >= $MinTokens)
         |SELECT split, predicted AS lang_pred, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |       ${Det.sqlDavg("quality")} AS avg_quality
         |FROM j
         |GROUP BY split, predicted
         |ORDER BY split ASC, lang_pred ASC""".stripMargin,
  )
}
