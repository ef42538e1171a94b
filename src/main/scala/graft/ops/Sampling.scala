package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det
import graft.io.Tables

/** Deterministic sampling & split operators for training-data
  * pipelines.
  *
  * `df.sample()` is seed-and-partitioning dependent — unusable when a
  * sample must be reproducible across engines, reruns, and cluster
  * sizes. The reproducible technique is *hash-keyed selection*: a row
  * is in the sample iff a stable content hash of its key falls under a
  * threshold. md5-hex prefixes give an engine-neutral uniform variate
  * (fixed-width lowercase hex compares lexicographically ==
  * numerically), so the same rows are selected everywhere, forever —
  * and membership is O(1) per row with no shuffle at all for the flat
  * sample.
  *
  * The same hash orders rows for stratified per-group quotas and
  * assigns stable train/test splits (a document never migrates between
  * splits when the corpus grows — the property dataset versioning
  * needs).
  */
object Sampling {
  type Q = (SparkSession, String) => DataFrame

  /** md5 hex of a column's string form — the shared uniform variate. */
  private def h(c: Column): Column = md5(c.cast("string").cast("binary"))

  /** ~10% flat sample of documents: md5(doc_id) prefix < 0x1999/0x10000. */
  private val sampleHash: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(substring(h(col("doc_id")), 1, 4) < "1999")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id").asc)

  /** Stratified sample: up to 20 docs per language, chosen by hash
    * order (reproducible quota sampling; one shuffle by stratum). */
  private val sampleStratified: Q = (s, d) => {
    val w = Window.partitionBy(col("lang"))
      .orderBy(h(col("doc_id")).asc, col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"))
      .orderBy(col("lang").asc, col("rn").asc)
  }

  /** Stable ~80/20 train/test assignment (0xcc/0x100 ≈ 0.797), with
    * per-(lang, split) accounting. A row's split never changes as the
    * corpus grows — hash membership, not position. */
  /** The stable train/test assignment rule — single source of truth,
    * shared with [[Pipeline]] (Spark and oracle forms). */
  private[graft] def splitCol(key: Column): Column =
    when(substring(h(key), 1, 2) < "cc", "train").otherwise("test")

  private[graft] def sqlSplit(key: String): String =
    s"CASE WHEN SUBSTRING(md5(CAST($key AS VARCHAR)), 1, 2) < 'cc' " +
      "THEN 'train' ELSE 'test' END"

  private val splitTrainTest: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("split", splitCol(col("doc_id")))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        Det.davg(col("n_chars")).as("avg_chars"))
      .orderBy(col("lang").asc, col("split").asc)

  /** Mixture weights for [[sampleWeighted]]: per-language keep rates as
    * EXACT integer thresholds out of 0x10000 (no float in the
    * membership test — the 4-hex-digit md5 prefix is compared as an
    * integer, so both engines agree bit-for-bit). The values model a
    * training-mixture spec: keep all English, downsample the rest. */
  private[graft] val mixtureThresholds: Seq[(String, Int)] = Seq(
    "en" -> 0x10000, "de" -> 0xc000, "es" -> 0x8000,
    "fr" -> 0x4000, "zh" -> 0x199a)

  /** Domain-weighted sampling (training-data mixing): each language is
    * kept at its mixture rate via hash-keyed membership — rate changes
    * re-use the SAME variate, so raising a rate only ADDS documents
    * (nested samples, the property mixture tuning needs).
    *
    * Scale shape: the weights are an exogenous spec joined by
    * `broadcast` (a mixture table is dozens of rows against a 100 TB
    * corpus); membership is O(1) per row map-side, so the only shuffle
    * is the per-(source, lang) accounting aggregation. */
  private val sampleWeighted: Q = (s, d) => {
    val w = s.createDataFrame(mixtureThresholds).toDF("lang", "thr")
    Tables.documents(s, d)
      .join(broadcast(w), Seq("lang"))
      .withColumn("keep",
        conv(substring(h(col("doc_id")), 1, 4), 16, 10)
          .cast("int") < col("thr"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("realized_rate",
        Det.r4(col("n_kept").cast("double") / col("n_docs")))
      .orderBy(col("source").asc, col("lang").asc)
  }

  /** Temperature exponent for [[mixTemperature]] — α = 1/2, i.e. a
    * language's mixture weight ∝ √count. sqrt is an exactly-rounded
    * IEEE primitive (identical in any engine), and each weight is
    * quantized to 1e-4 integer units BEFORE the cross-group sum, so
    * the normalizing denominator is an exact long — order-free and
    * bit-identical — rather than a float sum whose value depends on
    * accumulation order. */
  private val mixTemperature: Q = (s, d) => {
    val qw = Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_q", Det.qi4(sqrt(col("n_docs").cast("double"))))
    val tot = qw.agg(sum(col("n_docs")).as("n_total"),
      sum(col("w_q")).as("w_total"))
    qw.crossJoin(broadcast(tot))
      .withColumn("nat_share", Det.r4(col("n_docs") / col("n_total")))
      .withColumn("temp_weight",
        Det.r4(col("w_q").cast("double") / col("w_total")))
      .withColumn("target_docs",
        floor(col("w_q").cast("double") / col("w_total") * col("n_total")
          + lit(0.5)).cast("long"))
      .withColumn("boost",
        Det.r4(col("w_q").cast("double") / col("w_total") * col("n_total")
          / col("n_docs")))
      .select(col("lang"), col("n_docs"), col("nat_share"),
        col("temp_weight"), col("target_docs"), col("boost"))
      .orderBy(col("lang").asc)
  }

  val queries: Map[String, Q] = Map(
    "q_sample_hash"       -> sampleHash,
    "q_sample_stratified" -> sampleStratified,
    "q_sample_weighted"   -> sampleWeighted,
    "q_split_train_test"  -> splitTrainTest,
    "q_mix_temperature"   -> mixTemperature,
  )

  val oracle: Map[String, String] = Map(
    "q_sample_hash" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents
        |WHERE SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
        |ORDER BY doc_id ASC""".stripMargin,
    "q_sample_stratified" ->
      """SELECT lang, rn, doc_id, n_chars
        |FROM (SELECT lang, doc_id, n_chars,
        |             ROW_NUMBER() OVER (PARTITION BY lang
        |               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
        |      FROM documents)
        |WHERE rn <= 20
        |ORDER BY lang ASC, rn ASC""".stripMargin,
    "q_sample_weighted" -> {
      val thrCase = mixtureThresholds
        .map { case (l, t) => s"WHEN '$l' THEN $t" }
        .mkString("CASE lang ", " ", " ELSE 0 END")
      // The Spark side inner-joins the mixture table, so a language with
      // no mixture row is OUT of the sample (a mixture spec is a whitelist).
      // Mirror that with an explicit IN filter — without it the oracle
      // would keep unlisted languages at n_kept=0 and the twins would
      // diverge if the fixture's lang domain ever grows.
      val langIn = mixtureThresholds.map { case (l, _) => s"'$l'" }
        .mkString("(", ", ", ")")
      s"""WITH t AS (
         |  SELECT source, lang,
         |         CAST('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 4)
         |              AS INT) < ($thrCase) AS keep
         |  FROM documents
         |  WHERE lang IN $langIn)
         |SELECT source, lang, COUNT(*) AS n_docs,
         |       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       ${Det.sqlR4(
               "CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)" +
               " / COUNT(*)")} AS realized_rate
         |FROM t
         |GROUP BY source, lang
         |ORDER BY source ASC, lang ASC""".stripMargin
    },
    "q_mix_temperature" ->
      s"""WITH c AS (
         |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY lang),
         |q AS (
         |  SELECT lang, n_docs,
         |         ${Det.sqlQi4("SQRT(CAST(n_docs AS DOUBLE))")} AS w_q
         |  FROM c),
         |t AS (
         |  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
         |         CAST(SUM(w_q) AS BIGINT) AS w_total
         |  FROM q)
         |SELECT lang, n_docs,
         |       ${Det.sqlR4("n_docs / n_total")} AS nat_share,
         |       ${Det.sqlR4("w_q / w_total")} AS temp_weight,
         |       CAST(FLOOR(w_q / w_total * n_total + 0.5) AS BIGINT)
         |         AS target_docs,
         |       ${Det.sqlR4("w_q / w_total * n_total / n_docs")} AS boost
         |FROM q CROSS JOIN t
         |ORDER BY lang ASC""".stripMargin,
    "q_split_train_test" ->
      s"""SELECT lang,
         |       ${sqlSplit("doc_id")} AS split,
         |       COUNT(*) AS n_docs,
         |       ${Det.sqlDavg("n_chars")} AS avg_chars
         |FROM documents
         |GROUP BY 1, 2
         |ORDER BY lang ASC, split ASC""".stripMargin,
  )
}
