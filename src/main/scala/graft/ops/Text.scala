package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det
import graft.io.Tables

/** Text-analysis operators for the LLM-data-pipeline surface
  * (SURVEY.md §2.J + driver-mandated extensions: language ID, quality
  * scoring, token counting, document fingerprinting).
  *
  * All tokenization is whitespace split + empty filter (the corpus is
  * pre-normalized lowercase). Everything is built-in expressions —
  * explode is partition-local, counts shuffle keyed partials only.
  *
  * Scale notes (100 TB): wordcount/tf-idf shuffle (doc|word)-keyed
  * partial aggregates — the canonical scalable shape. The tf-idf N and
  * df sides are tiny aggregates (vocab-sized) joined by broadcast, so
  * the token stream is never re-shuffled.
  */
object Text {
  type Q = (SparkSession, String) => DataFrame

  /** Whitespace tokens, trailing-blank filtered (see FIXTURES.md). */
  def tokens(c: Column): Column = filter(split(c, " "), w => length(w) > 0)

  /** Raw (doc_id, word) token stream, shared with [[Dedup]].
    * One-file corpus → one input partition: fan out BEFORE the explode
    * so tokenization parallelizes; pinned count because AQE would size
    * the exchange on pre-explode bytes and coalesce it back to one
    * partition. Keyed by doc_id so groupBy(doc_id, …) downstream is
    * already clustered (subset rule) — no re-shuffle. */
  private[graft] def docTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))

  /** Corpus-wide top-20 tokens. */
  private val wordcount: Q = (s, d) =>
    docTokens(s, d)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)
      .limit(20)

  /** TF-IDF: top term per document by tf · ln(N/df). df and N are
    * vocab-/corpus-sized aggregates broadcast back onto the term
    * frequencies — one shuffle of (doc,word) partials total. */
  private val tfidf: Q = (s, d) => {
    val tf = docTokens(s, d).groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word").asc)
    tf.join(broadcast(df), "word")
      .crossJoin(broadcast(n))
      .withColumn("score",
        Det.r4(col("tf") * log(col("n_docs").cast("double") / col("df"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("word"), col("score"))
      .orderBy(col("doc_id").asc)
  }

  /** Corpus stats per language label. */
  private val langStats: Q = (s, d) =>
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        Det.davg(col("n_chars")).as("avg_chars"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang").asc)

  /** Language-ID heuristic: marker-token overlap per candidate
    * language, argmax with deterministic tie order. The corpus is
    * synthetic (same vocabulary for every lang label), so this
    * demonstrates the operator shape — scores and the argmax are pure
    * integer arithmetic, identical in both engines. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "query"),
    "de" -> Seq("der", "die", "und", "schnell"),
    "es" -> Seq("el", "la", "rapido", "consulta"),
    "fr" -> Seq("le", "la", "vite", "requete"),
    "zh" -> Seq("kuai", "biao", "lie", "hang"))

  private val langId: Q = (s, d) => {
    val base = Tables.documents(s, d)
      .withColumn("toks", array_distinct(tokens(col("text"))))
    val scored = langMarkers.foldLeft(base) { case (df, (l, ms)) =>
      df.withColumn(s"s_$l",
        size(array_intersect(col("toks"), array(ms.map(lit): _*))).cast("long"))
    }
    val best = langMarkers.map(_._1).map(l => col(s"s_$l"))
      .reduce((a, b) => greatest(a, b))
    val pred = langMarkers.foldRight(lit("und"): Column) {
      case ((l, _), acc) =>
        when(col(s"s_$l") === col("best") && col("best") > 0, lit(l))
          .otherwise(acc)
    }
    scored.withColumn("best", best)
      .withColumn("predicted", pred)
      .select(col("doc_id"), col("lang"), col("predicted"),
        (col("predicted") === col("lang")).as("is_match"))
      .orderBy(col("doc_id").asc)
  }

  /** Quality scoring: length/diversity/stopword signals → one score.
    * Integer counts and ratios of exact ints — engine-identical. */
  private val quality: Q = (s, d) => {
    val stop = array(Seq("the", "a", "of", "to", "and").map(lit): _*)
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("n_stop",
        size(filter(col("toks"), w => array_contains(stop, w))).cast("long"))
      .select(col("doc_id"), col("n_chars"), col("n_tokens"), col("n_distinct"),
        Det.r4(col("n_chars").cast("double") / nullif(col("n_tokens"), lit(0L))).as("avg_tok_len"),
        Det.r4(col("n_distinct").cast("double") / nullif(col("n_tokens"), lit(0L))).as("ttr"),
        Det.r4(col("n_stop").cast("double") / nullif(col("n_tokens"), lit(0L))).as("stop_ratio"),
        Det.r4(
          col("n_distinct").cast("double") / nullif(col("n_tokens"), lit(0L)) * 0.5 +
          (lit(1.0) - col("n_stop").cast("double") / nullif(col("n_tokens"), lit(0L))) * 0.3 +
          least(col("n_tokens").cast("double") / 100.0, lit(1.0)) * 0.2)
          .as("quality"))
      .orderBy(col("doc_id").asc)
  }

  /** Token counting: whitespace tokens, alpha-only tokens (regex), and
    * a BPE-rate proxy (ceil(len/4) subwords per token) per source. */
  private val tokenCounts: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("toks"))).as("n_tokens"),
        sum(size(filter(col("toks"), w => w.rlike("^[a-z]+$"))))
          .as("n_alpha_tokens"),
        sum(aggregate(transform(col("toks"),
            w => ceil(length(w).cast("double") / 4.0).cast("long")),
          lit(0L), _ + _)).as("n_subwords"))
      .orderBy(col("source").asc)

  /** Order-sensitive rolling-hash fingerprint: fold
    * h ← (h·31 + tokhash(w)) mod p over the token sequence; tokhash is
    * first/last-char + length arithmetic so both engines compute the
    * identical integer. Duplicate fingerprints = duplicate token
    * sequences (mod collisions). */
  private val fingerprint: Q = (s, d) => {
    val p = 2147483647L
    def tokhash(w: Column): Column =
      (ascii(substring(w, 1, 1)) * 961 +
        ascii(substring(w, -1, 1)) * 31 + length(w)).cast("long")
    val withFp = Tables.documents(s, d)
      .withColumn("fp",
        aggregate(tokens(col("text")), lit(0L),
          (h, w) => pmod(h * 31L + tokhash(w), lit(p))))
    withFp
      .withColumn("n_same",
        count(lit(1)).over(Window.partitionBy(col("fp"))))
      .select(col("doc_id"), col("fp"), col("n_same"))
      .orderBy(col("doc_id").asc)
  }

  val queries: Map[String, Q] = Map(
    "q_text_wordcount"   -> wordcount,
    "q_text_tfidf"       -> tfidf,
    "q_text_lang_stats"  -> langStats,
    "q_text_langid"      -> langId,
    "q_text_quality"     -> quality,
    "q_text_tokens"      -> tokenCounts,
    "q_text_fingerprint" -> fingerprint,
  )

  /** DuckDB twin of [[tokens]] — single source of truth for every
    * module's oracle SQL (tokenization drift between oracles would be
    * misread as engine drift). */
  val sqlToks: String =
    "list_filter(string_split(text, ' '), w -> LENGTH(w) > 0)"

  private[graft] val sqlLangScores = langMarkers.map { case (l, ms) =>
    val lst = ms.map(m => s"'$m'").mkString("[", ", ", "]")
    s"CAST(LEN(list_intersect(toks, $lst)) AS BIGINT) AS s_$l"
  }.mkString(",\n        |       ")

  private[graft] val sqlPred = langMarkers.foldRight("'und'") { case ((l, _), acc) =>
    s"CASE WHEN s_$l = best AND best > 0 THEN '$l' ELSE $acc END"
  }

  /** DuckDB CTE chain `q(doc_id, n_tokens, quality)` — the quality
    * score, factored so [[Pipeline]]'s composed oracle cannot drift from
    * q_text_quality's. */
  private[graft] val sqlQualityCtes: String =
    s"""qt AS (
       |  SELECT doc_id, $sqlToks AS toks FROM documents),
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
       |  FROM qc)""".stripMargin

  /** DuckDB CTE chain `l(doc_id, predicted)` — the language-ID argmax,
    * factored for the same reason. */
  private[graft] val sqlLangIdCtes: String =
    s"""lt AS (SELECT doc_id, list_distinct($sqlToks) AS toks FROM documents),
       |ls AS (SELECT doc_id,
       |       $sqlLangScores
       |       FROM lt),
       |lb AS (SELECT *, GREATEST(s_en, s_de, s_es, s_fr, s_zh) AS best FROM ls),
       |l AS (SELECT doc_id, $sqlPred AS predicted FROM lb)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_text_wordcount" ->
      s"""SELECT word, COUNT(*) AS n
         |FROM (SELECT UNNEST($sqlToks) AS word FROM documents)
         |GROUP BY word
         |ORDER BY n DESC, word ASC
         |LIMIT 20""".stripMargin,
    "q_text_tfidf" ->
      s"""WITH tf AS (
         |  SELECT doc_id, word, COUNT(*) AS tf
         |  FROM (SELECT doc_id, UNNEST($sqlToks) AS word FROM documents)
         |  GROUP BY doc_id, word),
         |df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY word),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |s AS (
         |  SELECT tf.doc_id, tf.word,
         |         ${Det.sqlR4("tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df)")} AS score
         |  FROM tf JOIN df USING (word) CROSS JOIN n),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
         |                ORDER BY score DESC, word ASC) AS rn FROM s)
         |SELECT doc_id, word, score FROM r WHERE rn = 1
         |ORDER BY doc_id ASC""".stripMargin,
    "q_text_lang_stats" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |       ${Det.sqlDavg("n_chars")} AS avg_chars,
         |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |       COUNT(DISTINCT source) AS n_sources
         |FROM documents
         |GROUP BY lang
         |ORDER BY lang ASC""".stripMargin,
    "q_text_langid" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |       list_distinct($sqlToks) AS toks FROM documents),
         |s AS (SELECT doc_id, lang,
         |       $sqlLangScores
         |       FROM t),
         |b AS (SELECT *, GREATEST(s_en, s_de, s_es, s_fr, s_zh) AS best FROM s)
         |SELECT doc_id, lang,
         |       $sqlPred AS predicted,
         |       ($sqlPred) = lang AS is_match
         |FROM b
         |ORDER BY doc_id ASC""".stripMargin,
    "q_text_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, n_chars, $sqlToks AS toks FROM documents),
         |c AS (
         |  SELECT doc_id, n_chars,
         |         CAST(LEN(toks) AS BIGINT) AS n_tokens,
         |         CAST(LEN(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |         CAST(LEN(list_filter(toks,
         |           w -> list_contains(['the','a','of','to','and'], w))) AS BIGINT)
         |           AS n_stop
         |  FROM t)
         |SELECT doc_id, n_chars, n_tokens, n_distinct,
         |       ${Det.sqlR4("CAST(n_chars AS DOUBLE) / NULLIF(n_tokens, 0)")} AS avg_tok_len,
         |       ${Det.sqlR4("CAST(n_distinct AS DOUBLE) / NULLIF(n_tokens, 0)")} AS ttr,
         |       ${Det.sqlR4("CAST(n_stop AS DOUBLE) / NULLIF(n_tokens, 0)")} AS stop_ratio,
         |       ${Det.sqlR4(
               "CAST(n_distinct AS DOUBLE) / NULLIF(n_tokens, 0) * 0.5 + " +
               "(1.0 - CAST(n_stop AS DOUBLE) / NULLIF(n_tokens, 0)) * 0.3 + " +
               "LEAST(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.2")} AS quality
         |FROM c
         |ORDER BY doc_id ASC""".stripMargin,
    "q_text_tokens" ->
      s"""WITH t AS (SELECT source, $sqlToks AS toks FROM documents)
         |SELECT source, COUNT(*) AS n_docs,
         |       CAST(SUM(LEN(toks)) AS BIGINT) AS n_tokens,
         |       CAST(SUM(LEN(list_filter(toks, w -> regexp_matches(w, '^[a-z]+$$'))))
         |         AS BIGINT) AS n_alpha_tokens,
         |       CAST(SUM(list_aggregate(list_transform(toks,
         |         w -> CAST(CEIL(LENGTH(w) / 4.0) AS BIGINT)), 'sum')) AS BIGINT)
         |         AS n_subwords
         |FROM t
         |GROUP BY source
         |ORDER BY source ASC""".stripMargin,
    "q_text_fingerprint" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         list_transform($sqlToks,
         |           w -> CAST(ORD(w[1]) * 961 + ORD(w[-1]) * 31 + LENGTH(w) AS BIGINT))
         |           AS hs
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
         |           (h, x) -> (h * 31 + x) % 2147483647) AS fp
         |  FROM t)
         |SELECT doc_id, fp, COUNT(*) OVER (PARTITION BY fp) AS n_same
         |FROM f
         |ORDER BY doc_id ASC""".stripMargin,
  )
}
