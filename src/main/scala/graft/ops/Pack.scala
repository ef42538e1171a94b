package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det
import graft.io.Tables

/** Sequence packing for LLM pretraining: concatenate the corpus (in a
  * deterministic total order) into one virtual token stream and cut it
  * into fixed-length training sequences ("chunks").
  *
  * The packing map is pure arithmetic over each document's EXCLUSIVE
  * global prefix sum of token counts: a doc whose tokens start at
  * global offset `o` and span `t` tokens occupies chunks
  * `o div L .. (o+t-1) div L`. The only nontrivial part at 100 TB is
  * the prefix sum itself — naively that is one global ordered window,
  * i.e. the whole corpus sorted on a single partition. This plan
  * computes it two-level, the same shape as [[Windows]]' ntile rewrite
  * and the late-data watermark prefix in [[StreamingOps]]:
  *
  *  1. one tiny aggregate gets the doc_id range; each row's range
  *     bucket is assigned MAP-SIDE by integer arithmetic (contiguous
  *     in doc_id order, so bucket boundaries respect the total order);
  *  2. a bucket-partitioned ordered window produces intra-bucket
  *     exclusive prefix sums (each partition ≈ n/Buckets rows — at
  *     cluster scale raise [[PackBuckets]] with the corpus; balance
  *     affects only skew, never correctness);
  *  3. per-bucket totals (≤ Buckets rows) become exclusive bucket
  *     offsets via a tiny triangle self-join, broadcast back:
  *     offset = bucket offset + intra-bucket prefix.
  *
  * Chunk assignment is then map-side integer div/mod — no further
  * shuffle. The per-chunk view ([[packChunks]]) explodes each doc's
  * (usually 1-element) chunk range and re-aggregates keyed by chunk:
  * one corpus-linear shuffle on a high-cardinality key.
  *
  * Token counts share [[Text.tokens]] / `Text.sqlToks` with the rest
  * of the text surface, so "token" means the same thing in every
  * declared query. The DuckDB oracle computes the same prefix with a
  * plain SQL window — the two formulations agreeing IS the test that
  * the distributed decomposition is exact.
  */
object Pack {
  type Q = (SparkSession, String) => DataFrame

  /** Tokens per packed training sequence. */
  private[graft] val ChunkLen = 256L

  /** Prefix-sum fan-out; scale with the corpus (buckets ≫ cores). */
  private[graft] val PackBuckets = 32

  /** Per-doc token counts with the global exclusive prefix sum
    * (`tok_offset`) and the chunk span, in doc_id order. */
  private[graft] def packed(s: SparkSession, d: String): DataFrame =
    packedFrom(Tables.documents(s, d)
      .select(col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens")))

  /** The prefix-sum/chunk-span pipeline over ANY `(doc_id, n_tokens)`
    * counting — whitespace words ([[packed]]) or trained subword units
    * ([[packedBpe]]); the unit changes, the decomposition doesn't. */
  private[graft] def packedFrom(c: DataFrame): DataFrame = {
    val rng = c.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
    val b = c.crossJoin(broadcast(rng))
      .withColumn("bucket",
        ((col("doc_id") - col("lo")) * PackBuckets
          / (col("hi") - col("lo") + 1)).cast("int"))
      .drop("lo", "hi")
    val local = b.withColumn("lp",
      coalesce(
        sum(col("n_tokens")).over(
          Window.partitionBy(col("bucket")).orderBy(col("doc_id").asc)
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    // Exclusive bucket offsets: triangle self-join over ≤ Buckets rows
    // (windowless by design — see the ntile precedent). Totals derive
    // from the WINDOWED stream (last exclusive prefix + its own count:
    // lp+n_tokens is monotone, so its max is the bucket sum) rather
    // than from `b` — the branch then shares the compact
    // (doc_id, n_tokens, bucket) exchange via ReusedExchange instead
    // of re-reading and re-tokenizing the text side of the corpus, the
    // difference between shuffling ~24 bytes/row twice and scanning
    // ~KB/row of text twice at 100 TB.
    val stats = local.groupBy(col("bucket"))
      .agg(max(col("lp") + col("n_tokens")).as("bt"))
    val offs = stats.as("a")
      .join(stats.as("b"), col("b.bucket") < col("a.bucket"), "left")
      .groupBy(col("a.bucket").as("bucket"))
      .agg(coalesce(sum(col("b.bt")), lit(0L)).as("off"))
    local.join(broadcast(offs), "bucket")
      .withColumn("tok_offset", col("off") + col("lp"))
      // A 0-token doc still "sits at" its offset's chunk (span 1 cell).
      .withColumn("first_chunk", expr(s"tok_offset div $ChunkLen"))
      .withColumn("last_chunk",
        expr(s"(tok_offset + greatest(n_tokens, 1L) - 1L) div $ChunkLen"))
      .select(col("doc_id"), col("n_tokens"), col("tok_offset"),
        col("first_chunk"), col("last_chunk"))
  }

  /** Per-document packing map: offset into the concatenated token
    * stream and the chunk span it occupies. */
  private val packSequences: Q = (s, d) =>
    packed(s, d)
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
      .orderBy(col("doc_id").asc)

  /** [[packed]] with budgets counted in TRAINED BPE units
    * ([[Text.bpePieces]] — the true 8-round trained merges, replacing
    * the closed-form subword proxy this key budgeted by before round
    * 15) instead of whitespace words — the number a real pretraining
    * pipeline packs by, since the model consumes subword tokens, not
    * words. Same two-level prefix decomposition; only the per-doc
    * counting changes (empty docs keep their zero-count row so every
    * doc still gets an offset). The oracle recomputes the BPE
    * training AND the textbook single-window prefix, so the hash
    * match proves decomposition-exactness over the trained
    * segmentation. */
  private[graft] def packedBpe(s: SparkSession, d: String): DataFrame =
    packedFrom(Tables.documents(s, d).select(col("doc_id"))
      .join(Text.bpePieces(s, d)
        .groupBy(col("doc_id"))
        .agg(sum(size(col("pieces"))).cast("long").as("n_tokens")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens")))

  private val packSequencesBpe: Q = (s, d) =>
    packedBpe(s, d)
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
      .orderBy(col("doc_id").asc)

  /** Output fan-out for shard writing. */
  private[graft] val NShards = 8L

  /** Balanced shard assignment — the "write N output files of ~equal
    * token mass" step at the end of a curation pipeline (shard skew
    * directly skews downstream dataloader throughput). Deterministic
    * proportional rule over the SAME global prefix sum as the packing
    * family: a doc starting at token offset `o` of a `T`-token corpus
    * lands in shard `(o·N) div T` (clamped for trailing zero-token
    * docs sitting exactly at offset T). Docs are contiguous in
    * doc_id order within a shard, and every shard's token mass is
    * within one document of T/N — no bin-packing search, no extra
    * shuffle: after [[packedFrom]]'s two-level prefix (its only wide
    * exchanges), assignment is one broadcast scalar + map-side
    * integer arithmetic, then an N-row roll-up. A shard is empty only
    * when a single doc spans multiple shard widths (then no start
    * offset lands in it) — the per-shard report is exactly what a
    * writer would use to decide N. */
  private val packShards: Q = (s, d) => {
    val p = packed(s, d)
    // greatest(·, 1): a zero-token corpus would otherwise make the
    // div NULL here but a division-by-zero ERROR in DuckDB — with the
    // guard both engines agree (every offset is 0 → everything lands
    // in shard 0, balance 0), identical guard in the oracle.
    val tot = p.agg(greatest(sum(col("n_tokens")), lit(1L)).as("t_total"))
    p.crossJoin(broadcast(tot))
      .withColumn("shard",
        least(lit(NShards - 1L), expr(s"(tok_offset * $NShards) div t_total")))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        max(col("t_total")).as("t_total"))
      .withColumn("balance",
        Det.r4(col("shard_tokens").cast("double") * lit(NShards.toDouble)
          / col("t_total")))
      .select(col("shard"), col("n_docs"), col("shard_tokens"),
        col("min_doc"), col("max_doc"), col("balance"))
      .orderBy(col("shard").asc)
  }

  /** Per-chunk occupancy: how many docs each training sequence draws
    * from, how many of those straddle a boundary, and its fill. */
  private val packChunks: Q = (s, d) =>
    packed(s, d)
      .select(col("doc_id"), col("n_tokens"), col("tok_offset"),
        col("first_chunk"), col("last_chunk"),
        explode(expr("sequence(first_chunk, last_chunk)")).as("chunk"))
      .withColumn("tok_in",
        least(expr(s"(chunk + 1) * $ChunkLen"), col("tok_offset") + col("n_tokens"))
          - greatest(expr(s"chunk * $ChunkLen"), col("tok_offset")))
      .groupBy(col("chunk"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("last_chunk") > col("first_chunk"), 1L).otherwise(0L))
          .as("n_split_docs"),
        sum(col("tok_in")).as("chunk_tokens"))
      .withColumn("fill_ratio",
        Det.r4(col("chunk_tokens").cast("double") / lit(ChunkLen.toDouble)))
      .select(col("chunk"), col("n_docs"), col("n_split_docs"),
        col("chunk_tokens"), col("fill_ratio"))
      .orderBy(col("chunk").asc)

  val queries: Map[String, Q] = Map(
    "q_pack_sequences" -> packSequences,
    "q_pack_sequences_bpe" -> packSequencesBpe,
    "q_pack_chunks"    -> packChunks,
    "q_pack_shards"    -> packShards,
  )

  /** Shared oracle CTE: token counts → SQL-window exclusive prefix →
    * chunk span. The oracle uses the textbook single-window form — the
    * hash match against the two-level distributed plan is exactly the
    * decomposition-correctness proof. */
  private val sqlPacked: String =
    s"""t AS (
       |  SELECT doc_id, CAST(LEN(${Text.sqlToks}) AS BIGINT) AS n_tokens
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, n_tokens,
       |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ASC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS BIGINT) AS tok_offset
       |  FROM t),
       |sp AS (
       |  SELECT doc_id, n_tokens, tok_offset,
       |         tok_offset // $ChunkLen AS first_chunk,
       |         (tok_offset + GREATEST(n_tokens, 1) - 1) // $ChunkLen
       |           AS last_chunk
       |  FROM p)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_pack_sequences" ->
      s"""WITH $sqlPacked
         |SELECT doc_id, n_tokens, tok_offset, first_chunk, last_chunk,
         |       last_chunk - first_chunk + 1 AS n_chunks
         |FROM sp
         |ORDER BY doc_id ASC""".stripMargin,
    // BPE-unit packing: the trained-merge piece counts feed the SAME
    // textbook window — one oracle lineage proves the 8-round
    // training, the counting, and the prefix decomposition together
    "q_pack_sequences_bpe" ->
      s"""WITH ${Text.sqlBpeCtes},
         |bwc AS (
         |  SELECT doc_id, CAST(SUM(LEN(pieces)) AS BIGINT) AS n_tokens
         |  FROM bseg GROUP BY doc_id),
         |t2 AS (
         |  SELECT d.doc_id, COALESCE(bwc.n_tokens, 0) AS n_tokens
         |  FROM documents d LEFT JOIN bwc ON bwc.doc_id = d.doc_id),
         |p2 AS (
         |  SELECT doc_id, n_tokens,
         |         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id ASC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS tok_offset
         |  FROM t2)
         |SELECT doc_id, n_tokens, tok_offset,
         |       tok_offset // $ChunkLen AS first_chunk,
         |       (tok_offset + GREATEST(n_tokens, 1) - 1) // $ChunkLen
         |         AS last_chunk,
         |       (tok_offset + GREATEST(n_tokens, 1) - 1) // $ChunkLen
         |         - tok_offset // $ChunkLen + 1 AS n_chunks
         |FROM p2
         |ORDER BY doc_id ASC""".stripMargin,
    "q_pack_shards" ->
      s"""WITH $sqlPacked,
         |tt AS (SELECT GREATEST(CAST(SUM(n_tokens) AS BIGINT), 1)
         |         AS t_total FROM sp),
         |a AS (
         |  SELECT sp.*, t_total,
         |         CAST(LEAST(${NShards - 1}, (tok_offset * $NShards) // t_total)
         |           AS BIGINT) AS shard
         |  FROM sp CROSS JOIN tt),
         |g AS (
         |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |         CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
         |         MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
         |         MAX(t_total) AS t_total
         |  FROM a GROUP BY shard)
         |SELECT shard, n_docs, shard_tokens, min_doc, max_doc,
         |       ${Det.sqlR4(
             s"CAST(shard_tokens AS DOUBLE) * $NShards / t_total")} AS balance
         |FROM g
         |ORDER BY shard ASC""".stripMargin,
    "q_pack_chunks" ->
      s"""WITH $sqlPacked,
         |e AS (
         |  SELECT doc_id, n_tokens, tok_offset, first_chunk, last_chunk,
         |         UNNEST(generate_series(first_chunk, last_chunk)) AS chunk
         |  FROM sp)
         |SELECT chunk,
         |       CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN last_chunk > first_chunk THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_split_docs,
         |       CAST(SUM(LEAST((chunk + 1) * $ChunkLen, tok_offset + n_tokens)
         |              - GREATEST(chunk * $ChunkLen, tok_offset))
         |         AS BIGINT) AS chunk_tokens,
         |       ${Det.sqlR4(
               s"CAST(SUM(LEAST((chunk + 1) * $ChunkLen, tok_offset + n_tokens)" +
               s" - GREATEST(chunk * $ChunkLen, tok_offset)) AS DOUBLE) / $ChunkLen")}
         |         AS fill_ratio
         |FROM e
         |GROUP BY chunk
         |ORDER BY chunk ASC""".stripMargin,
  )
}
