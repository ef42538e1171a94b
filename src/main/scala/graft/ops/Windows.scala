package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Det
import graft.io.Tables

/** Window functions (SURVEY.md §2.E).
  *
  * Reference analog: pgshovel consumers analyze per-publisher sequence
  * numbers (public pgshovel `streams.proto` Header.sequence) — ranking,
  * offsets and running state over an ordered partition is exactly Spark's
  * `Window.partitionBy(key).orderBy(seq)`.
  *
  * Scale notes: every window below partitions by a high-cardinality key
  * (customer, user) — one shuffle by key, then sort within partition.
  * No window spans the whole dataset on one partition: the one global
  * distribution query (q_window_ntile) runs as a two-pass sampled
  * range-split + exact rank arithmetic (see its scaladoc) whose only
  * window is bucket-partitioned; its tiny global steps (boundary pick,
  * bucket-count prefix sums) are windowless aggregates/joins.
  *
  * Window sums over doubles use decimal-cast inputs: DuckDB aggregates
  * frames via a segment tree (tree-order additions), Spark re-aggregates
  * the frame linearly — only exact (decimal) addition is order-free.
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame
  private val D = DecimalType(18, 4)

  /** Ranking family over account balance within market segment. */
  private val windowRank: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .orderBy(col("c_mktsegment").asc, col("rn").asc)
  }

  /** Analytic offsets: previous/next event value per user in sequence
    * order. */
  private val windowLagLead: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").asc)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"))
      .orderBy(col("event_id").asc)
  }

  /** ROWS frame: 3-row moving sum of order totals per customer. */
  private val windowFrameRows: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(-2, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        sum(col("o_totalprice").cast(D)).over(w).cast("double").as("moving_sum"))
      .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
  }

  /** RANGE frame: running revenue per customer by order date — date ties
    * aggregate together (peer rows), so the result is order-independent
    * by construction. */
  private val windowFrameRange: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        sum(col("o_totalprice").cast(D)).over(w).cast("double").as("running_sum"))
      .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
  }

  /** Distribution family over a single global ordering — the TWO-PASS
    * distributed formulation (round 9; replaces the single-partition
    * global window, the engine's last scale-killer shape).
    *
    * The ORDER BY carries a unique tiebreak (custkey), so every row has
    * a unique exact global rank `r` in [1, n] and all three window
    * functions are pure arithmetic in (r, n):
    * ntile = equal-height split of r, percent_rank = (r-1)/(n-1),
    * cume_dist = r/n. The plan derives `r` without ever sorting the
    * corpus on one partition — the same design as Spark's own
    * RangePartitioner:
    *
    *  1. a hash sample of EXPECTED [[NtileSampleTarget]] rows
    *     (md5-uniform u kept iff u·n < target — fixed expected size at
    *     any corpus scale) is folded into ONE sorted array by a plain
    *     aggregate, and ≤ [[NtileBuckets]]-1 range boundary tuples
    *     (acctbal, custkey) are picked from it by index — no window at
    *     all in this pass (Spark 4's EliminateWindowPartitions folds
    *     constant partition keys back to the warned global window, so
    *     "tiny window on a constant key" is not actually available);
    *  2. boundaries broadcast; each row's bucket is assigned MAP-SIDE
    *     by counting boundaries ≤ its sort tuple (exact, tie-safe —
    *     boundaries are full tuples, so equal balances cannot straddle
    *     a bucket edge and no bucket is tie-skewed);
    *  3. one bucket-partitioned window gives local ranks (each
    *     partition ≈ n/buckets rows; buckets scale with the corpus);
    *  4. per-bucket counts (≤ buckets rows) prefix-sum into offsets
    *     via a tiny triangle self-join and broadcast back:
    *     r = offset + local rank.
    *
    * Boundary QUALITY only affects balance, never correctness — ranks
    * are exact whatever the sample returned. The customer input is
    * scanned once per tiny aggregate (n, boundaries, bucket counts) —
    * three cheap column-pruned scans instead of one corpus-wide sort
    * on a single partition. Oracle is the plain SQL window
    * (unchanged); OperatorSpec additionally proves this plan
    * row-identical to Spark's built-in global-window ntile. */
  private[ops] val NtileSampleTarget = 1024
  private[ops] val NtileBuckets = 32
  private val windowNtile: Q = (s, d) => {
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal"))
    val nDf = cust.agg(count(lit(1)).as("n"))
    // Pass 1: sample → sorted array → ≤ NtileBuckets-1 boundary tuples
    // (1 row). element_at is guarded (CASE) so an undersized sample
    // yields fewer boundaries, never an ANSI index error; array_distinct
    // keeps boundaries strictly increasing (duplicates would only skip
    // bucket numbers, but strict is cleaner to reason about).
    val u = conv(substring(md5(col("c_custkey").cast("string").cast("binary")),
      1, 8), 16, 10).cast("double") / lit(4294967296.0)
    val bnds = cust.crossJoin(broadcast(nDf))
      .filter(u * col("n") < lit(NtileSampleTarget.toDouble))
      .agg(sort_array(collect_list(struct(col("c_acctbal").as("bal"),
        col("c_custkey").as("key")))).as("arr"))
      .select(expr(
        s"""array_distinct(filter(
           |  transform(sequence(1, ${NtileBuckets - 1}),
           |    i -> CASE WHEN (i * size(arr)) div $NtileBuckets >= 1
           |         THEN element_at(arr,
           |                CAST((i * size(arr)) div $NtileBuckets AS INT))
           |         END),
           |  x -> x IS NOT NULL))""".stripMargin).as("bnds"))
    // Pass 2: map-side bucket assignment, bucket-local ranks, offsets.
    val bucketed = cust.crossJoin(broadcast(bnds))
      .withColumn("bucket", size(filter(col("bnds"), b =>
        b.getField("bal") < col("c_acctbal") ||
          (b.getField("bal") === col("c_acctbal") &&
            b.getField("key") <= col("c_custkey")))))
      .drop("bnds")
    val local = bucketed.withColumn("lr", row_number().over(
      Window.partitionBy(col("bucket"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)))
    // Offsets: prefix sums over the ≤ NtileBuckets-row count table via
    // a triangle self-join (tiny × tiny; windowless by design).
    val stats = bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("bc"))
    val offs = stats.as("a")
      .join(stats.as("b"), col("b.bucket") < col("a.bucket"), "left")
      .groupBy(col("a.bucket").as("bucket"))
      .agg(coalesce(sum(col("b.bc")), lit(0L)).as("off"))
    local.join(broadcast(offs), "bucket")
      .crossJoin(broadcast(nDf))
      .withColumn("r", col("off") + col("lr"))
      // SQL-standard equal-height ntile: first n%4 tiles get one extra.
      .withColumn("quartile", expr(
        """CAST(CASE WHEN r <= (n % 4) * (n div 4 + 1)
          |     THEN (r - 1) div (n div 4 + 1) + 1
          |     ELSE n % 4 + (r - (n % 4) * (n div 4 + 1) - 1)
          |            div greatest(n div 4, 1) + 1
          |     END AS INT)""".stripMargin))
      .withColumn("prank", when(col("n") === 1, lit(0.0))
        .otherwise((col("r") - 1).cast("double") / (col("n") - 1).cast("double")))
      .withColumn("cdist", col("r").cast("double") / col("n").cast("double"))
      .select(col("c_custkey"), col("c_acctbal"),
        col("quartile"), col("prank"), col("cdist"))
      .orderBy(col("c_custkey").asc)
  }

  /** Top-k per group: top-3 orders per customer by value. */
  private val topkPerGroup: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey").asc, col("rn").asc)
  }

  /** Distribution family: percent_rank / cume_dist over balance within
    * segment. The ORDER BY carries a unique tiebreak (custkey), so both
    * functions are exact rationals of integer rank/count — identical
    * IEEE divisions in both engines (r4 belt-and-braces). */
  private val windowDistribution: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.customer(s, d)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        Det.r4(percent_rank().over(w)).as("pct_rank"),
        Det.r4(cume_dist().over(w)).as("cume"))
      .orderBy(col("c_mktsegment").asc, col("c_custkey").asc)
  }

  val queries: Map[String, Q] = Map(
    "q_window_distribution" -> windowDistribution,
    "q_window_rank"        -> windowRank,
    "q_window_lag_lead"    -> windowLagLead,
    "q_window_frame_rows"  -> windowFrameRows,
    "q_window_frame_range" -> windowFrameRange,
    "q_window_ntile"       -> windowNtile,
    "q_topk_per_group"     -> topkPerGroup,
  )

  val oracle: Map[String, String] = Map(
    "q_window_distribution" ->
      s"""SELECT c_mktsegment, c_custkey, c_acctbal,
         |       ${Det.sqlR4("PERCENT_RANK() OVER w")} AS pct_rank,
         |       ${Det.sqlR4("CUME_DIST() OVER w")} AS cume
         |FROM customer
         |WINDOW w AS (PARTITION BY c_mktsegment
         |             ORDER BY c_acctbal DESC, c_custkey ASC)
         |ORDER BY c_mktsegment ASC, c_custkey ASC""".stripMargin,
    "q_window_rank" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |       RANK()       OVER w AS rnk,
        |       DENSE_RANK() OVER w AS drnk,
        |       ROW_NUMBER() OVER w AS rn
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey ASC)
        |ORDER BY c_mktsegment ASC, rn ASC""".stripMargin,
    "q_window_lag_lead" ->
      """SELECT event_id, user_id, value,
        |       LAG(value, 1)  OVER w AS prev_value,
        |       LEAD(value, 1) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ASC)
        |ORDER BY event_id ASC""".stripMargin,
    "q_window_frame_rows" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS moving_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
    "q_window_frame_range" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC
        |             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
    "q_window_ntile" ->
      """SELECT c_custkey, c_acctbal,
        |       NTILE(4)       OVER w AS quartile,
        |       PERCENT_RANK() OVER w AS prank,
        |       CUME_DIST()    OVER w AS cdist
        |FROM customer
        |WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
        |ORDER BY c_custkey ASC""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |             ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey ASC, rn ASC""".stripMargin,
  )
}
