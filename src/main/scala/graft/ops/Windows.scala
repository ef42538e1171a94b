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
  * (customer, user) — one shuffle by key, then sort within partition;
  * no window spans the whole dataset except q_window_ntile (global
  * distribution query over the 1:10 customer dim, which at 100 TB would
  * be a two-pass rank: per-partition histograms + merge — Spark's
  * single-partition window is acceptable only because the dim is small;
  * flagged in the scaladoc there).
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

  /** Distribution family over a single global ordering. At 100 TB a
    * global ntile needs a two-pass quantile split, not a one-partition
    * window — acceptable here only because customer is the 1:10 dim. */
  private val windowNtile: Q = (s, d) => {
    val w = Window.orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))
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
