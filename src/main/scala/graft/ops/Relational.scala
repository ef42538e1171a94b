package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Det
import graft.io.Tables

/** Relational core: scans, projection/filter, joins, aggregates, sort &
  * set operations (SURVEY.md §2.A/B/C/D/F).
  *
  * All queries are declarative DataFrame expressions — Catalyst handles
  * predicate pushdown, column pruning, join strategy (broadcast vs
  * sort-merge via AQE) and whole-stage codegen. Each entry pairs with a
  * DuckDB oracle statement in `oracle` (same key); both follow the
  * determinism rules in [[graft.Det]].
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- §2.A scans

  /** Full scan, all columns, total order. Parquet scan partitions by
    * row-group at scale; the sort is the only shuffle. */
  private val scanParquet: Q = (s, d) =>
    Tables.lineitem(s, d)
      .withColumn("l_shipdate", col("l_shipdate").cast("date"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
        col("l_partkey").asc, col("l_suppkey").asc, col("l_quantity").asc,
        col("l_extendedprice").asc, col("l_discount").asc, col("l_tax").asc,
        col("l_returnflag").asc, col("l_linestatus").asc, col("l_shipdate").asc)

  /** Column pruning: only 3 columns must reach the scan (ReadSchema). */
  private val scanProjection: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
        col("l_quantity").asc)

  /** Predicate pushdown: range + equality filters land in PushedFilters
    * and skip parquet row groups via min/max stats. */
  private val scanFilterPushdown: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1999-01-01").cast("timestamp") &&
              col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"),
              col("l_shipdate").cast("date").as("l_shipdate"),
              col("l_quantity"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
        col("l_shipdate").asc, col("l_quantity").asc)

  // ----------------------------------------------------- §2.D aggregate probe

  /** TPC-H Q1 shape: multi-measure hash aggregate with partial (map-side)
    * aggregation; 6 groups total so the final shuffle is trivial at any
    * scale. Decimal-cast sums for cross-engine reproducibility. */
  private val aggHash: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag").asc, col("l_linestatus").asc)

  // ------------------------------------------------- §2.B projection / filter

  /** Computed projection: per-row arithmetic stays inside whole-stage
    * codegen; only the 4 referenced columns reach the scan. */
  private val projectExpr: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        Det.r4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        Det.r4(col("l_extendedprice") * (lit(1) - col("l_discount")) *
               (lit(1) + col("l_tax"))).as("charged"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
        col("revenue").asc, col("charged").asc)

  /** Compound predicates: AND/OR/NOT, IN, BETWEEN, LIKE, NULLIF+IS NULL.
    * All are Catalyst `Predicate`s — pushed to the scan where possible. */
  private val filterPredicates: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(
        (col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").between(1000.0, 200000.0) &&
          !(col("o_orderstatus") === "F")) ||
        (col("o_orderpriority").like("%LOW") &&
          nullif(col("o_orderstatus"), lit("P")).isNull))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey").asc)

  val queries: Map[String, Q] = Map(
    "q_scan_parquet"         -> scanParquet,
    "q_scan_projection"      -> scanProjection,
    "q_scan_filter_pushdown" -> scanFilterPushdown,
    "q_agg_hash"             -> aggHash,
    "q_project_expr"         -> projectExpr,
    "q_filter_predicates"    -> filterPredicates,
  )

  val oracle: Map[String, String] = Map(
    "q_scan_parquet" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        |       CAST(l_shipdate AS DATE) AS l_shipdate
        |FROM lineitem
        |ORDER BY l_orderkey ASC, l_linenumber ASC, l_partkey ASC, l_suppkey ASC,
        |         l_quantity ASC, l_extendedprice ASC, l_discount ASC, l_tax ASC,
        |         l_returnflag ASC, l_linestatus ASC, l_shipdate ASC""".stripMargin,
    "q_scan_projection" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |ORDER BY l_orderkey ASC, l_linenumber ASC, l_quantity ASC""".stripMargin,
    "q_scan_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS l_shipdate, l_quantity
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |  AND l_returnflag = 'R'
        |ORDER BY l_orderkey ASC, l_linenumber ASC, l_shipdate ASC, l_quantity ASC""".stripMargin,
    "q_agg_hash" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       ${Det.sqlDsum("l_quantity")} AS sum_qty,
         |       ${Det.sqlDsum("l_extendedprice")} AS sum_base_price,
         |       ${Det.sqlDsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |       ${Det.sqlDavg("l_quantity")} AS avg_qty,
         |       ${Det.sqlDavg("l_extendedprice")} AS avg_price,
         |       COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag ASC, l_linestatus ASC""".stripMargin,
    "q_project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |       FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) / 10000 AS revenue,
        |       FLOOR(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000 + 0.5) / 10000 AS charged
        |FROM lineitem
        |ORDER BY l_orderkey ASC, l_linenumber ASC, revenue ASC, charged ASC""".stripMargin,
    "q_filter_predicates" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE (o_orderpriority IN ('1-URGENT','2-HIGH')
        |       AND o_totalprice BETWEEN 1000.0 AND 200000.0
        |       AND NOT (o_orderstatus = 'F'))
        |   OR (o_orderpriority LIKE '%LOW' AND NULLIF(o_orderstatus, 'P') IS NULL)
        |ORDER BY o_orderkey ASC""".stripMargin,
  )
}
