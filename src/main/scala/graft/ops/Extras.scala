package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Det
import graft.io.Tables

/** Statistical aggregates and subquery forms.
  *
  * Variance/correlation are computed from explicit decimal-exact moment
  * sums (Σx, Σx², Σxy) instead of the built-in `stddev`/`corr`: the
  * built-ins use streaming (Welford-style) updates whose float error
  * depends on partition order — fine for analytics, not reproducible
  * across engines. The moment form is order-free and still one
  * aggregation pass; at scale it is the same partial/final plan as any
  * sum. Squares/products need DECIMAL(28,4): price² ~1e10 × 600k rows
  * overflows DECIMAL(18,4)'s 1e14 headroom.
  *
  * Percentiles: Spark `percentile` and DuckDB `quantile_cont` both use
  * the standard (n−1)p linear interpolation on the sorted values —
  * identical arithmetic on identical input doubles.
  *
  * Subqueries: scalar and IN forms go through Catalyst's
  * decorrelation (`RewriteCorrelatedScalarSubquery`) into the same
  * joins the explicit formulations would produce — declared as SQL text
  * against temp views to exercise that path.
  */
object Extras {
  type Q = (SparkSession, String) => DataFrame
  private val D28 = "decimal(28,4)"

  /** Exact statistical aggregates per order-priority group. */
  private val aggStats: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val x = col("o_totalprice")
    val sx = sum(x.cast("decimal(18,4)")).cast("double")
    val sxx = sum((x * x).cast(D28)).cast("double")
    val n = count(lit(1)).cast("double")
    o.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        Det.davg(x).as("mean_price"),
        // n == 1 would divide by zero — a crash under Spark 4's default
        // ANSI mode, and NaN-vs-NULL divergence otherwise; emit NULL
        Det.r4(sqrt((sxx - sx * sx / n) / nullif(n - lit(1.0), lit(0.0))))
          .as("stddev_price"))
      .orderBy(col("o_orderpriority").asc)
  }

  /** Exact Pearson correlation from moment sums (quantity vs price). */
  private val aggCorr: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    val n = count(lit(1)).cast("double")
    val sx = sum(x.cast("decimal(18,4)")).cast("double")
    val sy = sum(y.cast("decimal(18,4)")).cast("double")
    val sxx = sum((x * x).cast(D28)).cast("double")
    val syy = sum((y * y).cast(D28)).cast("double")
    val sxy = sum((x * y).cast(D28)).cast("double")
    li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        // zero variance on either side -> NULL, not ANSI crash / NaN
        Det.r4((n * sxy - sx * sy) /
          nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), lit(0.0)))
          .as("corr_qty_price"))
      .orderBy(col("l_returnflag").asc)
  }

  /** Median + p90 via exact interpolated percentile. */
  private val aggPercentile: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        Det.r4(expr("percentile(o_totalprice, 0.5)")).as("p50"),
        Det.r4(expr("percentile(o_totalprice, 0.9)")).as("p90"))
      .orderBy(col("o_orderstatus").asc)

  /** Correlated scalar subquery (decorrelated by Catalyst). */
  private val subqueryScalar: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_sq")
    Tables.customer(s, d).createOrReplaceTempView("customer_sq")
    s.sql(
      """SELECT o_orderkey, o_custkey,
        |       (SELECT c_name FROM customer_sq WHERE c_custkey = o_custkey)
        |         AS cust_name
        |FROM orders_sq
        |WHERE o_totalprice > 400000.0
        |ORDER BY o_orderkey ASC""".stripMargin)
  }

  /** IN + NOT IN subqueries (plan as semi/anti joins). */
  private val subqueryIn: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_sq2")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_sq2")
    s.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM orders_sq2
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem_sq2
        |                     WHERE l_quantity >= 45.0)
        |ORDER BY o_orderkey ASC""".stripMargin)
  }

  /** UNPIVOT (melt): wide measures → long (col, value) rows — the
    * inverse of q_pivot, Spark 3.4+ DataFrame API. */
  private val unpivot: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "measure", valueColumnName = "val")
      // Spark unpivot keeps NULL values, DuckDB UNPIVOT drops them by
      // default — align on exclude-NULLs (no-op on this data, explicit
      // so the parity holds on nullable inputs too)
      .filter(col("val").isNotNull)
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
        col("measure").asc, col("val").asc)

  /** Generator source: a computed table from a range — no files at all
    * (the synthetic-source path; Spark `range` == DuckDB
    * `generate_series`, both parallelizable by numeric splits). */
  private val sourceRange: Q = (s, _) =>
    s.range(0, 1000)
      .select(col("id"),
        (col("id") * col("id") % 97).as("sq_mod"),
        when(col("id") % 15 === 0, "fizzbuzz")
          .when(col("id") % 3 === 0, "fizz")
          .when(col("id") % 5 === 0, "buzz")
          .otherwise(col("id").cast("string")).as("label"))
      .orderBy(col("id").asc)

  /** first/last/nth value window family: per customer order history —
    * frame must be the full partition for last/nth (default frame stops
    * at CURRENT ROW), same in both engines. */
  private val windowFirstLast: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy(col("o_custkey").asc, col("o_orderkey").asc)
  }

  /** Statistical mode (most frequent value) with deterministic ties:
    * per market segment, the most common nation among its customers. */
  private val aggMode: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment"))
      .orderBy(col("n").desc, col("c_nationkey").asc)
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_mktsegment"), col("c_nationkey").as("mode_nation"),
        col("n").as("n_customers"))
      .orderBy(col("c_mktsegment").asc)
  }

  /** String-distance kernel: Levenshtein (exact integer DP — identical
    * across engines) between part brand and type prefixes. */
  private val strDistance: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev_bt"),
        levenshtein(substring(col("p_name"), 1, 10), col("p_brand"))
          .cast("long").as("lev_nb"))
      .orderBy(col("p_partkey").asc)

  /** Date-part kernel: quarter / ISO week / ISO day-of-week. Engine
    * trap: Spark dayofweek() is Sunday=1 while DuckDB dayofweek is
    * Sunday=0 — use the ISO convention on both sides (Spark weekday()
    * is Monday=0, DuckDB isodow is Monday=1; +1 aligns them). */
  private val dateParts: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("iso_dow"))
      .orderBy(col("o_orderkey").asc)

  /** Bitwise kernel: AND/OR/XOR/shifts/popcount on integer keys. */
  private val bitFuncs: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        expr("l_orderkey & l_partkey").as("band"),
        expr("l_orderkey | l_partkey").as("bor"),
        expr("l_orderkey ^ l_partkey").as("bxor"),
        expr("shiftleft(l_linenumber, 3)").cast("long").as("shl"),
        expr("shiftright(l_partkey, 2)").as("shr"),
        expr("bit_count(l_orderkey)").cast("long").as("popcnt"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
        col("l_partkey").asc)

  val queries: Map[String, Q] = Map(
    "q_date_parts"      -> dateParts,
    "q_bit_funcs"       -> bitFuncs,
    "q_window_first_last" -> windowFirstLast,
    "q_agg_mode"        -> aggMode,
    "q_str_distance"    -> strDistance,
    "q_agg_stats"       -> aggStats,
    "q_agg_corr"        -> aggCorr,
    "q_agg_percentile"  -> aggPercentile,
    "q_subquery_scalar" -> subqueryScalar,
    "q_subquery_in"     -> subqueryIn,
    "q_unpivot"         -> unpivot,
    "q_source_range"    -> sourceRange,
  )

  val oracle: Map[String, String] = Map(
    "q_date_parts" ->
      """SELECT o_orderkey,
        |       EXTRACT(QUARTER FROM o_orderdate) AS qtr,
        |       EXTRACT(WEEK FROM o_orderdate) AS iso_week,
        |       EXTRACT(ISODOW FROM o_orderdate) AS iso_dow
        |FROM orders
        |ORDER BY o_orderkey ASC""".stripMargin,
    "q_bit_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_partkey,
        |       l_orderkey & l_partkey AS band,
        |       l_orderkey | l_partkey AS bor,
        |       xor(l_orderkey, l_partkey) AS bxor,
        |       CAST(l_linenumber << 3 AS BIGINT) AS shl,
        |       l_partkey >> 2 AS shr,
        |       CAST(bit_count(l_orderkey) AS BIGINT) AS popcnt
        |FROM lineitem
        |ORDER BY l_orderkey ASC, l_linenumber ASC, l_partkey ASC""".stripMargin,
    "q_window_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |       FIRST_VALUE(o_totalprice) OVER w AS first_price,
        |       LAST_VALUE(o_totalprice)  OVER w AS last_price,
        |       NTH_VALUE(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey ASC, o_orderkey ASC""".stripMargin,
    "q_agg_mode" ->
      """SELECT c_mktsegment, mode_nation, n_customers
        |FROM (SELECT c_mktsegment, c_nationkey AS mode_nation, COUNT(*) AS n_customers,
        |             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                                ORDER BY COUNT(*) DESC, c_nationkey ASC) AS rn
        |      FROM customer GROUP BY c_mktsegment, c_nationkey)
        |WHERE rn = 1
        |ORDER BY c_mktsegment ASC""".stripMargin,
    "q_str_distance" ->
      """SELECT p_partkey,
        |       CAST(levenshtein(p_brand, p_type) AS BIGINT) AS lev_bt,
        |       CAST(levenshtein(SUBSTRING(p_name, 1, 10), p_brand) AS BIGINT) AS lev_nb
        |FROM part
        |ORDER BY p_partkey ASC""".stripMargin,
    "q_agg_stats" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
         |       ${Det.sqlDavg("o_totalprice")} AS mean_price,
         |       ${Det.sqlR4(
               "SQRT((CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(28,4))) AS DOUBLE)" +
               " - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)" +
               " * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)" +
               " / CAST(COUNT(*) AS DOUBLE)) / NULLIF(CAST(COUNT(*) AS DOUBLE) - 1.0, 0.0))")}
         |         AS stddev_price
         |FROM orders
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority ASC""".stripMargin,
    "q_agg_corr" ->
      s"""WITH m AS (
         |  SELECT l_returnflag,
         |         CAST(COUNT(*) AS DOUBLE) AS n,
         |         COUNT(*) AS n_rows,
         |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
         |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
         |         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
         |         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS syy,
         |         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sxy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, n_rows,
         |       ${Det.sqlR4("(n * sxy - sx * sy) / NULLIF(SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy), 0.0)")}
         |         AS corr_qty_price
         |FROM m
         |ORDER BY l_returnflag ASC""".stripMargin,
    "q_agg_percentile" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
         |       ${Det.sqlR4("quantile_cont(o_totalprice, 0.5)")} AS p50,
         |       ${Det.sqlR4("quantile_cont(o_totalprice, 0.9)")} AS p90
         |FROM orders
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus ASC""".stripMargin,
    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_custkey,
        |       (SELECT c_name FROM customer WHERE c_custkey = o_custkey)
        |         AS cust_name
        |FROM orders
        |WHERE o_totalprice > 400000.0
        |ORDER BY o_orderkey ASC""".stripMargin,
    "q_subquery_in" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     WHERE l_quantity >= 45.0)
        |ORDER BY o_orderkey ASC""".stripMargin,
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, val
        |FROM (UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity,
        |                      l_extendedprice, l_discount, l_tax FROM lineitem)
        |      ON l_quantity, l_extendedprice, l_discount, l_tax
        |      INTO NAME measure VALUE val)
        |ORDER BY l_orderkey ASC, l_linenumber ASC, measure ASC, val ASC""".stripMargin,
    "q_source_range" ->
      """SELECT CAST(r.range AS BIGINT) AS id,
        |       CAST(r.range * r.range % 97 AS BIGINT) AS sq_mod,
        |       CASE WHEN r.range % 15 = 0 THEN 'fizzbuzz'
        |            WHEN r.range % 3 = 0 THEN 'fizz'
        |            WHEN r.range % 5 = 0 THEN 'buzz'
        |            ELSE CAST(r.range AS VARCHAR) END AS label
        |FROM range(0, 1000) r
        |ORDER BY id ASC""".stripMargin,
  )
}
