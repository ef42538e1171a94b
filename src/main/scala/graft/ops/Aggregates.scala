package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Det
import graft.io.Tables

/** Aggregation operators beyond the Q1-shape probe (SURVEY.md §2.D) and
  * sort/limit/set operations (§2.F).
  *
  * Grouped aggregates compile to `HashAggregateExec` with map-side
  * partial aggregation — at 100 TB only the per-group partials cross the
  * shuffle, never raw rows. `rollup`/`cube`/grouping-sets expand to
  * grouping-id tagged partials in the same single shuffle. The two
  * sketch queries (HLL distinct, approx percentile) are the exception:
  * their variable-length buffers plan as `ObjectHashAggregateExec` —
  * still partial+final with only sketch bytes crossing the shuffle.
  */
object Aggregates {
  type Q = (SparkSession, String) => DataFrame

  /** Exact distinct aggregation: Spark plans count(DISTINCT x) as a
    * two-phase expand+agg; the distinct keys shuffle once. */
  private val aggDistinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc)

  /** HyperLogLog++ approximate distinct — the scale path for distinct
    * counts (sketches merge associatively; no exact shuffle of keys).
    * Engine-specific sketch → no DuckDB oracle (rows-only check). */
  private val aggApproxDistinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_suppkey"), 0.01).as("approx_supp"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
      .orderBy(col("l_returnflag").asc)

  /** Mergeable-sketch distinct counting — the SHAPE that makes
    * approximate aggregation work at 100 TB: per-slice (event_type ×
    * day) Datasketches-HLL sketches built in one keyed pass, then
    * UNIONED per event_type (`hll_union_agg`) and estimated. The
    * sketch column is what a production pipeline STORES per
    * day/partition; any date-range distinct count is then a
    * union-of-sketches over dim-sized state — no second corpus scan,
    * ever. (Contrast [[aggApproxDistinct]]: one-shot HLL++ per group —
    * same answer class, but nothing reusable is materialized.) Like
    * the other sketch keys, no oracle — sketch estimates are
    * engine-specific; the spec bounds both the merged and the one-shot
    * estimate against exact COUNT(DISTINCT) and pins merged-vs-oneshot
    * agreement. */
  private val aggHllMerge: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", Det.ets(col("ts"))).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
      .orderBy(col("event_type").asc)
  }

  /** Mergeable-sketch QUANTILES — the [[aggHllMerge]] shape applied to
    * the other hard distributive problem, percentiles: per-(event_type
    * × day) KLL sketches ([[graft.functions.KllAgg]], Datasketches)
    * built in one keyed pass, then merged per event_type and queried
    * at p50/p90/p99. The daily sketch column is the storable artifact;
    * any date-range quantile is a union over dim-sized sketch bytes —
    * no re-scan, no per-group sort, ever. Within a partition the
    * Aggregator buffer is updated in place; only compact sketch bytes
    * cross the partial/final shuffle. Like every sketch key, no
    * oracle (estimates are sketch-specific): the spec bounds merged
    * AND one-shot estimates against exact ranks, and the exact
    * q_agg_percentile is the value-verified twin. */
  private val aggKllMerge: Q = (s, d) => {
    import graft.functions.KllAgg
    val kSketch = udaf(KllAgg.sketch)
    val kUnion = udaf(KllAgg.union)
    val kq = udf((b: Array[Byte], q: Double) => KllAgg.quantileOf(b, q))
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("day", Det.ets(col("ts"))).as("day"))
      .agg(kSketch(col("value")).as("sk"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), kUnion(col("sk")).as("sk"))
      .select(col("event_type"), col("n_days"),
        kq(col("sk"), lit(0.5)).as("p50"),
        kq(col("sk"), lit(0.9)).as("p90"),
        kq(col("sk"), lit(0.99)).as("p99"))
      .orderBy(col("event_type").asc)
  }

  /** Approximate percentiles (t-digest-style sketch): the streaming
    * alternative to exact percentile_cont at 100 TB — mergeable partial
    * sketches, one shuffle of sketch bytes instead of a per-group sort.
    * Like the HLL query, no oracle: the sketch is engine-specific
    * (driver records a rows-only check); the EXACT q_agg_percentile is
    * the value-verified twin. */
  private val aggApproxPercentile: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_percentile(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("p50"),
        approx_percentile(col("l_extendedprice"), lit(0.95), lit(10000))
          .as("p95"))
      .orderBy(col("l_returnflag").asc)

  /** ROLLUP: hierarchical subtotals region → nation → grand total. */
  private val aggRollup: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        Det.dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)

  /** CUBE: all subtotal combinations over two low-cardinality flags. */
  private val aggCube: Q = (s, d) =>
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), Det.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Explicit GROUPING SETS via SQL (the one shape the DataFrame API
    * does not expose directly); includes grouping_id to disambiguate the
    * (status) vs (priority) set of a NULL-keyed row. */
  private val aggGroupingSets: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       grouping_id(o_orderstatus, o_orderpriority) AS gid,
        |       COUNT(*) AS n_orders
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid ASC, o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** HAVING: post-aggregation filter (a plain Filter above the agg —
    * Catalyst cannot push it below, by semantics). */
  private val aggHaving: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum(col("o_totalprice")).as("sum_price"))
      .filter(col("n_orders") >= 12)
      .orderBy(col("o_custkey").asc)

  // ------------------------------------------------------ §2.F sort / set ops

  /** Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    * each partition keeps k rows, the driver merges; no global sort at
    * any scale. Tie-broken to a total order. */
  private val sortLimit: Q = (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc)
      .limit(50)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Bag union of two disjoint filters; branch tag keeps a total order. */
  private val setUnionAll: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"), lit("urgent").as("src"))
    val high = o.filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_orderkey"), col("o_totalprice"), lit("high").as("src"))
    urgent.unionAll(high).orderBy(col("o_orderkey").asc, col("src").asc)
  }

  /** Distinct union — dedup shuffles only the distinct key values. */
  private val setUnion: Q = (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .union(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy(col("nationkey").asc)

  /** INTERSECT (distinct semantics in both engines). */
  private val setIntersect: Q = (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey").asc)

  /** EXCEPT (distinct semantics in both engines). */
  private val setExcept: Q = (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .except(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey").asc)

  val queries: Map[String, Q] = Map(
    "q_agg_distinct"        -> aggDistinct,
    "q_agg_approx_distinct" -> aggApproxDistinct,
    "q_agg_hll_merge"       -> aggHllMerge,
    "q_agg_kll_merge"       -> aggKllMerge,
    "q_agg_approx_percentile" -> aggApproxPercentile,
    "q_agg_rollup"          -> aggRollup,
    "q_agg_cube"            -> aggCube,
    "q_agg_grouping_sets"   -> aggGroupingSets,
    "q_agg_having"          -> aggHaving,
    "q_sort_limit"          -> sortLimit,
    "q_set_union_all"       -> setUnionAll,
    "q_set_union"           -> setUnion,
    "q_set_intersect"       -> setIntersect,
    "q_set_except"          -> setExcept,
  )

  val oracle: Map[String, String] = Map(
    "q_agg_distinct" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_suppkey) AS n_supp,
        |       COUNT(DISTINCT l_orderkey) AS n_orders,
        |       COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag ASC""".stripMargin,
    // q_agg_approx_distinct: intentionally no oracle (HLL++ sketch values
    // are engine-specific); driver records a rows-only check.
    // q_agg_hll_merge: same — the union-of-sketches estimate is
    // engine-specific (Datasketches HLL); spec bounds it against exact.
    // q_agg_kll_merge: same — KLL quantile estimates are
    // sketch-specific; spec bounds rank error against exact percentiles.
    "q_agg_rollup" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_customers,
         |       ${Det.sqlDsum("c_acctbal")} AS sum_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP (r_name, n_name)
         |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,
    "q_agg_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
         |       ${Det.sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       GROUPING(o_orderstatus, o_orderpriority) AS gid,
        |       COUNT(*) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid ASC, o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_agg_having" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders,
         |       ${Det.sqlDsum("o_totalprice")} AS sum_price
         |FROM orders
         |GROUP BY o_custkey
         |HAVING COUNT(*) >= 12
         |ORDER BY o_custkey ASC""".stripMargin,
    "q_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
        |LIMIT 50""".stripMargin,
    "q_set_union_all" ->
      """SELECT o_orderkey, o_totalprice, 'urgent' AS src
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, 'high' AS src
        |FROM orders WHERE o_orderpriority = '2-HIGH'
        |ORDER BY o_orderkey ASC, src ASC""".stripMargin,
    "q_set_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey ASC""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey ASC""".stripMargin,
    "q_set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey ASC""".stripMargin,
  )
}
