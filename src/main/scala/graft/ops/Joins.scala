package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Det
import graft.io.Tables

/** Join operators (SURVEY.md §2.C).
  *
  * Reference analog: pgshovel applies keyed mutations to targets by
  * primary-key identity (public pgshovel `streams.proto` identity
  * columns) — i.e. every reference "join" is an equi-join on a key.
  * Here the full relational join surface is declared; Catalyst/AQE pick
  * broadcast-hash vs shuffled-hash vs sort-merge per side sizes.
  *
  * Scale notes (100 TB): fact-fact joins shuffle on the equi-key — at
  * 1000 executors that is the intended hash partitioning, and AQE handles
  * skewed keys (skew-join split). Dimension joins are broadcast
  * explicitly so no shuffle of the fact side ever happens. The interval
  * and as-of joins stay keyed (equi on user/customer) so the range logic
  * runs within a key partition, never as a global cross product.
  */
object Joins {
  type Q = (SparkSession, String) => DataFrame

  /** Inner equi-join orders⋈customer. Both sides shuffle-hash on the key
    * at scale; AQE broadcasts customer when it is small enough. */
  private val innerHash: Q = (s, d) =>
    Tables.orders(s, d).join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
        col("c_mktsegment"), col("o_totalprice"))
      .orderBy(col("o_orderkey").asc)

  /** Broadcast hash join: part is a dimension — ship it to every
    * executor; the lineitem side is never shuffled. */
  private val broadcastJoin: Q = (s, d) =>
    Tables.lineitem(s, d).join(broadcast(Tables.part(s, d)),
        col("l_partkey") === col("p_partkey"), "inner")
      .select(col("l_orderkey"), col("l_linenumber"), col("p_brand"),
        col("p_type"), col("l_quantity"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
        col("p_brand").asc, col("p_type").asc, col("l_quantity").asc)

  /** Left outer: every customer, order columns nullable. */
  private val leftJoin: Q = (s, d) =>
    Tables.customer(s, d).join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)

  /** Full outer: customer key space vs observed event users. */
  private val fullJoin: Q = (s, d) => {
    val users = Tables.events(s, d).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    Tables.customer(s, d)
      .join(users, col("c_custkey") === col("user_id"), "full")
      .select(col("c_custkey"), col("user_id"), col("n_events"))
      .orderBy(coalesce(col("c_custkey"), col("user_id")).asc,
        col("c_custkey").asc_nulls_first)
  }

  /** Left-semi = EXISTS: customers having at least one order; the right
    * side only gates, its columns never materialize. */
  private val semiJoin: Q = (s, d) =>
    Tables.customer(s, d).join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey").asc)

  /** Left-anti = NOT EXISTS: customers without orders. */
  private val antiJoin: Q = (s, d) =>
    Tables.customer(s, d).join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey").asc)

  /** Cartesian product of two tiny dims (BroadcastNestedLoopJoin). */
  private val crossJoin: Q = (s, d) =>
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select(col("r_regionkey"), col("r_name"), col("n_nationkey"),
        col("n_name"))
      .orderBy(col("r_regionkey").asc, col("n_nationkey").asc)

  /** Equi-key + theta residual: hash join on partkey, inequality applied
    * as a post-join filter (never a nested loop). */
  private val thetaJoin: Q = (s, d) =>
    Tables.lineitem(s, d).join(broadcast(Tables.part(s, d)),
        col("l_partkey") === col("p_partkey") &&
        col("l_extendedprice") > col("p_retailprice"), "inner")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        Det.r4(col("l_extendedprice") - col("p_retailprice")).as("over_retail"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
        col("l_partkey").asc, col("over_retail").asc)

  /** Interval self-join: pairs of events of the same user ≤ 5 minutes
    * apart. Equi on user_id keeps it partition-local; the time band is a
    * residual range predicate within each key — at 100 TB this is the
    * bucketed-by-user co-located join, never a cross product. */
  private val intervalJoin: Q = (s, d) => {
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), Det.ets(col("ts")).as("ts"))
    val a = e.select(col("event_id").as("a_id"), col("user_id"),
      col("ts").as("a_ts"))
    val b = e.select(col("event_id").as("b_id"),
      col("user_id").as("b_user"), col("ts").as("b_ts"))
    a.join(b,
        col("user_id") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"), "inner")
      .select(col("user_id"), col("a_id"), col("b_id"),
        Det.outTs(col("a_ts")).as("a_ts"), Det.outTs(col("b_ts")).as("b_ts"))
      .orderBy(col("user_id").asc, col("a_id").asc, col("b_id").asc)
  }

  /** Interval self-join, BINNED: identical semantics (and oracle) to
    * [[intervalJoin]], different 100 TB plan. The plain form equi-joins
    * on user_id and evaluates the 5-minute residual inside the match —
    * fine until one user carries a large share of the stream, when the
    * per-user candidate set is O(n_u²) regardless of how few pairs the
    * time window keeps. Binning adds floor(ts / window) to the join
    * key: the build side lands in exactly one bucket, the probe side
    * fans out to the only two buckets a (a_ts, a_ts+5min] window can
    * intersect, and the residual BETWEEN runs only within (user,
    * bucket) cells. Candidate volume drops from Σ n_u² to
    * Σ per-(user, bucket)² — bounded by event RATE, not by per-user
    * history length — at the fixed cost of one 2× probe-side fan-out
    * (ids and timestamps only; the standard banding construction every
    * streaming range-join uses). Each build row is in one bucket, so
    * no dedup step is needed. */
  private val intervalJoinBinned: Q = (s, d) => {
    val win = 300000L // 5 minutes in ms — bucket length == window length
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), Det.ets(col("ts")).as("ts"))
    val a = e.select(col("event_id").as("a_id"), col("user_id"),
        col("ts").as("a_ts"))
      .withColumn("bkt", explode(array(
        floor(unix_millis(col("a_ts")) / win),
        floor(unix_millis(col("a_ts")) / win) + 1)))
    val b = e.select(col("event_id").as("b_id"),
        col("user_id").as("b_user"), col("ts").as("b_ts"))
      .withColumn("b_bkt", floor(unix_millis(col("b_ts")) / win))
    a.join(b,
        col("user_id") === col("b_user") && col("bkt") === col("b_bkt") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 5 MINUTES"), "inner")
      .select(col("user_id"), col("a_id"), col("b_id"),
        Det.outTs(col("a_ts")).as("a_ts"), Det.outTs(col("b_ts")).as("b_ts"))
      .orderBy(col("user_id").asc, col("a_id").asc, col("b_id").asc)
  }

  /** As-of join: each event picks the user's latest order at-or-before
    * the event time. Spark-first shape: equi-join on the key with the
    * temporal inequality, then pick the winner with
    * `max(struct(o_orderdate, o_orderkey))` — lexicographic struct max
    * ≡ ORDER BY date DESC, key DESC LIMIT 1. The aggregation beats a
    * row_number window here twice over: partials fold map-side in the
    * join's output stream, and grouping on (event_id, user_id) is
    * already satisfied by the join's user_id hash partitioning (subset
    * rule) — the whole operator runs on ONE shuffle of each side. */
  private val asofJoin: Q = (s, d) => {
    val e = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), Det.ets(col("ts")).as("ts"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    e.join(o, col("user_id") === col("o_custkey") &&
        col("o_orderdate") <= col("ts"), "inner")
      .groupBy(col("event_id"), col("user_id"))
      .agg(max(struct(col("o_orderdate"), col("o_orderkey"))).as("best"))
      .select(col("event_id"), col("user_id"),
        col("best.o_orderkey").as("o_orderkey"),
        col("best.o_orderdate").cast("date").as("o_orderdate"))
      .orderBy(col("event_id").asc)
  }

  /** Declared surface of the skew playbook: the events fact side joins
    * the customer dimension through [[Skew.saltedJoin]] (salt = 8), so
    * every join key is split across 8 reducer keys — the manual remedy
    * when one key is hot enough that even AQE's post-shuffle skew split
    * can't help (a single key's rows all hash to ONE map output
    * partition; salting re-keys them map-side). Result is identical to
    * the plain join by construction (the dim side is exploded across
    * all salts), which is exactly what the oracle checks. The aggregate
    * on top keeps the declared output small and deterministic. */
  private val saltedSkewJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("value"))
    val cust = Tables.customer(s, d)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    Skew.saltedJoin(ev, cust, "user_id", salt = 8)
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .orderBy(col("c_mktsegment").asc, col("event_type").asc)
  }

  /** Bloom geometry: m = 2^16 bits packed into 1024 longs (a 8 KiB
    * broadcast), k = 3 hash functions. At ~600 selected keys the
    * false-positive rate is ≈ (1-e^(-kn/m))^k ≈ 3·10^-6 — the exact
    * join behind the filter removes even those. */
  private val BloomBits = 1 << 16
  private val BloomSeeds = 0 until 3

  private def bloomPos(key: Column, seed: Int): Column =
    pmod(xxhash64(lit(seed), key), lit(BloomBits)).cast("int")

  /** 1L << b for b ∈ [0, 64) — variable-amount shifts as O(1) array
    * lookups, keeping the probe expression in codegen. */
  private val pow2: Column =
    typedLit((0 until 64).map(b => 1L << b))

  /** The selective build side: one order month (~1% of orders). */
  private def bloomSel(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1995-03-01")) &&
        col("o_orderdate") < to_timestamp(lit("1995-04-01")))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))

  /** Fold `sel`'s keys into ONE row holding the packed bitset: explode
    * each key to its k positions, partial-agg `bit_or` by 64-bit word
    * (≤1024 rows shuffle), assemble the dense array once. */
  private def bloomArray(sel: DataFrame): DataFrame =
    sel
      .select(explode(array(
        BloomSeeds.map(i => bloomPos(col("o_orderkey"), i)): _*)).as("p"))
      .groupBy((col("p") / 64).cast("int").as("i"))
      .agg(bit_or(element_at(pow2, pmod(col("p"), lit(64)) + 1)).as("bits"))
      .agg(map_from_entries(collect_list(struct(col("i"), col("bits")))).as("m"))
      .select(transform(sequence(lit(0), lit(BloomBits / 64 - 1)),
        i => coalesce(element_at(col("m"), i), lit(0L))).as("bloom"))

  /** All k bit positions of `key` are set in the broadcast `bloom`
    * column — two O(1) `element_at`s per probe, inside codegen. */
  private def bloomMightContain(key: Column): Column =
    BloomSeeds.map { sd =>
      val p = bloomPos(key, sd)
      element_at(col("bloom"), (p / 64).cast("int") + 1)
        .bitwiseAND(element_at(pow2, pmod(p, lit(64)) + 1)) =!= 0L
    }.reduce(_ && _)

  /** The fact side pruned BEFORE any shuffle: broadcast the one-row
    * bitset onto the scan, keep rows whose key might be in the build
    * side. Exposed for the spec's superset/pruning assertions. */
  private[graft] def bloomPrefilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .crossJoin(broadcast(bloomArray(bloomSel(s, d))))
      .filter(bloomMightContain(col("l_orderkey")))
      .drop("bloom")

  /** Bloom-filtered fact⊗fact join — the EXPLICIT form of runtime
    * semi-join reduction (what `spark.sql.optimizer.runtime.bloomFilter`
    * injects automatically for shuffle joins): the selective side's join
    * keys fold into a 2^16-bit Bloom bitset by one partial-agg, the
    * 8 KiB array row broadcasts onto the fact scan, and each fact row
    * tests k=3 bit positions BEFORE the join shuffle — only ~1% of
    * lineitem ever shuffles. False positives are removed by the exact
    * equi-join behind the filter, so the result is provably the plain
    * join — which is exactly what the oracle declares. At 100 TB the
    * bitset scales by m, not fact rows: a 10^8-key build side fits a
    * 2^30-bit / 128 MiB filter while the fact side still never shuffles
    * un-pruned rows. */
  private val bloomJoin: Q = (s, d) =>
    bloomPrefilter(s, d)
      .join(bloomSel(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc)

  val queries: Map[String, Q] = Map(
    "q_join_inner_hash" -> innerHash,
    "q_join_broadcast"  -> broadcastJoin,
    "q_join_left"       -> leftJoin,
    "q_join_full"       -> fullJoin,
    "q_join_semi"       -> semiJoin,
    "q_join_anti"       -> antiJoin,
    "q_join_cross"      -> crossJoin,
    "q_join_theta"      -> thetaJoin,
    "q_join_interval"   -> intervalJoin,
    "q_join_interval_binned" -> intervalJoinBinned,
    "q_join_asof"       -> asofJoin,
    "q_join_salted"     -> saltedSkewJoin,
    "q_join_bloom"      -> bloomJoin,
  )

  val oracle: Map[String, String] = Map(
    "q_join_inner_hash" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey ASC""".stripMargin,
    "q_join_broadcast" ->
      """SELECT l_orderkey, l_linenumber, p_brand, p_type, l_quantity
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey ASC, l_linenumber ASC, p_brand ASC, p_type ASC, l_quantity ASC""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,
    "q_join_full" ->
      """WITH users AS (
        |  SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id)
        |SELECT c_custkey, user_id, n_events
        |FROM customer FULL OUTER JOIN users ON c_custkey = user_id
        |ORDER BY COALESCE(c_custkey, user_id) ASC, c_custkey ASC NULLS FIRST""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey ASC""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey ASC""".stripMargin,
    "q_join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey ASC, n_nationkey ASC""".stripMargin,
    "q_join_theta" ->
      """SELECT l_orderkey, l_linenumber, l_partkey,
        |       FLOOR((l_extendedprice - p_retailprice) * 10000 + 0.5) / 10000 AS over_retail
        |FROM lineitem JOIN part
        |  ON l_partkey = p_partkey AND l_extendedprice > p_retailprice
        |ORDER BY l_orderkey ASC, l_linenumber ASC, l_partkey ASC, over_retail ASC""".stripMargin,
    "q_join_interval" ->
      """WITH e AS (SELECT event_id, user_id, date_trunc('milliseconds', ts) AS ts
        |           FROM events)
        |SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
        |       date_trunc('second', a.ts) AS a_ts,
        |       date_trunc('second', b.ts) AS b_ts
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |ORDER BY a.user_id ASC, a_id ASC, b_id ASC""".stripMargin,
    // Same function, different physical plan — sharing the oracle
    // makes the driver hash-compare the binned ≡ plain proof.
    "q_join_interval_binned" ->
      """WITH e AS (SELECT event_id, user_id, date_trunc('milliseconds', ts) AS ts
        |           FROM events)
        |SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
        |       date_trunc('second', a.ts) AS a_ts,
        |       date_trunc('second', b.ts) AS b_ts
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id
        | AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |ORDER BY a.user_id ASC, a_id ASC, b_id ASC""".stripMargin,
    "q_join_asof" ->
      """WITH e AS (SELECT event_id, user_id, date_trunc('milliseconds', ts) AS ts
        |           FROM events),
        |j AS (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |         ROW_NUMBER() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        |SELECT event_id, user_id, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate
        |FROM j WHERE rn = 1
        |ORDER BY event_id ASC""".stripMargin,
    // The salt is invisible in the result — the oracle is the PLAIN
    // join, which is the point: salting must not change semantics.
    "q_join_salted" ->
      s"""SELECT c_mktsegment, event_type, COUNT(*) AS n,
         |       ${Det.sqlDsum("value")} AS sum_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment, event_type
         |ORDER BY c_mktsegment ASC, event_type ASC""".stripMargin,
    // the plain join IS the oracle: the bloom pre-filter is
    // semantically transparent (no false negatives by construction,
    // false positives removed by the exact join behind it)
    "q_join_bloom" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate >= '1995-03-01' AND o_orderdate < '1995-04-01'
        |ORDER BY l_orderkey ASC, l_linenumber ASC""".stripMargin,
  )
}
