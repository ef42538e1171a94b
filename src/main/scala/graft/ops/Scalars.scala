package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Det
import graft.io.Tables

/** Scalar-function kernels: string / date / math / conditional / array /
  * json / higher-order / explode / pivot (SURVEY.md §2.G).
  *
  * Everything here is a built-in Catalyst expression — whole-stage
  * codegen'd, no UDFs (a UDF would block codegen and pushdown for zero
  * gain). Higher-order functions (`transform`/`filter`/`aggregate`) run
  * the lambda inside codegen too.
  *
  * Cross-engine notes: libm functions (ln/exp/pow) can differ by 1 ulp
  * between JVM and C++ — outputs go through Det.r4 (boundary probability
  * ~1e-11/row, accepted); sqrt is IEEE-exact; year/month/day are cast to
  * BIGINT on the Spark side to match DuckDB EXTRACT.
  */
object Scalars {
  type Q = (SparkSession, String) => DataFrame

  /** String kernel over part names. */
  private val strFuncs: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        trim(concat(lit("  "), col("p_type"), lit(" "))).as("trimmed"),
        substring(col("p_name"), 1, 8).as("sub8"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        length(col("p_name")).cast("long").as("len"),
        expr("replace(p_name, ' ', '_')").as("replaced"),
        lpad(col("p_brand"), 12, "#").as("padded"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"))
      .orderBy(col("p_partkey").asc)

  /** Date kernel over order dates. */
  private val dateFuncs: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since"),
        last_day(col("o_orderdate")).cast("date").as("month_end"))
      .orderBy(col("o_orderkey").asc)

  /** Math kernel over lineitem measures. sqrt is IEEE-exact; x*x is used
    * for the square (pow() routes differ across libm). */
  private val mathFuncs: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        Det.r4(abs(col("l_extendedprice") - lit(50000.0))).as("abs_dev"),
        ceil(col("l_extendedprice")).cast("long").as("ceiled"),
        floor(col("l_extendedprice")).cast("long").as("floored"),
        Det.r4(sqrt(col("l_extendedprice"))).as("sq_root"),
        Det.r4(col("l_discount") * col("l_discount")).as("disc_sq"),
        Det.r4(log(col("l_extendedprice") + lit(1.0))).as("log_price"),
        Det.r4(exp(col("l_discount"))).as("exp_disc"),
        Det.r4(pmod(col("l_extendedprice"), lit(97.0))).as("mod97"))
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
        col("l_extendedprice").asc)

  /** Conditional kernel: CASE WHEN / coalesce / nullif / greatest /
    * least over customer balances. */
  private val condFuncs: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
        when(col("c_acctbal") < 0, lit("overdrawn"))
          .when(col("c_acctbal") < 5000, lit("standard"))
          .otherwise(lit("premium")).as("tier"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")),
          lit("OTHER")).as("segment"),
        greatest(col("c_acctbal"), lit(0.0)).as("floored_bal"),
        least(col("c_acctbal"), lit(9999.99)).as("capped_bal"))
      .orderBy(col("c_custkey").asc)

  /** Array kernel over embeddings — scalar outputs only (array-typed
    * output columns hash differently across engines' result readers). */
  private val arrayFuncs: Q = (s, d) =>
    Tables.embeddings(s, d)
      .withColumn("emb", col("embedding").cast("array<double>"))
      .select(col("vec_id"),
        size(col("emb")).cast("long").as("dim"),
        Det.r4(element_at(col("emb"), 1)).as("first_val"),
        Det.r4(element_at(col("emb"), -1)).as("last_val"),
        Det.r4(aggregate(slice(col("emb"), 1, 8), lit(0.0), _ + _))
          .as("head8_sum"))
      .orderBy(col("vec_id").asc)

  /** Table-generating explode: tokenize text → per-(doc, token) counts.
    * At 100 TB explode is partition-local (no shuffle); the count is the
    * only shuffle, keyed by (doc_id, word). */
  private val explodeQ: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("doc_id").asc, col("word").asc)

  /** Map + JSON kernel: the reference's semi-structured payload path
    * (events.props is a JSON text column). Both the path-extract and the
    * full map parse are shown to agree. */
  private val mapJsonFuncs: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_json"),
        element_at(from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType)), "k").as("k_map"))
      .orderBy(col("event_id").asc)

  /** Higher-order lambdas over the embedding vector: L2 norm via
    * transform+aggregate, positive-component count via filter. */
  private val higherOrder: Q = (s, d) =>
    Tables.embeddings(s, d)
      .withColumn("emb", col("embedding").cast("array<double>"))
      .select(col("vec_id"),
        Det.r4(sqrt(aggregate(transform(col("emb"), x => x * x),
          lit(0.0), _ + _))).as("l2_norm"),
        size(filter(col("emb"), _ > 0)).cast("long").as("n_positive"),
        Det.r4(aggregate(col("emb"), lit(0.0), _ + _)).as("sum_all"))
      .orderBy(col("vec_id").asc)

  /** Pivot: event counts per user × fixed type list. Fixed value list →
    * single-pass pivot (no distinct-values job); absent cells filled 0
    * to match conditional-aggregation semantics. */
  private val pivotQ: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0)
      .orderBy(col("user_id").asc)

  val queries: Map[String, Q] = Map(
    "q_str_funcs"     -> strFuncs,
    "q_date_funcs"    -> dateFuncs,
    "q_math_funcs"    -> mathFuncs,
    "q_cond_funcs"    -> condFuncs,
    "q_array_funcs"   -> arrayFuncs,
    "q_explode"       -> explodeQ,
    "q_map_json_funcs"-> mapJsonFuncs,
    "q_higher_order"  -> higherOrder,
    "q_pivot"         -> pivotQ,
  )

  val oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey,
        |       UPPER(p_name) AS up,
        |       LOWER(p_brand) AS lo,
        |       TRIM('  ' || p_type || ' ') AS trimmed,
        |       SUBSTRING(p_name, 1, 8) AS sub8,
        |       CONCAT_WS('|', p_brand, p_type) AS joined,
        |       LENGTH(p_name) AS len,
        |       REPLACE(p_name, ' ', '_') AS replaced,
        |       LPAD(p_brand, 12, '#') AS padded,
        |       REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word
        |FROM part
        |ORDER BY p_partkey ASC""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |       EXTRACT(YEAR FROM o_orderdate) AS y,
        |       EXTRACT(MONTH FROM o_orderdate) AS m,
        |       EXTRACT(DAY FROM o_orderdate) AS dom,
        |       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |       CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS days_since,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end
        |FROM orders
        |ORDER BY o_orderkey ASC""".stripMargin,
    "q_math_funcs" ->
      s"""SELECT l_orderkey, l_linenumber, l_extendedprice,
         |       ${Det.sqlR4("ABS(l_extendedprice - 50000.0)")} AS abs_dev,
         |       CAST(CEIL(l_extendedprice) AS BIGINT) AS ceiled,
         |       CAST(FLOOR(l_extendedprice) AS BIGINT) AS floored,
         |       ${Det.sqlR4("SQRT(l_extendedprice)")} AS sq_root,
         |       ${Det.sqlR4("l_discount * l_discount")} AS disc_sq,
         |       ${Det.sqlR4("LN(l_extendedprice + 1.0)")} AS log_price,
         |       ${Det.sqlR4("EXP(l_discount)")} AS exp_disc,
         |       ${Det.sqlR4("MOD(l_extendedprice, 97.0)")} AS mod97
         |FROM lineitem
         |ORDER BY l_orderkey ASC, l_linenumber ASC, l_extendedprice ASC""".stripMargin,
    "q_cond_funcs" ->
      """SELECT c_custkey,
        |       CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |            WHEN c_acctbal < 5000 THEN 'standard'
        |            ELSE 'premium' END AS tier,
        |       COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment,
        |       GREATEST(c_acctbal, 0.0) AS floored_bal,
        |       LEAST(c_acctbal, 9999.99) AS capped_bal
        |FROM customer
        |ORDER BY c_custkey ASC""".stripMargin,
    "q_array_funcs" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
         |SELECT vec_id,
         |       CAST(LEN(emb) AS BIGINT) AS dim,
         |       ${Det.sqlR4("emb[1]")} AS first_val,
         |       ${Det.sqlR4("emb[-1]")} AS last_val,
         |       ${Det.sqlR4("list_aggregate(emb[1:8], 'sum')")} AS head8_sum
         |FROM e
         |ORDER BY vec_id ASC""".stripMargin,
    "q_explode" ->
      """SELECT doc_id, word, COUNT(*) AS n
        |FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word
        |      FROM documents)
        |WHERE LENGTH(word) > 0
        |GROUP BY doc_id, word
        |ORDER BY doc_id ASC, word ASC""".stripMargin,
    "q_map_json_funcs" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_json,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_map
        |FROM events
        |ORDER BY event_id ASC""".stripMargin,
    "q_higher_order" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
         |SELECT vec_id,
         |       ${Det.sqlR4("SQRT(list_aggregate(list_transform(emb, x -> x * x), 'sum'))")} AS l2_norm,
         |       CAST(LEN(list_filter(emb, x -> x > 0)) AS BIGINT) AS n_positive,
         |       ${Det.sqlR4("list_aggregate(emb, 'sum')")} AS sum_all
         |FROM e
         |ORDER BY vec_id ASC""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |       COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
        |       COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
        |       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |       COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |       COUNT(*) FILTER (WHERE event_type = 'view')     AS view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id ASC""".stripMargin,
  )
}
