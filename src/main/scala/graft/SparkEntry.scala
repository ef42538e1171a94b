package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every operator module's declared queries;
  * `oracleSql` the paired DuckDB statements (bare table names — the
  * driver binds them to the same parquet files). Keys are SURVEY.md §2's
  * inventory.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] = Seq(
    (Relational.queries, Relational.oracle),
    (Joins.queries, Joins.oracle),
    (Aggregates.queries, Aggregates.oracle),
    (Windows.queries, Windows.oracle),
    (Cdc.queries, Cdc.oracle),
    (Scalars.queries, Scalars.oracle),
    (StreamingOps.queries, StreamingOps.oracle),
    (Events.queries, Events.oracle),
    (Text.queries, Text.oracle),
    (Dedup.queries, Dedup.oracle),
    (Vectors.queries, Vectors.oracle),
    (Multimodal.queries, Multimodal.oracle),
    (Extras.queries, Extras.oracle),
    (Sampling.queries, Sampling.oracle),
    (Pack.queries, Pack.oracle),
    (Layout.queries, Layout.oracle),
    (Pipeline.queries, Pipeline.oracle),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shape aggregate: scan → filter → hash-agg → sort, e2e. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
