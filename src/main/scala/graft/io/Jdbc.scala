package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC snapshot + incremental readers — the reference's origin-database
  * side (pgshovel bootstraps a consistent copy from Postgres and then
  * tails changes; public pgshovel `utilities/postgresql.py` manages the
  * connection, `snapshot` the consistent read).
  *
  * Spark-first shape: `spark.read.jdbc` with `partitionColumn` range
  * splits — N executors each pull one key range with server-side
  * cursors (`fetchsize`), so a 100 TB snapshot parallelizes without any
  * coordinator beyond the driver planning ranges. Incremental pulls are
  * the same read with a lower bound on the cursor column, feeding the
  * CDC compaction operators (graft.ops.Cdc).
  *
  * The harness has no network database, so JdbcSpec executes both
  * readers against an embedded Derby (on the Spark classpath): write a
  * table over JDBC, read it back range-partitioned, diff against the
  * parquet twin.
  */
object Jdbc {

  /** Consistent parallel snapshot of one table, split by a numeric key.
    *
    * @param bounds  (min, max) of `partitionColumn` — pass precomputed
    *                stats to avoid the extra min/max roundtrip.
    */
  def snapshot(spark: SparkSession, url: String, table: String,
      partitionColumn: String, bounds: (Long, Long), numPartitions: Int,
      fetchSize: Int = 10000,
      props: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", bounds._1)
      .option("upperBound", bounds._2)
      .option("numPartitions", numPartitions)
      .option("fetchsize", fetchSize)
    props.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  /** Incremental pull: rows past a cursor (e.g. a sequence/txid column),
    * as a pushed-down subquery so the origin database does the filter. */
  def incremental(spark: SparkSession, url: String, table: String,
      cursorColumn: String, lastSeen: Long,
      props: Map[String, String] = Map.empty): DataFrame = {
    val sub = s"(SELECT * FROM $table WHERE $cursorColumn > $lastSeen) AS t"
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", sub)
    props.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }.load()
  }
}
