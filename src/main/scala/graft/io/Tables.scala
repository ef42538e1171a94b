package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Catalog of named parquet sources under a scale-factor directory.
  *
  * Reference analog: pgshovel's "replication set" — a named config of
  * which tables/columns are captured (public pgshovel
  * `configurations.proto`, `TableConfiguration`). Here the catalog is
  * schema-first: Spark infers `StructType` from the parquet footer, and
  * Catalyst prunes columns/predicates down to the scan, which is the
  * Spark-native equivalent of capture-time column configuration.
  *
  * Scale note (100 TB): `spark.read.parquet` over a directory tree of
  * many files partitions by file/row-group automatically
  * (`spark.sql.files.maxPartitionBytes`); nothing here assumes a single
  * file. For partitioned lakes, the same call picks up hive-style
  * partition columns and enables static/dynamic partition pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Format-agnostic loader for non-parquet lake layouts. CSV/JSON
    * should always be read with an explicit schema: inference scans the
    * data twice and guesses types — never acceptable on a 100 TB feed.
    * TablesSpec round-trips parquet → csv/json → DataFrame. */
  def load(spark: SparkSession, path: String, format: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val withSchema = schema.fold(r)(r.schema)
    format match {
      case "csv"  => withSchema.option("header", "true").load(path)
      case _      => withSchema.load(path)
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp. Read it as a raw long (legacy conf) and
    * convert to a µs timestamp (`timestamp_micros(ns div 1000)`) so the
    * rest of the engine sees a plain TimestampType column. DuckDB reads
    * the same file natively at ns — truncate to millisecond in both
    * engines before comparing (see [[graft.Det.ets]]). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _        => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
