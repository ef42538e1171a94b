package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables — the co-located-join tool for repeated fact⊗fact
  * joins at 100 TB.
  *
  * Writing both join sides bucketed (and sorted) by the join key with
  * the same bucket count lets Spark plan a sort-merge join with NO
  * shuffle exchange on either side: each task reads matching bucket
  * files directly. At cluster scale this converts the dominant cost of
  * a repeated keyed join (two full shuffles per run) into a one-time
  * cost at write time. ScaleSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write a table bucketed+sorted by `key` into the session catalog's
    * warehouse. Bucket count should be sized so a bucket fits an
    * executor's memory at target scale (e.g. 100 TB / 2048 buckets). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With equal
    * bucket counts the planner elides both shuffles (and both sorts,
    * when sortBy matches). */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
