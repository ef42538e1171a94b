package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Sinks — the reference's publish/apply side recast for a lakehouse.
  *
  * pgshovel's relay publishes ordered batches and acknowledges
  * (`pgq.finish_batch`) only after the transport accepts them; its
  * consumers apply mutations idempotently by primary key. The Spark
  * equivalents: partitioned parquet batch writes, and a `foreachBatch`
  * streaming sink whose per-epoch overwrite is idempotent — replaying
  * an epoch after a crash rewrites the same files, with the streaming
  * checkpoint playing the role of finish_batch.
  */
object Sinks {

  /** Batch write, hive-partitioned. Partition columns should be
    * low-cardinality (date/hour buckets, not entity keys) so file
    * counts stay sane at 100 TB; pair with AQE-coalesced shuffles or an
    * explicit repartition on the partition columns to avoid
    * small-files. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Idempotent streaming sink: each micro-batch overwrites its own
    * epoch directory, so redelivered epochs (crash between write and
    * checkpoint commit) converge to the same state — exactly-once
    * output on top of at-least-once execution. */
  def epochParquetSink(ds: Dataset[Row], path: String,
      checkpoint: String): DataStreamWriter[Row] =
    ds.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("10 seconds"))
      .foreachBatch { (batch: Dataset[Row], epochId: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/epoch=$epochId")
      }

  /** Compact-and-apply: upsert a compacted delta set into a keyed base
    * table path (read → merge → rewrite). The batch-mode equivalent of
    * the reference's replication target apply; at scale this is the
    * pattern a table format (Delta/Iceberg MERGE) implements natively,
    * expressed here with plain parquet. */
  def applyUpsert(base: DataFrame, deltas: DataFrame, key: String,
      outPath: String): Unit = {
    val cols = base.columns
    val merged = base.as("b")
      .join(deltas.as("d"), base(key) === deltas(key), "full")
      .select(cols.map(c =>
        coalesce(col(s"d.$c"), col(s"b.$c")).as(c)): _*)
    merged.write.mode("overwrite").parquet(outPath)
  }
}
