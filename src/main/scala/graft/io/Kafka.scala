package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType

/** Kafka transport builders — the reference's relay/consumer transport
  * (pgshovel's relay publishes ordered protobuf messages to a topic per
  * replication set; consumers read, decode, validate).
  *
  * Spark-first: `readStream.format("kafka")` with explicit JSON payload
  * decoding replaces the hand-rolled consumer loop; ordering within a
  * topic-partition is preserved exactly as the reference relies on
  * per-publisher ordering. `maxOffsetsPerTrigger` is the PgQ tick-batch
  * bound. Downstream: feed [[graft.streaming.Validate.validateStream]]
  * and the CDC compaction operators.
  *
  * NOTE: the spark-sql-kafka connector jar does not ship in this
  * harness (zero egress), so these builders are exercised for
  * construction only — options follow the public Spark-Kafka contract
  * and run unchanged where the connector is on the classpath.
  */
object Kafka {

  /** Stream of decoded change messages from a topic. `schema` describes
    * the JSON payload (the reference's protobuf-decoded mutation). */
  def readChanges(spark: SparkSession, bootstrap: String, topic: String,
      schema: StructType, maxOffsetsPerTrigger: Long = 100000L): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
      // metadata columns are underscore-prefixed so payload fields named
      // "timestamp"/"offset"/etc. cannot collide; _decode_ok flags rows
      // whose JSON failed to parse (from_json yields a null struct) so
      // callers can route them to a dead-letter sink instead of silently
      // processing an all-null mutation
      .select(col("key").cast("string").as("_msg_key"),
        from_json(col("value").cast("string"), schema).as("m"),
        col("topic").as("_topic"), col("partition").as("_partition"),
        col("offset").as("_offset"), col("timestamp").as("_kafka_ts"))
      .withColumn("_decode_ok", col("m").isNotNull)
      .select(col("_msg_key"), col("m.*"), col("_topic"), col("_partition"),
        col("_offset"), col("_kafka_ts"), col("_decode_ok"))

  /** Publish a keyed changelog to a topic (the relay's output side).
    * Exactly-once on top of at-least-once: pair with checkpointing and
    * idempotent/compacted topics keyed by entity. */
  def writeChanges(df: DataFrame, bootstrap: String, topic: String,
      checkpoint: String, keyCol: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.select(col(keyCol).cast("string").as("key"),
        to_json(struct(df.columns.map(col): _*)).as("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
}
