package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Det
import graft.io.Tables

/** Multimodal-column plumbing (driver mandate): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, with real
  * Spark-side plumbing (schema, partitioning, batch shape) and a
  * clearly-marked STUB where a codec library would decode bytes.
  *
  * The fixture set has no binary table, so `withBinaryPayload` derives a
  * deterministic binary column from `documents.text` (UTF-8 bytes) — at
  * deployment this column is the real media payload read from parquet.
  *
  * Decode runs through [[decodeBatched]]: a `mapPartitions` pipeline
  * that drains each partition in fixed-size batches (the shape a
  * vectorized codec or model server wants), applies a pluggable
  * `Array[Byte] => MediaMeta` decoder, and re-attaches results
  * positionally. The default [[stubDecoder]] is a deterministic fake
  * (length/byte arithmetic) because no image/audio codec ships in this
  * environment — swap it for a real codec at deployment; the Spark
  * plumbing around it (encoders, batching, schema) is real and tested.
  *
  * Scale notes (100 TB): payloads never shuffle — decode is
  * partition-local; only the small typed metadata struct flows into
  * joins/aggregations. Batch size bounds per-task memory regardless of
  * payload size; at cluster scale pair with
  * `spark.sql.files.maxPartitionBytes` so a task holds ~one batch of
  * payloads at a time.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Typed metadata extracted from a media payload. */
  case class MediaMeta(format: String, width: Int, height: Int, nBytes: Long)

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Attach the opaque binary payload column (deterministic stand-in:
    * UTF-8 bytes of the text). */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** STUB decoder — deterministic fake in place of a real codec.
    * A production build replaces this with e.g. a JPEG header parse;
    * everything around it stays unchanged. */
  def stubDecoder(payload: Array[Byte]): MediaMeta = {
    val n = payload.length.toLong
    val fmt = (n % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    // ??? <- real codec call goes here; fake dims are pure arithmetic
    MediaMeta(fmt, (n % 640).toInt + 1, (n % 480).toInt + 1, n)
  }

  /** Partition-local batched decode: drains rows in `batchSize` groups,
    * decodes each batch (the hook point for a vectorized codec / model
    * server call), and emits (key, meta) rows. */
  def decodeBatched(df: DataFrame, keyCol: String, payloadCol: String,
      batchSize: Int = 64,
      decoder: Array[Byte] => MediaMeta = stubDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] = df
      .select(col(keyCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one decoder invocation region per batch — a vectorized codec
        // would take the whole Seq at once
        batch.map { case (k, bytes) => (k, decoder(bytes)) }
      }
    }.toDF(keyCol, "meta")
      .select(col(keyCol), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.nBytes").as("n_bytes"))
  }

  /** Declared query: payload metadata via the pure-expression path (the
    * same arithmetic as the stub decoder, so it is oracle-expressible;
    * MultimodalSpec asserts the mapPartitions path agrees with it). */
  private val metaQ: Q = (s, d) => {
    val withPayload = withBinaryPayload(Tables.documents(s, d))
    withPayload
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .select(col("doc_id"),
        when(pmod(col("n_bytes"), lit(3)) === 0, "png")
          .when(pmod(col("n_bytes"), lit(3)) === 1, "jpeg")
          .otherwise("webp").as("format"),
        (pmod(col("n_bytes"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("n_bytes"), lit(480)) + 1).cast("int").as("height"),
        col("n_bytes"))
      .orderBy(col("doc_id").asc)
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta" -> metaQ,
  )

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes
        |  FROM documents)
        |SELECT doc_id,
        |       CASE WHEN n_bytes % 3 = 0 THEN 'png'
        |            WHEN n_bytes % 3 = 1 THEN 'jpeg'
        |            ELSE 'webp' END AS format,
        |       CAST(n_bytes % 640 + 1 AS INT) AS width,
        |       CAST(n_bytes % 480 + 1 AS INT) AS height,
        |       n_bytes
        |FROM b
        |ORDER BY doc_id ASC""".stripMargin,
  )
}
