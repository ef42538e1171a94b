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

  /** STUB resize — deterministic byte truncation in place of a real
    * scaler: the "resized" payload is the first `targetW*targetH/8`
    * bytes. A production build swaps in an image scaler; the
    * binary-in/binary-out partition-local batch shape is the point. */
  /** Single source of truth for the stub's output cap — referenced by
    * [[resizeStub]], the declared resize query, and its oracle SQL, so
    * retargeting the stub cannot desynchronize them. */
  private[ops] val ResizeTargetW = 160
  private[ops] val ResizeTargetH = 240
  private[ops] val ResizeCapBytes: Int = ResizeTargetW * ResizeTargetH / 8

  def resizeStub(payload: Array[Byte], targetW: Int = ResizeTargetW,
      targetH: Int = ResizeTargetH): Array[Byte] = {
    val cap = targetW * targetH / 8
    // ??? <- real scaler call goes here
    if (payload.length <= cap) payload else java.util.Arrays.copyOf(payload, cap)
  }

  /** Partition-local batched resize: binary → binary, payloads never
    * shuffle; same batch shape as [[decodeBatched]]. */
  def resizeBatched(df: DataFrame, keyCol: String, payloadCol: String,
      batchSize: Int = 64,
      resizer: Array[Byte] => Array[Byte] = resizeStub(_)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map {
        case (k, bytes) => (k, resizer(bytes))
      }))
      .toDF(keyCol, "resized")
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

  /** Declared query: resize accounting via the expression twin of
    * [[resizeStub]] (cap = [[ResizeCapBytes]]). */
  private val resizeQ: Q = (s, d) =>
    withBinaryPayload(Tables.documents(s, d))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .select(col("doc_id"), col("n_bytes"),
        least(col("n_bytes"), lit(ResizeCapBytes.toLong)).as("resized_bytes"),
        Det.r4(least(col("n_bytes"), lit(ResizeCapBytes.toLong)).cast("double") /
          nullif(col("n_bytes"), lit(0L))).as("scale"))
      .orderBy(col("doc_id").asc)

  private val FrameChars = 64
  private val SampleEvery = 4

  /** Declared query: frame sampling over the payload treated as a
    * fixed-frame "video" (64-char frames of the text stand-in; a real
    * container parser replaces the framing, the sampling algebra stays).
    * Every 4th frame is sampled; the checksum folds the first char code
    * of each sampled frame — deterministic in both engines. */
  private val framesQ: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("n_chars_t", length(col("text")).cast("long"))
      .withColumn("n_frames",
        ceil(col("n_chars_t").cast("double") / FrameChars).cast("long"))
      // guard: sequence(0, -1) generates DESCENDING [0,-1], not empty —
      // an empty doc must sample zero frames, like the oracle's range(0,0)
      .withColumn("sampled",
        expr(s"CASE WHEN n_frames > 0 THEN " +
          s"filter(sequence(0, CAST(n_frames - 1 AS INT)), f -> f % $SampleEvery = 0) " +
          "ELSE CAST(array() AS array<int>) END"))
      .select(col("doc_id"), col("n_frames"),
        size(col("sampled")).cast("long").as("n_sampled"),
        expr(s"aggregate(transform(sampled, " +
          s"f -> CAST(ascii(substring(text, f * $FrameChars + 1, 1)) AS BIGINT)), " +
          "CAST(0 AS BIGINT), (acc, v) -> acc + v)").as("checksum"))
      .orderBy(col("doc_id").asc)

  /** Declared query: feature extraction — meta → a small numeric
    * feature vector (normalized dims + log-bytes), the shape a
    * downstream model join consumes. Stub features, real algebra. */
  private val featuresQ: Q = (s, d) =>
    metaQ(s, d)
      .select(col("doc_id"),
        Det.r4(col("width").cast("double") / 640.0).as("f_width"),
        Det.r4(col("height").cast("double") / 480.0).as("f_height"),
        Det.r4(log(col("n_bytes").cast("double") + 1.0)).as("f_logbytes"))
      .orderBy(col("doc_id").asc)

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta"     -> metaQ,
    "q_multimodal_resize"   -> resizeQ,
    "q_multimodal_frames"   -> framesQ,
    "q_multimodal_features" -> featuresQ,
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
    "q_multimodal_resize" ->
      s"""WITH b AS (
         |  SELECT doc_id, CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes
         |  FROM documents)
         |SELECT doc_id, n_bytes,
         |       LEAST(n_bytes, $ResizeCapBytes) AS resized_bytes,
         |       ${Det.sqlR4(s"CAST(LEAST(n_bytes, $ResizeCapBytes) AS DOUBLE) / NULLIF(n_bytes, 0)")} AS scale
         |FROM b
         |ORDER BY doc_id ASC""".stripMargin,
    "q_multimodal_frames" ->
      s"""WITH f AS (
         |  SELECT doc_id, text,
         |         CAST(CEIL(CAST(LENGTH(text) AS DOUBLE) / $FrameChars) AS BIGINT)
         |           AS n_frames
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, text, n_frames,
         |         list_filter(range(0, CAST(n_frames AS INT)),
         |                     f -> f % $SampleEvery = 0) AS sampled
         |  FROM f)
         |SELECT doc_id, n_frames,
         |       CAST(LEN(sampled) AS BIGINT) AS n_sampled,
         |       CAST(list_aggregate(list_transform(sampled,
         |         f -> CAST(ORD(SUBSTRING(text, CAST(f * $FrameChars + 1 AS INT), 1))
         |                   AS BIGINT)), 'sum') AS BIGINT) AS checksum
         |FROM s
         |ORDER BY doc_id ASC""".stripMargin,
    "q_multimodal_features" ->
      s"""WITH b AS (
         |  SELECT doc_id, CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, CAST(n_bytes % 640 + 1 AS INT) AS width,
         |         CAST(n_bytes % 480 + 1 AS INT) AS height, n_bytes
         |  FROM b)
         |SELECT doc_id,
         |       ${Det.sqlR4("CAST(width AS DOUBLE) / 640.0")} AS f_width,
         |       ${Det.sqlR4("CAST(height AS DOUBLE) / 480.0")} AS f_height,
         |       ${Det.sqlR4("LN(CAST(n_bytes AS DOUBLE) + 1.0)")} AS f_logbytes
         |FROM m
         |ORDER BY doc_id ASC""".stripMargin,
  )
}
