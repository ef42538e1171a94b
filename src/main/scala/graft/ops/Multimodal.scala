package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Det
import graft.io.Tables

/** Multimodal-column plumbing (driver mandate): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, decoded in
  * partition-local batches.
  *
  * REAL codecs, zero new deps: the JDK's own `javax.imageio` writes and
  * reads PNG and JPEG (headless-safe). The fixture set has no binary
  * table, so [[withImagePayload]] renders a real tiny image per
  * document — PNG for even doc_id, JPEG for odd — whose dimensions are
  * fixed arithmetic in the row's own `n_chars` ([[genW]]/[[genH]]) and
  * whose pixels are a deterministic hash pattern. Because the dims are
  * SQL-predictable from `documents.n_chars` while the bytes are genuine
  * codec output, the DuckDB oracle compare proves the real
  * encode→decode round-trip: the decoded width/height/format must land
  * exactly on the generator's arithmetic.
  *
  * Decode runs through [[decodeBatched]]: a `mapPartitions` pipeline
  * that drains each partition in fixed-size batches (the shape a
  * vectorized codec or model server wants), applies `Array[Byte] =>
  * MediaMeta`, and re-attaches results positionally. The default
  * [[imageDecoder]] is a real header parse — `ImageIO`'s reader
  * negotiation sniffs the container magic, then reads width/height
  * from the header WITHOUT decoding the raster (the production probe
  * shape). Unknown bytes degrade to ("unknown", -1, -1), never throw.
  *
  * Scale notes (100 TB): payloads never shuffle — render, decode and
  * resize are partition-local; only the small typed metadata struct
  * flows into joins/aggregations. Batch size bounds per-task memory
  * regardless of payload size; at cluster scale pair with
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

  /** Generator dims — the single source of truth shared by
    * [[renderImage]], the declared queries' oracles, and the specs.
    * Kept small so a fixture render is a few KB, and chosen so the
    * width/height domains differ (a transposed decode cannot pass). */
  private[graft] def genW(nChars: Long): Int = (nChars % 64).toInt + 8
  private[graft] def genH(nChars: Long): Int = (nChars % 48).toInt + 8
  private[graft] val SqlGenW = "CAST(n_chars % 64 + 8 AS INT)"
  private[graft] val SqlGenH = "CAST(n_chars % 48 + 8 AS INT)"

  /** ImageIO's default stream cache is a TEMP FILE per encode/decode
    * call — one disk round-trip per image. Flip it to the in-memory
    * cache once per executor JVM before any codec work; idempotent and
    * thread-safe (a plain static flag write in the JDK). Measured at
    * sf0.1 this is most of the difference between a ~1 ms/image and a
    * ~0.1 ms/image pipeline. */
  private lazy val memCachedIO: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** One real image: PNG (even doc_id) or JPEG (odd), genW×genH,
    * pixels a deterministic integer hash of (doc_id, x, y). */
  private[graft] def renderImage(docId: Long, nChars: Long): Array[Byte] = {
    memCachedIO
    val (w, h) = (genW(nChars), genH(nChars))
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((docId * 1315423911L + x * 2654435761L +
          y * 97531L) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, if (docId % 2 == 0) "png" else "jpg", bos)
    bos.toByteArray
  }

  /** `(doc_id, payload)` with REAL image bytes, rendered in the same
    * partition-local batched shape the decode path drains — the
    * fixture stand-in for reading a parquet binary column. */
  def withImagePayload(docs: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      // The one-file fixture arrives as ONE input split, which would
      // run every codec invocation on a single core (the docTokens
      // precedent); key by doc_id so downstream per-doc joins reuse
      // the clustering. On a real multi-file media lake the input
      // splits already provide the fan-out and this pin is a no-op
      // cost: one shuffle of (id, n_chars) pairs, never payload bytes.
      .repartition(spark.sessionState.conf.numShufflePartitions, col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map {
        case (id, nc) => (id, renderImage(id, nc))
      }))
      .toDF("doc_id", "payload")
  }

  /** REAL image decode — container sniff + header-only dimension read
    * via the JDK's ImageIO reader negotiation. The raster is never
    * decoded (a metadata probe over 100 TB of media must not be), and
    * undecodable bytes degrade to ("unknown", -1, -1) instead of
    * failing the partition. */
  def imageDecoder(payload: Array[Byte]): MediaMeta = {
    memCachedIO
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) MediaMeta("unknown", -1, -1, payload.length.toLong)
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          MediaMeta(r.getFormatName.toLowerCase,
            r.getWidth(0), r.getHeight(0), payload.length.toLong)
        } finally r.dispose()
      }
    } catch {
      // NonFatal, not just IOException: JDK ImageReaders throw
      // RuntimeExceptions on malformed-but-sniffable headers, and the
      // degrade contract must hold for arbitrary corpus bytes
      case scala.util.control.NonFatal(_) =>
        MediaMeta("unknown", -1, -1, payload.length.toLong)
    } finally iis.close()
  }

  /** Partition-local batched decode: drains rows in `batchSize` groups,
    * decodes each batch (the hook point for a vectorized codec / model
    * server call), and emits (key, meta) rows. */
  def decodeBatched(df: DataFrame, keyCol: String, payloadCol: String,
      batchSize: Int = 64,
      decoder: Array[Byte] => MediaMeta = imageDecoder): DataFrame = {
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

  /** Resize target box — fit-inside, never upscale. Smaller than every
    * generator dim range on at least one axis, so real downscaling
    * happens for every fixture image. Shared with the oracle SQL. */
  private[graft] val ResizeBoxW = 32
  private[graft] val ResizeBoxH = 24

  /** REAL image resize: decode, aspect-preserving fit into the target
    * box (scale = min(boxW/w, boxH/h, 1) — floor to pixels, min 1),
    * re-encode as PNG (resize pipelines normalize the container). The
    * integer dim arithmetic is plain IEEE double ops, so the oracle
    * can predict the output dims from `n_chars` alone. */
  def imageResizer(payload: Array[Byte],
      boxW: Int = ResizeBoxW, boxH: Int = ResizeBoxH): Array[Byte] = {
    memCachedIO
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    val scale = math.min(
      math.min(boxW.toDouble / img.getWidth, boxH.toDouble / img.getHeight),
      1.0)
    val rw = math.max(math.floor(img.getWidth * scale).toInt, 1)
    val rh = math.max(math.floor(img.getHeight * scale).toInt, 1)
    val out = new java.awt.image.BufferedImage(
      rw, rh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try g.drawImage(img, 0, 0, rw, rh, null) finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Partition-local batched resize: binary → binary, payloads never
    * shuffle; same batch shape as [[decodeBatched]]. */
  def resizeBatched(df: DataFrame, keyCol: String, payloadCol: String,
      batchSize: Int = 64,
      resizer: Array[Byte] => Array[Byte] = imageResizer(_)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map {
        case (k, bytes) => (k, resizer(bytes))
      }))
      .toDF(keyCol, "resized")
  }

  /** Declared query: REAL metadata of the real payloads — render →
    * ImageIO header decode, all partition-local. The oracle predicts
    * format from doc_id parity and dims from the generator arithmetic;
    * a hash match therefore certifies that genuine PNG/JPEG bytes
    * round-tripped through a genuine decoder. (`n_bytes` is real codec
    * output length — compressed size is not SQL-predictable, so it
    * stays out of the declared projection; the spec asserts it > 0.) */
  private val metaQ: Q = (s, d) =>
    decodeBatched(withImagePayload(Tables.documents(s, d)),
      "doc_id", "payload")
      .select(col("doc_id"), col("format"), col("width"), col("height"))
      .orderBy(col("doc_id").asc)

  /** Declared query: REAL resize — render → scale into the
    * [[ResizeBoxW]]×[[ResizeBoxH]] box → re-encode → decode the
    * RESIZED bytes. The emitted dims come from decoding the resized
    * image, so the oracle match proves the scaler actually produced an
    * image of the predicted size (and the png container survives its
    * own round-trip). */
  private val resizeQ: Q = (s, d) =>
    decodeBatched(
      resizeBatched(withImagePayload(Tables.documents(s, d)),
        "doc_id", "payload"),
      "doc_id", "resized")
      .select(col("doc_id"), col("format").as("r_format"),
        col("width").as("r_width"), col("height").as("r_height"))
      .orderBy(col("doc_id").asc)

  private val SampleEvery = 4

  /** Animated-GIF generator constants: frame count is SQL-predictable
    * arithmetic in `n_chars` (1..13 — never zero, so the sampled set
    * always holds frame 0), frame dims are small fixed. */
  private[graft] def genFrames(nChars: Long): Int = (nChars % 13).toInt + 1
  private[graft] val SqlGenFrames = "CAST(n_chars % 13 + 1 AS BIGINT)"
  private val FrameW = 8
  private val FrameH = 6

  /** Exact 24-bit solid color of frame `f` — modular arithmetic with
    * an identical SQL form ([[sqlFrameColor]]); both factors keep
    * doc_id·c well under 2^63 at any fixture scale. */
  private[graft] def frameColor(docId: Long, f: Int): Int =
    ((docId * 1315423911L + f * 2654435761L) % 16777216L).toInt
  private val SqlFrameColor =
    "(doc_id * 1315423911 + f * 2654435761) % 16777216"

  /** One REAL animated GIF with [[genFrames]] frames via the JDK's own
    * GIF sequence writer. Each frame is a SOLID color through an
    * explicit 2-entry IndexColorModel — GIF is lossless for paletted
    * images, so the decoded pixel equals [[frameColor]] EXACTLY and
    * the checksum stays SQL-predictable while the container bytes are
    * genuine multi-frame codec output. */
  private[graft] def renderGif(docId: Long, nChars: Long): Array[Byte] = {
    memCachedIO
    val n = genFrames(nChars)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < n) {
      val icm = new java.awt.image.IndexColorModel(8, 2,
        Array(frameColor(docId, f), 0x000000), 0, false, -1,
        java.awt.image.DataBuffer.TYPE_BYTE)
      // raster defaults to index 0 ⇒ the whole frame is frameColor
      val img = new java.awt.image.BufferedImage(FrameW, FrameH,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** `(doc_id, payload)` with REAL multi-frame GIF bytes — the video
    * sibling of [[withImagePayload]], same partition pinning. */
  def withGifPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .repartition(spark.sessionState.conf.numShufflePartitions, col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions(_.grouped(64).flatMap(_.map {
        case (id, nc) => (id, renderGif(id, nc))
      }))
      .toDF("doc_id", "payload")
  }

  /** REAL frame probe: ImageIO reader negotiation sniffs the GIF
    * container, `getNumImages(true)` walks the frame directory for the
    * TRUE frame count, and every [[SampleEvery]]-th frame's raster is
    * actually decoded — the checksum folds decoded pixel (0,0) of each
    * sampled frame. Undecodable bytes degrade to (-1, -1, -1). */
  private[graft] def gifFrameProbe(payload: Array[Byte]): (Long, Long, Long) = {
    memCachedIO
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) (-1L, -1L, -1L)
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = r.getNumImages(true)
          var f = 0
          var sampled = 0L
          var sum = 0L
          while (f < n) {
            if (f % SampleEvery == 0) {
              sum += (r.read(f).getRGB(0, 0) & 0xFFFFFF).toLong
              sampled += 1
            }
            f += 1
          }
          (n.toLong, sampled, sum)
        } finally r.dispose()
      }
    } catch {
      // NonFatal, not just IOException: the JDK GIF reader throws
      // RuntimeExceptions (e.g. ArrayIndexOutOfBounds) on
      // malformed-but-sniffable bytes, and the contract is that
      // undecodable bytes DEGRADE, never fail the task
      case scala.util.control.NonFatal(_) => (-1L, -1L, -1L)
    } finally iis.close()
  }

  /** Declared query: REAL multi-frame decode — render a genuine
    * animated GIF per document, then parse the container back:
    * n_frames from the reader's frame directory, every 4th frame's
    * raster decoded, checksum folded from the decoded pixels. The
    * oracle predicts frame counts and colors from the generator
    * arithmetic, so the hash match certifies a real multi-frame
    * encode→decode round-trip (the q_multimodal_meta pattern, extended
    * from headers to rasters). Payloads never shuffle; the probe is
    * partition-local and batched. */
  private val framesQ: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    withGifPayload(Tables.documents(s, d))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, bytes) =>
        val (n, ns, ck) = gifFrameProbe(bytes)
        (id, n, ns, ck)
      }))
      .toDF("doc_id", "n_frames", "n_sampled", "checksum")
      .orderBy(col("doc_id").asc)
  }

  /** Declared query: feature extraction — decoded meta → a small
    * numeric feature vector (dims normalized by their generator-domain
    * maxima, log-pixel-count), the shape a downstream model join
    * consumes. Real decoded inputs, oracle-predictable algebra. */
  private val featuresQ: Q = (s, d) =>
    metaQ(s, d)
      .select(col("doc_id"),
        Det.r4(col("width").cast("double") / 72.0).as("f_width"),
        Det.r4(col("height").cast("double") / 56.0).as("f_height"),
        Det.r4(log(col("width").cast("double") * col("height") + 1.0))
          .as("f_logpixels"))
      .orderBy(col("doc_id").asc)

  // ------------------------------------------------------------ audio

  /** Typed metadata of an audio payload. */
  case class AudioMeta(format: String, channels: Int, sampleRate: Int,
      bits: Int, nFrames: Long)

  /** Generator frame count — SQL-predictable from `n_chars`, same
    * contract as [[genW]]/[[genH]] for images. */
  private[graft] def genAudioFrames(nChars: Long): Int =
    (nChars % 1000).toInt + 400
  private[graft] val SqlGenAudioFrames = "CAST(n_chars % 1000 + 400 AS BIGINT)"
  private[graft] val AudioRate = 8000

  /** One real RIFF/WAVE payload: PCM16 mono 8 kHz, [[genAudioFrames]]
    * frames of a sine whose frequency derives from doc_id. Encoded by
    * the JDK's own `javax.sound.sampled` WAV writer — a genuine
    * container, not a stand-in. */
  private[graft] def renderWav(docId: Long, nChars: Long): Array[Byte] = {
    val n = genAudioFrames(nChars)
    val freq = 100.0 + (docId % 200)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (12000.0 *
        math.sin(2 * math.Pi * freq * i / AudioRate)).toInt.toShort
      pcm(2 * i) = (v & 0xff).toByte // little-endian PCM16
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      AudioRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio header probe — `AudioSystem` sniffs the container and
    * reads rate/channels/width/frame-count from the WAV header without
    * touching the sample data (the 100 TB metadata-probe shape, like
    * [[imageDecoder]]). Undecodable bytes degrade, never throw. */
  private[graft] def audioDecoder(bytes: Array[Byte]): AudioMeta =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val f = ais.getFormat
      AudioMeta("wav", f.getChannels, f.getSampleRate.toInt,
        f.getSampleSizeInBits, ais.getFrameLength)
    } catch {
      case scala.util.control.NonFatal(_) => AudioMeta("unknown", -1, -1, -1, -1L)
    }

  /** Audio metadata probe over rendered WAV payloads — the audio twin
    * of [[metaQ]]: payloads render and decode partition-local in
    * batches (bytes never shuffle), and because the generator's frame
    * count is arithmetic in `n_chars` while the bytes are genuine
    * RIFF/WAVE, the oracle hash-match proves the real encode→decode
    * round-trip header field by header field. */
  private val audioQ: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions(_.grouped(64).flatMap(_.map { case (id, nc) =>
        (id, audioDecoder(renderWav(id, nc)))
      }))
      .toDF("doc_id", "meta")
      .select(col("doc_id"), col("meta.format").as("format"),
        col("meta.channels").as("channels"),
        col("meta.sampleRate").as("sample_rate"),
        col("meta.bits").as("bits"),
        col("meta.nFrames").as("n_frames"))
      .withColumn("duration_ms", expr(s"n_frames * 1000 div $AudioRate"))
      .orderBy(col("doc_id").asc)
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_audio"    -> audioQ,
    "q_multimodal_meta"     -> metaQ,
    "q_multimodal_resize"   -> resizeQ,
    "q_multimodal_frames"   -> framesQ,
    "q_multimodal_features" -> featuresQ,
  )

  /** Oracle-side resized dims, from the generator arithmetic: the same
    * IEEE double ops as [[imageResizer]] (LEAST/FLOOR/GREATEST). */
  private def sqlResized(axis: String): String = {
    val scale =
      s"LEAST(LEAST($ResizeBoxW.0 / w, $ResizeBoxH.0 / h), 1.0)"
    val src = if (axis == "w") "w" else "h"
    s"GREATEST(CAST(FLOOR($src * $scale) AS INT), 1)"
  }

  val oracle: Map[String, String] = Map(
    // predicts the REAL WAV decode from generator arithmetic: every
    // header field the probe reads must land on the generator's value
    "q_multimodal_audio" ->
      s"""SELECT doc_id,
         |       'wav' AS format,
         |       1 AS channels,
         |       $AudioRate AS sample_rate,
         |       16 AS bits,
         |       $SqlGenAudioFrames AS n_frames,
         |       CAST((n_chars % 1000 + 400) * 1000 // $AudioRate AS BIGINT)
         |         AS duration_ms
         |FROM documents
         |ORDER BY doc_id ASC""".stripMargin,
    "q_multimodal_meta" ->
      s"""SELECT doc_id,
         |       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
         |       $SqlGenW AS width,
         |       $SqlGenH AS height
         |FROM documents
         |ORDER BY doc_id ASC""".stripMargin,
    "q_multimodal_resize" ->
      s"""WITH m AS (
         |  SELECT doc_id, $SqlGenW AS w, $SqlGenH AS h FROM documents)
         |SELECT doc_id,
         |       'png' AS r_format,
         |       ${sqlResized("w")} AS r_width,
         |       ${sqlResized("h")} AS r_height
         |FROM m
         |ORDER BY doc_id ASC""".stripMargin,
    // predicts the REAL multi-frame decode from generator arithmetic:
    // frame count and per-frame palette colors are exact (GIF is
    // lossless for paletted frames), so the hash match proves the
    // container round-trip frame by frame
    "q_multimodal_frames" ->
      s"""WITH fr AS (
         |  SELECT doc_id, $SqlGenFrames AS n_frames FROM documents),
         |s AS (
         |  SELECT doc_id, n_frames,
         |         list_filter(range(0, CAST(n_frames AS INT)),
         |                     f -> f % $SampleEvery = 0) AS sampled
         |  FROM fr)
         |SELECT doc_id, n_frames,
         |       CAST(LEN(sampled) AS BIGINT) AS n_sampled,
         |       CAST(list_aggregate(list_transform(sampled,
         |         f -> $SqlFrameColor), 'sum') AS BIGINT) AS checksum
         |FROM s
         |ORDER BY doc_id ASC""".stripMargin,
    "q_multimodal_features" ->
      s"""WITH m AS (
         |  SELECT doc_id, $SqlGenW AS width, $SqlGenH AS height
         |  FROM documents)
         |SELECT doc_id,
         |       ${Det.sqlR4("CAST(width AS DOUBLE) / 72.0")} AS f_width,
         |       ${Det.sqlR4("CAST(height AS DOUBLE) / 56.0")} AS f_height,
         |       ${Det.sqlR4(
               "LN(CAST(width AS DOUBLE) * height + 1.0)")} AS f_logpixels
         |FROM m
         |ORDER BY doc_id ASC""".stripMargin,
  )
}
