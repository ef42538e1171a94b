package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.io.Tables

/** The REAL-codec multimodal plumbing: payloads must be genuine
  * PNG/JPEG containers, the ImageIO header decode must round-trip the
  * generator's dims, the resize must actually shrink rasters into the
  * target box, and the batched mapPartitions shape must be
  * batch-size- and partition-count-invariant. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("payloads are genuine PNG/JPEG containers (magic bytes)") {
    val rows = Multimodal.withImagePayload(
        Tables.documents(spark, SparkTestSession.sf))
      .select(col("doc_id"), col("payload")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val b = r.getAs[Array[Byte]](1)
      if (id % 2 == 0)
        assert((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
          b(3) == 'G', s"doc $id: not a PNG container")
      else
        assert((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8,
          s"doc $id: not a JPEG container")
    }
  }

  test("header decode round-trips the generator dims and real sizes") {
    val decoded = Multimodal.decodeBatched(
        Multimodal.withImagePayload(
          Tables.documents(spark, SparkTestSession.sf)).repartition(7),
        "doc_id", "payload", batchSize = 13)
    val expected = Tables.documents(spark, SparkTestSession.sf)
      .select(col("doc_id").cast("long").as("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0, "png").otherwise("jpeg")
          .as("format"),
        (pmod(col("n_chars"), lit(64)) + 8).cast("int").as("width"),
        (pmod(col("n_chars"), lit(48)) + 8).cast("int").as("height"))
    val d = decoded.select(col("doc_id"), col("format"), col("width"),
      col("height"))
    assert(d.exceptAll(expected).count() == 0 &&
      expected.exceptAll(d).count() == 0,
      "ImageIO header decode diverged from the generator arithmetic")
    // compressed size is codec output — unpredictable but never empty
    assert(decoded.filter(col("n_bytes") <= 0).count() == 0)
  }

  test("resize fits the box, never upscales, and stays decodable") {
    val meta = Multimodal.queries("q_multimodal_meta")(
      spark, SparkTestSession.sf)
    val resized = Multimodal.queries("q_multimodal_resize")(
      spark, SparkTestSession.sf)
    assert(resized.filter(col("r_format") =!= "png").count() == 0,
      "resize must normalize the container to png")
    assert(resized.filter(col("r_width") > Multimodal.ResizeBoxW ||
      col("r_height") > Multimodal.ResizeBoxH).count() == 0,
      "resized image exceeds the target box")
    val joined = resized.join(meta, "doc_id")
    assert(joined.filter(col("r_width") > col("width") ||
      col("r_height") > col("height")).count() == 0,
      "resize upscaled an image")
  }

  test("undecodable bytes degrade, never throw") {
    val m = Multimodal.imageDecoder("not an image".getBytes("UTF-8"))
    assert(m == Multimodal.MediaMeta("unknown", -1, -1, 12L))
    val empty = Multimodal.imageDecoder(Array.emptyByteArray)
    assert(empty.format == "unknown" && empty.nBytes == 0L)
  }

  test("multi-frame GIF decode: real container, exact frame round-trip") {
    val f = Multimodal.queries("q_multimodal_frames")(spark, SparkTestSession.sf)
    val docs = Tables.documents(spark, SparkTestSession.sf).count()
    assert(f.count() == docs)
    // every payload decoded (no -1 degradations) with 1..13 frames
    assert(f.filter(col("n_frames") < 1 || col("n_frames") > 13).count() == 0,
      "frame count outside the generator domain (or a decode failed)")
    // ceil(n/4) sampled frames out of n
    assert(f.filter(col("n_sampled") =!=
      ceil(col("n_frames").cast("double") / 4).cast("long")).count() == 0)
    // the rendered bytes are a REAL animated GIF: container magic, and
    // the reader's frame directory agrees with the generator arithmetic
    val gif = Multimodal.renderGif(7L, 29L) // 29 % 13 + 1 = 4 frames
    assert(new String(gif.take(6), "US-ASCII").startsWith("GIF8"),
      "payload is not a GIF container")
    val (n, ns, ck) = Multimodal.gifFrameProbe(gif)
    assert(n == 4 && ns == 1, s"probe saw ($n, $ns) frames, wanted (4, 1)")
    assert(ck == Multimodal.frameColor(7L, 0).toLong,
      "decoded frame-0 pixel != exact palette color (GIF not lossless?)")
    // undecodable bytes degrade, never throw
    assert(Multimodal.gifFrameProbe("not a gif".getBytes("UTF-8")) ==
      ((-1L, -1L, -1L)))
  }

  test("binary parquet round-trip drives the mapPartitions paths") {
    // the deployment shape: payloads persisted as a real parquet binary
    // column, re-read, and decoded/resized via the batched mapPartitions
    // plumbing over the re-read bytes
    val dir = java.nio.file.Files
      .createTempDirectory("graft-multimodal").toString + "/payloads"
    Multimodal.withImagePayload(Tables.documents(spark, SparkTestSession.sf))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType,
      "payload column must round-trip as a parquet binary column")
    val viaBatch = Multimodal.decodeBatched(back.repartition(3),
        "doc_id", "payload", batchSize = 11)
      .select(col("doc_id"), col("format"), col("width"), col("height"))
      .orderBy(col("doc_id"))
    val viaQuery = Multimodal.queries("q_multimodal_meta")(
      spark, SparkTestSession.sf)
    assert(viaQuery.collect().toSeq == viaBatch.collect().toSeq,
      "decode over re-read parquet diverged from the declared query")
    val resizedBack = Multimodal.decodeBatched(
        Multimodal.resizeBatched(back.repartition(3),
          "doc_id", "payload", batchSize = 11),
        "doc_id", "resized")
      .select(col("doc_id"), col("format").as("r_format"),
        col("width").as("r_width"), col("height").as("r_height"))
      .orderBy(col("doc_id"))
    val resizedQuery = Multimodal.queries("q_multimodal_resize")(
      spark, SparkTestSession.sf)
    assert(resizedQuery.collect().toSeq == resizedBack.collect().toSeq,
      "resize over re-read parquet diverged from the declared query")
  }

  test("batch size does not change results (1 vs 1000)") {
    val docs = Multimodal.withImagePayload(
      Tables.documents(spark, SparkTestSession.sf))
    val a = Multimodal.decodeBatched(docs, "doc_id", "payload", 1)
      .orderBy(col("doc_id")).collect().toSeq
    val b = Multimodal.decodeBatched(docs, "doc_id", "payload", 1000)
      .orderBy(col("doc_id")).collect().toSeq
    assert(a == b)
  }

  test("audio payloads are genuine RIFF/WAVE, probe round-trips header") {
    val wav = Multimodal.renderWav(7L, 123L)
    assert(wav(0) == 'R' && wav(1) == 'I' && wav(2) == 'F' &&
      wav(3) == 'F' && wav(8) == 'W' && wav(9) == 'A' && wav(10) == 'V' &&
      wav(11) == 'E', "not a RIFF/WAVE container")
    val m = Multimodal.audioDecoder(wav)
    assert(m == Multimodal.AudioMeta("wav", 1, 8000, 16,
      Multimodal.genAudioFrames(123L).toLong))
    // sample data really is in there: payload carries 2 bytes/frame
    assert(wav.length >= Multimodal.genAudioFrames(123L) * 2,
      "payload too small to hold the PCM frames")
    // degrade contract: garbage and truncated-header bytes never throw
    assert(Multimodal.audioDecoder(Array[Byte](1, 2, 3)).format == "unknown")
    assert(Multimodal.audioDecoder(wav.take(6)).format == "unknown")
  }
}
