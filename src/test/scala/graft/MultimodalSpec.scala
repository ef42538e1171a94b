package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal
import graft.io.Tables

/** The mapPartitions batched-decode plumbing must agree with the
  * pure-expression metadata query (same stub arithmetic), across batch
  * boundaries and partition counts. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("decodeBatched output equals expression-path metadata") {
    val docs = Tables.documents(spark, SparkTestSession.sf)
    val viaExpr = Multimodal.queries("q_multimodal_meta")(spark, SparkTestSession.sf)
    val viaBatch = Multimodal.decodeBatched(
        Multimodal.withBinaryPayload(docs).repartition(7),
        "doc_id", "payload", batchSize = 13)
      .orderBy(col("doc_id"))
    assert(viaExpr.collect().toSeq == viaBatch.collect().toSeq)
  }

  test("resizeBatched byte counts equal the declared resize query") {
    val docs = Tables.documents(spark, SparkTestSession.sf)
    val viaBatch = Multimodal.resizeBatched(
        Multimodal.withBinaryPayload(docs).repartition(5),
        "doc_id", "payload", batchSize = 17)
      .select(col("doc_id"), length(col("resized")).cast("long").as("resized_bytes"))
      .orderBy(col("doc_id"))
    val viaExpr = Multimodal.queries("q_multimodal_resize")(spark, SparkTestSession.sf)
      .select(col("doc_id"), col("resized_bytes"))
    assert(viaExpr.collect().toSeq == viaBatch.collect().toSeq)
    // the stub never grows a payload
    val grow = Multimodal.queries("q_multimodal_resize")(spark, SparkTestSession.sf)
      .filter(col("resized_bytes") > col("n_bytes"))
    assert(grow.count() == 0)
  }

  test("frame sampling covers every doc and checksums are stable") {
    val f = Multimodal.queries("q_multimodal_frames")(spark, SparkTestSession.sf)
    val docs = Tables.documents(spark, SparkTestSession.sf).count()
    assert(f.count() == docs)
    // ceil(n/4) sampled frames out of n
    assert(f.filter(col("n_sampled") =!=
      ceil(col("n_frames").cast("double") / 4).cast("long")).count() == 0)
    assert(f.filter(col("checksum") <= 0).count() == 0)
  }

  test("binary parquet round-trip drives the mapPartitions paths") {
    // the deployment shape: payloads persisted as a real parquet binary
    // column, re-read, and decoded/resized via the batched mapPartitions
    // plumbing — not the in-memory expression twins
    val dir = java.nio.file.Files
      .createTempDirectory("graft-multimodal").toString + "/payloads"
    Multimodal.withBinaryPayload(Tables.documents(spark, SparkTestSession.sf))
      .select(col("doc_id"), col("payload"))
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType,
      "payload column must round-trip as a parquet binary column")
    val viaBatch = Multimodal.decodeBatched(back.repartition(3),
        "doc_id", "payload", batchSize = 11)
      .orderBy(col("doc_id"))
    val viaExpr = Multimodal.queries("q_multimodal_meta")(
      spark, SparkTestSession.sf)
    assert(viaExpr.collect().toSeq == viaBatch.collect().toSeq,
      "decodeBatched over re-read parquet diverged from expression path")
    val resizedBack = Multimodal.resizeBatched(back.repartition(3),
        "doc_id", "payload", batchSize = 11)
      .select(col("doc_id"), length(col("resized")).cast("long").as("resized_bytes"))
      .orderBy(col("doc_id"))
    val resizedExpr = Multimodal.queries("q_multimodal_resize")(
      spark, SparkTestSession.sf)
      .select(col("doc_id"), col("resized_bytes"))
    assert(resizedExpr.collect().toSeq == resizedBack.collect().toSeq,
      "resizeBatched over re-read parquet diverged from expression path")
  }

  test("batch size does not change results (1 vs 1000)") {
    val docs = Multimodal.withBinaryPayload(
      Tables.documents(spark, SparkTestSession.sf))
    val a = Multimodal.decodeBatched(docs, "doc_id", "payload", 1)
      .orderBy(col("doc_id")).collect().toSeq
    val b = Multimodal.decodeBatched(docs, "doc_id", "payload", 1000)
      .orderBy(col("doc_id")).collect().toSeq
    assert(a == b)
  }
}
