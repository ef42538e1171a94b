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
