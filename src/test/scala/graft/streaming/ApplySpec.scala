package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import Apply.{Mutation, Op, deriveBatch, deriveStream, initialState, run => foldOps}

/** Op-derivation FSM laws, plus the three-way agreement: pure fold ==
  * batch Dataset twin == declared lag-window query, and batch ==
  * streaming across MemoryStream epochs (state survives the epoch
  * boundary). */
class ApplySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fsm: insert/update/delete lifecycle and no-op deletes") {
    val ms = List(
      Mutation(1, 10, "error", 0.0),    // dead key: no-op
      Mutation(1, 11, "click", 1.0),    // insert
      Mutation(1, 12, "purchase", 2.0), // update carrying old payload
      Mutation(1, 13, "error", 0.0),    // delete carrying old payload
      Mutation(1, 14, "error", 0.0),    // dead again: no-op
      Mutation(1, 15, "view", 3.0))     // re-insert
    val (st, ops) = foldOps(ms.iterator)
    assert(ops.map(_.op) == List("insert", "update", "delete", "insert"))
    assert(ops(1).old_value.contains(1.0) && ops(1).new_value.contains(2.0))
    assert(ops(2).old_type.contains("purchase") && ops(2).new_value.isEmpty)
    assert(ops(3).old_type.isEmpty)
    assert(st.live && st.lastValue == 3.0)
  }

  test("batch derivation equals the declared lag-window query") {
    val sf = SparkTestSession.sf
    val events = graft.io.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .as[Mutation]
    val viaFsm = deriveBatch(events).toDF()
      .select(col("user_id"), col("event_id"), col("op"),
        col("old_type"), col("old_value"), col("new_type"), col("new_value"))
    val viaWindow = graft.SparkEntry.queries("q_cdc_ops_stream")(spark, sf)
      .select(col("user_id"), col("event_id"), col("op"),
        col("old_type"), col("old_value"), col("new_type"), col("new_value"))
    assert(viaFsm.exceptAll(viaWindow).count() == 0 &&
      viaWindow.exceptAll(viaFsm).count() == 0,
      "FSM-derived ops diverged from the lag-window derivation")
  }

  test("streaming derivation equals batch across epoch boundaries") {
    val ms = (1L to 4L).flatMap { k =>
      List(
        Mutation(k, k * 100 + 1, "click", 1.0),
        Mutation(k, k * 100 + 2, "error", 0.0),
        Mutation(k, k * 100 + 3, "view", 2.0),
        Mutation(k, k * 100 + 4, "purchase", 3.0))
    }
    val batch = deriveBatch(spark.createDataset(ms)).collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Mutation]
    val q = deriveStream(mem.toDS()).writeStream
      .format("memory").queryName(s"ops_out_${System.nanoTime()}")
      .outputMode("append").start()
    // split INSIDE each key's sequence: the insert lands in epoch 1,
    // the delete/re-insert in epoch 2 — state must carry across
    val (e1, e2) = ms.partition(_.event_id % 100 <= 2)
    mem.addData(e1); q.processAllAvailable()
    mem.addData(e2); q.processAllAvailable()
    val streamed = spark.table(q.name).as[Op].collect().toSet
    q.stop()
    assert(streamed == batch,
      "streaming op derivation diverged from the batch fold")
  }
}
