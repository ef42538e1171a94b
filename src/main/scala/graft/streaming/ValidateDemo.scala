package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import Validate.{GMsg, GroupEvent, Msg, Violation}

/** Runnable usage example for the stream validator: feeds two epochs of
  * an at-least-once, partially-broken publisher feed through
  * [[Validate.validateStream]] and prints the violations it flags,
  * then a publisher-failover scenario through
  * [[Validate.validateGroupStream]] (audited handoff mid-transaction +
  * rejected stale-publisher resurrection).
  * `runMain graft.streaming.ValidateDemo` */
object ValidateDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.checkpointLocation",
        s"/tmp/graft-demo-ckpt-${System.nanoTime()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val mem = MemoryStream[Msg]
    val q = Validate.validateStream(mem.toDS()).writeStream
      .format("memory").queryName("violations").outputMode("append").start()

    // epoch 1: pub1 ok then a gap; pub2 mutates with no open txn
    mem.addData(Seq(
      Msg("pub1", 0, "begin"), Msg("pub1", 1, "mutation"),
      Msg("pub1", 2, "commit"), Msg("pub1", 4, "begin"),
      Msg("pub2", 0, "mutation")))
    q.processAllAvailable()
    // epoch 2: pub1 commits, then the relay redelivers the same commit
    mem.addData(Seq(Msg("pub1", 5, "commit"), Msg("pub1", 5, "commit")))
    q.processAllAvailable()

    val out = spark.table("violations").as[Violation]
      .collect().sortBy(v => (v.publisher, v.seq)).toSeq
    println("VIOLATIONS=" + out.mkString("; "))
    q.stop()

    // failover: relay1 dies mid-transaction, relay2 takes over (audited
    // handoff + implied abort); relay1's zombie message is then stale
    val gmem = MemoryStream[GMsg]
    val gq = Validate.validateGroupStream(gmem.toDS()).writeStream
      .format("memory").queryName("group_events").outputMode("append").start()
    gmem.addData(Seq(
      GMsg("set1", "relay1", 0, "begin", 0),
      GMsg("set1", "relay1", 1, "mutation", 1)))
    gq.processAllAvailable()
    gmem.addData(Seq(
      GMsg("set1", "relay2", 0, "begin", 2),
      GMsg("set1", "relay2", 1, "commit", 3),
      GMsg("set1", "relay1", 2, "commit", 4)))
    gq.processAllAvailable()
    val gout = spark.table("group_events").as[GroupEvent]
      .collect().sortBy(e => (e.publisher, e.seq, e.kind)).toSeq
    println("GROUP_EVENTS=" + gout.mkString("; "))
    gq.stop()
    spark.stop()
  }
}
