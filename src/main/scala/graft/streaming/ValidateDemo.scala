package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import Validate.{Msg, Violation}

/** Runnable usage example for the stream validator: feeds two epochs of
  * an at-least-once, partially-broken publisher feed through
  * [[Validate.validateStream]] and prints the violations it flags.
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
    spark.stop()
  }
}
