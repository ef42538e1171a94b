package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Runnable usage example for the streaming snapshot: feeds keyed
  * mutations (with a late, losing update) through
  * [[Streams.compactStream]] and prints the maintained state changelog.
  * `runMain graft.streaming.CompactDemo` */
object CompactDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.checkpointLocation",
        s"/tmp/graft-compact-ckpt-${System.nanoTime()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[Event]
    val q = Streams.compactStream(mem.toDS()).writeStream
      .format("memory").queryName("snapshot").outputMode("update").start()

    mem.addData(Seq(
      Event(0, t("2024-01-01 00:05:00"), 1, "signup", 1.0),
      Event(1, t("2024-01-01 00:10:00"), 1, "purchase", 5.0),
      Event(2, t("2024-01-01 00:07:00"), 2, "signup", 2.0)))
    q.processAllAvailable()
    // epoch 2: a late update for user 1 (loses) and a new winner for 2
    mem.addData(Seq(
      Event(3, t("2024-01-01 00:08:00"), 1, "click", 9.0),
      Event(4, t("2024-01-01 00:30:00"), 2, "purchase", 7.0)))
    q.processAllAvailable()

    val state = spark.table("snapshot").as[Event].collect()
      .groupBy(_.user_id).map { case (k, vs) =>
        k -> vs.maxBy(e => (e.ts.getTime, e.event_id)) }.toSeq.sortBy(_._1)
    println("SNAPSHOT=" + state.mkString("; "))
    q.stop()
    spark.stop()
  }
}
