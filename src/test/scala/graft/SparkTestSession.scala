package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (Test/fork uses a single
  * JVM; building a session per suite costs ~5s each). */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpointLocation",
        s"/tmp/graft-test-ckpt-${System.nanoTime()}")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Cloned session whose streaming state lives in the RocksDB state
    * store — the provider a 100 TB deployment runs (off-heap state,
    * incremental snapshot checkpointing; the jar ships with Spark 4.1).
    * The conf is session-scoped, so suites opt in per-query without
    * touching the shared session's default HDFS-backed store. */
  def rocksSession: SparkSession = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s2
  }

  val sf: String = "/root/testdata/sf0.001"
}
