package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{Sinks, Tables}

/** Sink behaviors: hive partitioning, idempotent epoch overwrite, and
  * the keyed upsert apply. */
class SinksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-sink").toString

  test("writePartitioned lays out hive partitions") {
    val out = tmp()
    val docs = Tables.documents(spark, SparkTestSession.sf)
    Sinks.writePartitioned(docs, out, Seq("lang"))
    val langDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("lang=")).map(_.getName).sorted
    assert(langDirs.length == 5, langDirs.mkString(","))
    // partition pruning: reading one partition back scans only it
    val back = spark.read.parquet(out).filter(col("lang") === "en")
    assert(back.count() ==
      docs.filter(col("lang") === "en").count())
  }

  test("applyUpsert: deltas override base by key, inserts appear") {
    import spark.implicits._
    val out = tmp()
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0))
      .toDF("k", "name", "v")
    val deltas = Seq((2L, "b2", 99.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    Sinks.applyUpsert(base, deltas, "k", out)
    val got = spark.read.parquet(out).orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 99.0), (3L, "c", 30.0)))
  }

  test("epoch sink: replaying an epoch overwrites, not duplicates") {
    import spark.implicits._
    val out = tmp()
    val df = Seq((1L, "x")).toDF("id", "s")
    // simulate the foreachBatch body running twice for the same epoch
    df.write.mode("overwrite").parquet(s"$out/epoch=7")
    df.write.mode("overwrite").parquet(s"$out/epoch=7")
    assert(spark.read.parquet(s"$out/epoch=7").count() == 1)
  }
}
