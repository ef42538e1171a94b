package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Tables

/** Source-format coverage: the engine's queries are source-agnostic —
  * the same rows arrive from parquet, CSV, or JSON (schema-first; no
  * inference on a production feed). */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("nation round-trips through csv and json with identical rows") {
    val orig = Tables.nation(spark, sf).orderBy("n_nationkey")
    val dir = Files.createTempDirectory("graft-src").toString
    orig.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    orig.write.mode("overwrite").json(s"$dir/json")
    val schema = orig.schema
    val fromCsv = Tables.load(spark, s"$dir/csv", "csv", Some(schema))
      .orderBy("n_nationkey")
    val fromJson = Tables.load(spark, s"$dir/json", "json", Some(schema))
      .orderBy("n_nationkey")
    assert(fromCsv.collect().toSeq == orig.collect().toSeq)
    assert(fromJson.collect().toSeq == orig.collect().toSeq)
  }

  test("a declared query runs unchanged against a csv copy of its table") {
    val dir = Files.createTempDirectory("graft-src2").toString
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").option("header", "true").csv(s"$dir/documents")
    val fromCsv = Tables.load(spark, s"$dir/documents", "csv", Some(docs.schema))
    // same top-20 wordcount whether the corpus came from parquet or csv
    val viaParquet = SparkEntry.queries("q_text_wordcount")(spark, sf).collect().toSeq
    val viaCsv = fromCsv
      .select(explode(graft.ops.Text.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc).limit(20).collect().toSeq
    assert(viaCsv == viaParquet)
  }
}
