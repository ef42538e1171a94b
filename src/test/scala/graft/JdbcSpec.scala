package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{Jdbc, Tables}

/** Executes the JDBC source against an embedded Derby database — the
  * in-process stand-in for the reference's origin Postgres (the harness
  * has no network database; Derby ships on the Spark classpath). The
  * round trip proves the mandated snapshot + incremental readers as
  * running code, not just option wiring: write a table out over JDBC,
  * read it back through [[Jdbc.snapshot]]'s range partitioning, and
  * diff against the parquet twin.
  */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private lazy val url = {
    val dir = Files.createTempDirectory("graft-derby").toFile
    dir.delete() // Derby insists on creating the directory itself
    s"jdbc:derby:${dir.getAbsolutePath};create=true"
  }

  private lazy val seeded: Unit = {
    Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      .write.format("jdbc")
      .option("url", url).option("dbtable", "CUSTOMER").save()
  }

  test("partitioned snapshot read matches the parquet twin") {
    seeded
    val twin = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    val got = Jdbc.snapshot(spark, url, "CUSTOMER",
      partitionColumn = "c_custkey", bounds = (1L, 150L), numPartitions = 4)
    // the range split must actually fan out: 4 JDBC partitions, each a
    // bounded cursor scan an executor pulls independently
    assert(got.rdd.getNumPartitions == 4)
    assert(got.count() == twin.count())
    assert(got.exceptAll(twin).count() == 0 &&
      twin.exceptAll(got).count() == 0,
      "JDBC snapshot diverged from the parquet twin")
  }

  test("incremental pull pushes the cursor predicate to the database") {
    seeded
    // Spark's JDBC writer quotes identifiers, so Derby stores them
    // case-sensitively — the raw cursor subquery must quote them too
    val got = Jdbc.incremental(spark, url, "CUSTOMER",
      cursorColumn = "\"c_custkey\"", lastSeen = 120L)
    val twin = Tables.customer(spark, sf)
      .filter(col("c_custkey") > 120)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    assert(got.count() == twin.count() && got.count() > 0)
    assert(got.exceptAll(twin).count() == 0 &&
      twin.exceptAll(got).count() == 0,
      "incremental JDBC pull diverged from the filtered parquet twin")
  }
}
