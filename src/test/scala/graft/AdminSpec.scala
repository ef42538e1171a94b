package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Admin
import graft.io.Admin.ReplicationSet

/** Replication-set admin lifecycle: create/get/update/list/drop with
  * version fencing, and capture materializing the configured
  * projections. */
class AdminSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("create/get/update/drop lifecycle with version fencing") {
    val dir = Files.createTempDirectory("graft-admin").toString
    val v1 = ReplicationSet("orders_set", 1,
      Map("orders" -> Seq("o_orderkey", "o_custkey", "o_totalprice"),
        "customer" -> Seq.empty))
    Admin.createSet(dir, v1)
    assert(Admin.listSets(dir) == Seq("orders_set"))
    assert(Admin.getSet(dir, "orders_set") == v1)
    intercept[IllegalArgumentException](Admin.createSet(dir, v1))
    // stale update (same version) refused; v2 accepted
    intercept[IllegalArgumentException](Admin.updateSet(dir, v1))
    val v2 = v1.copy(version = 2,
      tables = v1.tables.updated("orders", Seq("o_orderkey", "o_totalprice")))
    Admin.updateSet(dir, v2)
    assert(Admin.getSet(dir, "orders_set").version == 2)
    Admin.dropSet(dir, "orders_set")
    assert(Admin.listSets(dir).isEmpty)
  }

  test("capture materializes configured projections") {
    val dir = Files.createTempDirectory("graft-admin2").toString
    Admin.createSet(dir, ReplicationSet("s", 1,
      Map("orders" -> Seq("o_orderkey", "o_custkey"),
        "nation" -> Seq.empty)))
    val dfs = Admin.capture(spark, dir, "s", SparkTestSession.sf)
    assert(dfs("orders").columns.toSeq == Seq("o_orderkey", "o_custkey"))
    assert(dfs("nation").columns.length == 3) // empty = all columns
    assert(dfs("orders").count() == 1500)
  }

  test("kafka builders construct with the public option contract") {
    // connector jar absent in this harness: construction succeeds (the
    // options are validated at stream start, not builder time)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("seq",
        org.apache.spark.sql.types.LongType)))
    // readChanges calls .load() which needs the connector — assert the
    // clean classpath error rather than a silent pass
    val e = intercept[Exception] {
      graft.io.Kafka.readChanges(spark, "broker:9092", "changes", schema)
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }
}
