package graft.io

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Replication-set administration — the reference's admin surface
  * (pgshovel `create-set/update-set/drop-set` store a versioned
  * ReplicationSetConfiguration: which tables, which columns) recast for
  * a lakehouse: a named set is a table→columns projection map persisted
  * as JSON in a metadata directory (standing in for the ZooKeeper
  * znode tree, which the driver scoped out). `capture` materializes the
  * configured projections — column pruning reaches the scans, i.e. the
  * Spark-native equivalent of capture-time column configuration.
  */
object Admin {

  case class ReplicationSet(name: String, version: Int,
      tables: Map[String, Seq[String]])

  private def path(metaDir: String, name: String) =
    Paths.get(metaDir, s"$name.json")

  def createSet(metaDir: String, set: ReplicationSet): Unit = {
    Files.createDirectories(Paths.get(metaDir))
    val p = path(metaDir, set.name)
    require(!Files.exists(p), s"set '${set.name}' already exists")
    writeSet(p, set)
  }

  /** Versioned update: refuses stale writes (the reference uses ZK
    * versioned znodes for the same purpose). */
  def updateSet(metaDir: String, set: ReplicationSet): Unit = {
    val cur = getSet(metaDir, set.name)
    require(set.version == cur.version + 1,
      s"stale update: have v${cur.version}, got v${set.version}")
    writeSet(path(metaDir, set.name), set)
  }

  def dropSet(metaDir: String, name: String): Unit =
    Files.deleteIfExists(path(metaDir, name))

  def listSets(metaDir: String): Seq[String] = {
    val dir = Paths.get(metaDir)
    if (!Files.exists(dir)) Seq.empty
    else {
      val stream = Files.list(dir)
      try stream.iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json")).toSeq.sorted
      finally stream.close()
    }
  }

  def getSet(metaDir: String, name: String): ReplicationSet = {
    val p = path(metaDir, name)
    require(Files.exists(p), s"no such set: $name")
    parseSet(Files.readString(p))
  }

  /** Materialize the set's configured projections over a data dir. */
  def capture(spark: SparkSession, metaDir: String, name: String,
      sfDir: String): Map[String, DataFrame] = {
    val set = getSet(metaDir, name)
    set.tables.map { case (t, cols) =>
      val df = Tables(spark, sfDir, t)
      t -> (if (cols.isEmpty) df
            else df.select(cols.map(org.apache.spark.sql.functions.col): _*))
    }
  }

  // minimal hand-rolled JSON (zero-dependency; names/columns are
  // identifier-safe by construction)
  private def writeSet(p: java.nio.file.Path, set: ReplicationSet): Unit = {
    val tables = set.tables.toSeq.sortBy(_._1).map { case (t, cols) =>
      s""""$t": [${cols.map(c => s""""$c"""").mkString(", ")}]"""
    }.mkString("{", ", ", "}")
    Files.writeString(p,
      s"""{"name": "${set.name}", "version": ${set.version}, "tables": $tables}""")
  }

  private def parseSet(json: String): ReplicationSet = {
    val name = """"name":\s*"([^"]+)"""".r.findFirstMatchIn(json).get.group(1)
    val version = """"version":\s*(\d+)""".r.findFirstMatchIn(json).get.group(1).toInt
    val tablesBlock = """"tables":\s*\{(.*)\}""".r.findFirstMatchIn(json).get.group(1)
    val tableRe = """"([A-Za-z0-9_]+)":\s*\[([^\]]*)\]""".r
    val tables = tableRe.findAllMatchIn(tablesBlock).map { m =>
      val cols = """"([^"]+)"""".r.findAllMatchIn(m.group(2)).map(_.group(1)).toSeq
      m.group(1) -> cols
    }.toMap
    ReplicationSet(name, version, tables)
  }
}
