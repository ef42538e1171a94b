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

  private val Ident = "^[A-Za-z0-9_]+$".r

  /** Names must round-trip the JSON codec and stay inside metaDir —
    * enforced at write time, not assumed. */
  private def validate(set: ReplicationSet): Unit = {
    def ok(s: String, what: String): Unit =
      require(Ident.matches(s), s"$what '$s' must match [A-Za-z0-9_]+")
    ok(set.name, "set name")
    require(set.version >= 0, s"version must be >= 0, got ${set.version}")
    set.tables.foreach { case (t, cols) =>
      ok(t, "table name"); cols.foreach(ok(_, "column name"))
    }
  }

  private def path(metaDir: String, name: String) = {
    require(Ident.matches(name), s"set name '$name' must match [A-Za-z0-9_]+")
    Paths.get(metaDir, s"$name.json")
  }

  def createSet(metaDir: String, set: ReplicationSet): Unit = {
    validate(set)
    Files.createDirectories(Paths.get(metaDir))
    val p = path(metaDir, set.name)
    require(!Files.exists(p), s"set '${set.name}' already exists")
    writeSet(p, set)
  }

  /** Versioned update: refuses stale writes. NOTE: the read-check-write
    * is atomic only within one process (JVM-level synchronization); for
    * multi-writer deployments put the metadata dir behind a real CAS
    * store (the reference used ZooKeeper versioned znodes). */
  def updateSet(metaDir: String, set: ReplicationSet): Unit = Admin.synchronized {
    validate(set)
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

  // minimal hand-rolled JSON (zero-dependency; identifiers validated at
  // write time so the codec round-trips). Write is temp-file + atomic
  // move: a crash mid-write can never leave a truncated config behind.
  private def writeSet(p: java.nio.file.Path, set: ReplicationSet): Unit = {
    val tables = set.tables.toSeq.sortBy(_._1).map { case (t, cols) =>
      s""""$t": [${cols.map(c => s""""$c"""").mkString(", ")}]"""
    }.mkString("{", ", ", "}")
    val tmp = Files.createTempFile(p.getParent, s".${p.getFileName}", ".tmp")
    Files.writeString(tmp,
      s"""{"name": "${set.name}", "version": ${set.version}, "tables": $tables}""")
    Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def parseSet(json: String): ReplicationSet = {
    def field(re: scala.util.matching.Regex, what: String): String =
      re.findFirstMatchIn(json).getOrElse(
        throw new IllegalStateException(
          s"corrupt replication-set metadata: missing $what in: " +
            json.take(200))).group(1)
    val name = field(""""name":\s*"([^"]+)"""".r, "name")
    val version = field(""""version":\s*(-?\d+)""".r, "version").toInt
    val tablesBlock = field(""""tables":\s*\{(.*)\}""".r, "tables")
    val tableRe = """"([A-Za-z0-9_]+)":\s*\[([^\]]*)\]""".r
    val tables = tableRe.findAllMatchIn(tablesBlock).map { m =>
      val cols = """"([^"]+)"""".r.findAllMatchIn(m.group(2)).map(_.group(1)).toSeq
      m.group(1) -> cols
    }.toMap
    ReplicationSet(name, version, tables)
  }
}
