package graft

/** Unified CLI — the user-facing entry point a reference (pgshovel CLI)
  * user would reach for. Subcommands dispatch to the library's mains:
  *
  * {{{
  * sbt "runMain graft.Main verify <sfDir> <outDir>"  # dump queries + oracle
  * sbt "runMain graft.Main bench"                    # env-driven benchmark
  * sbt "runMain graft.Main plans [sfDir] [key ...]"  # physical-plan audit
  * sbt "runMain graft.Main validate-demo"            # streaming FSM demo
  * sbt "runMain graft.Main compact-demo"             # streaming snapshot demo
  * sbt "runMain graft.Main list"                     # declared query keys
  * }}}
  */
object Main {
  def main(args: Array[String]): Unit = args.toList match {
    case "verify" :: rest if rest.size == 2 => Verify.main(rest.toArray)
    case "verify" :: rest =>
      System.err.println(
        s"verify takes exactly 2 arguments (<sfDir> <outDir>), got ${rest.size}")
      sys.exit(2)
    case "bench" :: _                       => Bench.main(Array.empty)
    case "plans" :: rest                    => Plans.main(rest.toArray)
    case "validate-demo" :: _               => streaming.ValidateDemo.main(Array.empty)
    case "compact-demo" :: _                => streaming.CompactDemo.main(Array.empty)
    case "list" :: _ =>
      SparkEntry.queries.keys.toSeq.sorted.foreach(println)
      println(s"total: ${SparkEntry.queries.size} queries, " +
        s"${SparkEntry.oracleSql.size} with oracle SQL")
    case other =>
      System.err.println(
        s"""unknown command: ${other.mkString(" ")}
           |usage: graft.Main {verify <sfDir> <outDir> | bench | plans [sfDir] [key ...] |
           |                   validate-demo | compact-demo | list}""".stripMargin)
      sys.exit(2)
  }
}
