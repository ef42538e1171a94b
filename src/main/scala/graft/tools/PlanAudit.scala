package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Executed-plan shuffle audit: run each named query at the given SF and
  * print, per shuffle exchange in the FINAL adaptive plan, the runtime
  * metrics that matter at scale (data size, partition count, records
  * written). `.explain` shows the plan Spark intends; this shows what
  * AQE actually did — whether skew splits fired, what each exchange
  * carried — so a candidate-volume fix has a measured before/after
  * (VERDICT r5 stretch ask).
  *
  *   sbt "runMain graft.tools.PlanAudit /root/repo/testdata/sf1 q_dedup_minhash_lsh,q_dedup_minhash_verify"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val keys =
      if (args.length > 1) args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("q_dedup_minhash_lsh", "q_dedup_minhash_verify",
        "q_dedup_clusters_sig")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Audit-session-only: DPP's stats heuristic vetoes partition
      // pruning when the prunable scan is fixture-tiny (the benefit
      // estimate rounds to zero). At real scale the same stats FAVOR
      // pruning; disabling the veto here shows the plan shape the
      // partitioned store buys — scan metrics below report the actual
      // files/partitions read.
      .config("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.install(spark)

    // The final plan after AQE re-optimization lives behind
    // AdaptiveSparkPlanExec/QueryStageExec wrappers that plain
    // `collect` does not descend into.
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec        => p +: flatten(q.plan)
      case r: ReusedExchangeExec    => p +: flatten(r.child)
      case other => other +: other.children.flatMap(flatten)
    }

    keys.foreach { k =>
      // Timer brackets construction too: the iterative queries (CC
      // loop) materialize localCheckpoint blocks eagerly while the
      // DataFrame is being BUILT, so count-only timing would miss most
      // of their work. Execution drives the DataFrame's OWN
      // QueryExecution (toRdd) — `df.count()` would plan and run a
      // separate count-aggregate query, leaving these plan nodes
      // unexecuted and every metric zero.
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(k)(spark, sf)
      val qe = df.queryExecution
      val n = qe.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PLANAUDIT $k rows=$n wall=$sec%.1fs")
      val nodes = flatten(qe.executedPlan)
      // flatten descends ReusedExchangeExec (so the listing shows every
      // consumer), but `shuffles=` must read literally: a reused
      // exchange wraps the SAME node instance, so identity-dedupe
      // counts each physical shuffle once and `reused=` reports how
      // many extra consumers read its files for free.
      val allShuffles = nodes.collect { case s: ShuffleExchangeLike => s }
      val seen = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
      val shuffles = allShuffles.filter(seen.add)
      val reused = nodes.count(_.isInstanceOf[ReusedExchangeExec])
      val skewed = nodes.map(_.nodeName).count(_.contains("skew"))
      println(s"PLANAUDIT $k shuffles=${shuffles.size} reused=$reused " +
        s"skew_marked_nodes=$skewed nodes=${nodes.size}")
      if (sys.env.contains("SPARK_GRAFT_PLAN_TREE"))
        println(qe.executedPlan.treeString.linesIterator
          .take(150).mkString("\n"))
      shuffles.zipWithIndex.foreach { case (s, i) =>
        val m = s.metrics
        def v(key: String): String =
          m.get(key).map(_.value.toString).getOrElse("-")
        println(s"PLANAUDIT $k   x$i dataSize=${v("dataSize")} " +
          s"records=${v("shuffleRecordsWritten")} " +
          s"bytesWritten=${v("shuffleBytesWritten")} " +
          s"parts=${v("numPartitions")} " +
          s"node=${s.nodeName} " +
          s"child=${s.children.headOption.map(_.nodeName).getOrElse("-")} " +
          s"part=${s.outputPartitioning.getClass.getSimpleName}")
      }
      // Per file scan: how much of the source was physically read.
      // For a hive-partitioned store (the cell-partitioned IVF code
      // tables), partsRead < partsTotal is the layout-pruning receipt
      // — numFiles counts only the files of the partitions that
      // survived static + dynamic (DPP) pruning.
      val scanSeen = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
      val scans = nodes.collect { case f: FileSourceScanExec => f }
        .filter(scanSeen.add)
      scans.zipWithIndex.foreach { case (f, i) =>
        val m = f.metrics
        def v(key: String): String =
          m.get(key).map(_.value.toString).getOrElse("-")
        val root = f.relation.location.rootPaths.headOption
          .map(_.getName).getOrElse("-")
        val dpp = if (f.partitionFilters.exists(
            _.toString.toLowerCase.contains("dynamicpruning"))) "dpp" else "-"
        println(s"PLANAUDIT $k   scan$i src=$root " +
          s"filesRead=${v("numFiles")} partsRead=${v("numPartitions")} " +
          s"staticFiles=${v("staticFilesNum")} prune=$dpp")
      }
    }
    spark.stop()
  }
}
