package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN recall-at-volume artifact (VERDICT r11 ask #6): recall@3 of
  * every ANN variant against the exact brute-force cosine top-3
  * (q_sim_cosine_topk — the oracle-verified ground truth), with the
  * variant's wall time beside it, so the knob settings (band counts,
  * nprobe=2, 8×16 PQ) carry measured recall/cost evidence at sf1
  * instead of fixture-scale assertions only.
  *
  * Usage: `sbt "runMain graft.tools.AnnRecall <sfDir>"` — prints one
  * JSON line {"sf_dir":…, "truth_secs":…, "variants":{key:
  * {"recall3":…, "secs":…}}}. Methodology matches OperatorSpec's
  * in-suite recall checks: intersect on (probe_id, neighbor_id) with
  * rn ≤ 3 on both sides, micro-averaged over the probe set.
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.install(spark)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (truth, truthSecs) = timed {
      graft.SparkEntry.queries("q_sim_cosine_topk")(spark, sfDir)
        .filter(col("rn") <= 3).select("probe_id", "neighbor_id")
        .localCheckpoint()
    }
    val nTruth = truth.count().toDouble

    val variants = Seq("q_sim_ann_lsh", "q_sim_ann_multiprobe",
      "q_sim_ann_ivf", "q_sim_ann_pq", "q_sim_ann_pq_stored",
      "q_sim_ann_ivfpq")
    val rows = variants.map { key =>
      val (hit, secs) = timed {
        graft.SparkEntry.queries(key)(spark, sfDir)
          .filter(col("rn") <= 3).select("probe_id", "neighbor_id")
          .intersect(truth).count()
      }
      key -> (hit / nTruth, secs)
    }
    val body = rows.map { case (k, (r, s)) =>
      f""""$k":{"recall3":$r%.4f,"secs":$s%.2f}"""
    }.mkString(",")
    println(f"""{"sf_dir":"$sfDir","truth_secs":$truthSecs%.2f,""" +
      s""""variants":{$body}}""")
    spark.stop()
  }
}
