package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints `explain("formatted")` for representative
  * queries so scan pushdown, broadcast selection, and whole-stage
  * codegen spans can be reviewed (and regression-checked) without the
  * UI. `runMain graft.Plans [sfDir] [key ...]` */
object Plans {
  val auditKeys: Seq[String] = Seq(
    "q_scan_filter_pushdown", "q_agg_hash", "q_join_broadcast",
    "q_join_asof", "q_cdc_latest_state", "q_cdc_scd2",
    "q_dedup_minhash_lsh", "q_dedup_ngram", "q_sim_cosine_topk",
    "q_sim_ann_ivf", "q_stream_tumbling")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val keys = if (args.length > 1) args.drop(1).toSeq else auditKeys
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)
    keys.foreach { k =>
      println(s"\n===== $k =====")
      SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
