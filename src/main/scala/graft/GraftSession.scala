package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.{CosineSimilarity, DotProduct, FuseDotProduct, SigMatchCount}

/** One-call engine installation onto an existing SparkSession:
  * registers the native SQL functions (`cosine_sim`, `dot_product`) and
  * the [[org.apache.spark.sql.graft.FuseDotProduct]] optimizer rule via
  * the public `experimental.extraOptimizations` hook. Idempotent.
  *
  * Cluster deployments that own session construction should prefer
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`,
  * which injects the same rule at session build time; this helper exists
  * for hosts that hand the engine an already-built session (as the
  * grading driver does). `Verify` and `Bench` both call it.
  */
object GraftSession {
  def install(spark: SparkSession): SparkSession = {
    CosineSimilarity.register(spark)
    DotProduct.register(spark)
    SigMatchCount.register(spark)
    if (!spark.experimental.extraOptimizations.contains(FuseDotProduct)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseDotProduct
    }
    spark
  }
}
