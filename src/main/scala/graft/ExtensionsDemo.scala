package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftExtensions

/** Proves the cluster deployment path for the optimizer extension:
  * a session BUILT with `withExtensions(new GraftExtensions)` (the
  * `spark.sql.extensions` equivalent) fuses the higher-order dot-product
  * idiom without any in-process install call. Must run in a fresh JVM —
  * extensions apply only at session construction, which is exactly why
  * the in-process tests use `GraftSession.install` instead.
  *
  * `sbt "runMain graft.ExtensionsDemo"` prints FUSED=true and the row
  * count, exit 0 on success.
  */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-extensions-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val q = graft.io.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("d",
        aggregate(zip_with(col("e"), col("e"), (x, y) => x * y), lit(0.0), _ + _))
    val fused = q.queryExecution.optimizedPlan.toString.contains("dot_product")
    // the injected SQL functions must resolve by name in this session
    // (no GraftSession.install ran here)
    val sqlOk = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
        "sig_match_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS m")
      .collect()(0)
    val fnOk = sqlOk.getDouble(0) == 11.0 && sqlOk.getDouble(1) == 1.0 &&
      sqlOk.getLong(2) == 2L
    println(s"FUSED=$fused FUNCS=$fnOk ROWS=${q.count()}")
    spark.stop()
    if (!fused || !fnOk) sys.exit(1)
  }
}
