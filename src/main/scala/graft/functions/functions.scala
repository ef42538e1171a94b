package graft

/** Library-facing custom functions.
  *
  * `cosineSim` is a native codegen'd Catalyst expression (hosted in the
  * `org.apache.spark.sql.graft` namespace because Spark's expression
  * extension types are `private[sql]`); `MinHashAgg` is a typed
  * `Aggregator` sketch. See each for the built-in-vs-custom rationale.
  */
package object functions {
  val CosineSimilarity = org.apache.spark.sql.graft.CosineSimilarity
  def cosineSim(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.CosineSimilarity.cosineSim(a, b)
  val DotProduct = org.apache.spark.sql.graft.DotProduct
  def dotProduct(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.DotProduct.dotProduct(a, b)
}
