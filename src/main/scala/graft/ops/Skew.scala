package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join split handles most skew at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default). Salting is
  * the explicit fallback for pathological keys (one entity owning a
  * double-digit percentage of a 100 TB fact table) or for non-AQE
  * paths: spread each fact row across `salt` sub-keys and replicate the
  * dimension side once per sub-key, so a hot key's rows land on `salt`
  * different reducers instead of one.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted `salt` ways.
    *
    * The fact side's salt assignment only needs to spread rows (any
    * assignment is correct); the dim side is replicated across all salt
    * values via a literal-range explode. Result equals the plain inner
    * join, with `salt`× better worst-key parallelism at the cost of a
    * `salt`× larger (usually broadcast) dim side.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 0)
    // salt MUST be a deterministic function of row content: partition
    // ids / monotonic ids change when a lost shuffle map task is
    // recomputed, which would route re-executed rows to different
    // reducers than the copies already fetched (duplicated/lost rows —
    // the SPARK-23207 class of bug). Hashing all columns is stable
    // across retries; identical rows sharing a salt is harmless.
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.map(col): _*), lit(salt)))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until salt).map(i => lit(i)): _*)))
    saltedFact.join(saltedDim,
        saltedFact(key) === saltedDim(key) &&
        saltedFact("__salt") === saltedDim("__salt"))
      .drop(saltedDim(key)).drop("__salt")
  }

  /** Group size as `groupBy(key).count` + join-back — the skew-safe
    * replacement for `count().over(Window.partitionBy(key))` on keys
    * whose hottest group is data-sized (a mega dup-cluster, a
    * boilerplate n-gram). The window shape funnels EVERY member row of
    * the hottest group into ONE task partition and sorts it there, and
    * AQE cannot split window partitions. Here the aggregate side
    * map-combines to ≤ one row per key per map partition before its
    * exchange, Catalyst broadcasts the key-sized count table when it is
    * small, and when it is not, the join-back exchange IS
    * AQE-skew-splittable. `df` is referenced on both sides; when its
    * lineage ends in a shuffle or checkpoint both consumers share it
    * (ReusedExchange / the cut lineage), and when Catalyst instead
    * rewrites the count side into its own partial-agg chain (it elides
    * `df`'s final aggregate where counting groups ≡ counting distinct
    * keys), the narrow segment below the first shuffle runs once more —
    * two parallel map scans, never a single-task sort. That bounded
    * recompute is the price of the skew bound, the same trade
    * rankPerProbe makes (ScaleSpec pins the shape: hash-keyed
    * exchanges only, results ≡ the window form). `key` must be
    * non-null (a null key would drop rows in the equi-join where the
    * window kept them); every call site's key is non-null by
    * construction. */
  def withGroupSize(df: DataFrame, key: String, out: String): DataFrame =
    df.join(df.groupBy(col(key)).agg(count(lit(1)).as(out)), Seq(key))
}
