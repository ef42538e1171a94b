package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: MinHash signature sketch over a stream of tokens —
  * `Aggregator[IN, BUF, OUT]` is the idiomatic Spark surface for
  * user-defined sketches (HLL, quantile digests, MinHash, …).
  *
  * Unlike the md5-string formulation in [[graft.ops.Dedup]] (chosen
  * there for cross-engine oracle parity), this one uses the standard
  * integer form: k independent universal hash functions
  * h_i(x) = (a_i·x + b_i) mod p over a 64-bit token hash, keeping the
  * minimum per function. The buffer is a plain Array[Long] — merge is
  * element-wise min, so partial aggregation and shuffle-side combine
  * work exactly like any built-in aggregate at any scale.
  *
  * Estimated Jaccard(A, B) = fraction of matching signature slots.
  */
class MinHashAgg(numHashes: Int = 32, seed: Long = 42L)
    extends Aggregator[String, Array[Long], Array[Long]] with Serializable {

  private val P = 2305843009213693951L // 2^61 - 1, Mersenne prime
  private val rng = new java.util.Random(seed)
  private val as: Array[Long] = Array.fill(numHashes)(1 + math.abs(rng.nextLong()) % (P - 1))
  private val bs: Array[Long] = Array.fill(numHashes)(math.abs(rng.nextLong()) % P)

  /** FNV-1a 64-bit token hash (deterministic, seed-free). */
  private def tokenHash(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h & Long.MaxValue
  }

  // (a*x + b) mod p without overflow: split multiply via Math.multiplyHigh
  private def mulMod(a: Long, x: Long): Long = {
    val hi = Math.multiplyHigh(a, x)
    val lo = a * x
    // fold 128-bit product mod 2^61-1: (hi·2^64 + lo) mod p
    val r = ((hi << 3) | (lo >>> 61)) + (lo & P)
    if (r >= P) r - P else r
  }

  private def h(i: Int, x: Long): Long = {
    val v = mulMod(as(i), x) + bs(i)
    if (v >= P) v - P else v
  }

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], token: String): Array[Long] = {
    val x = tokenHash(token)
    var i = 0
    while (i < numHashes) {
      val v = h(i, x)
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** Estimated Jaccard from two signatures. */
  def estimate(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    var same = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }
}
