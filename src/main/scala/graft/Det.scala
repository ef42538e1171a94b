package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for oracle (DuckDB) hash parity.
  *
  * The driver hash-compares each query's parquet output against DuckDB
  * running the paired `oracleSql` on the same inputs, so every emitted
  * cell must be bit-identical across engines. Three hazards and their
  * mechanical fixes (see SURVEY.md §7.4):
  *
  *  1. Floating-point accumulation order: Spark sums doubles in
  *     partition/task order, DuckDB sequentially — `sum(double)` is not
  *     reproducible. Fix: cast each input to DECIMAL(18,4) first; decimal
  *     sums are exact and order-independent in both engines; cast the
  *     exact result back to double at the end (deterministic conversion).
  *  2. Timestamp precision: `events.ts` is parquet ns; Spark truncates to
  *     µs on read, DuckDB does not. Fix: truncate to millisecond in BOTH
  *     engines before any comparison/grouping, and to second on output.
  *  3. Row order: the driver hashes values in row order. Fix: every query
  *     ends with a total-order sort over a unique key tuple with explicit
  *     null placement (Spark default is NULLS FIRST asc, DuckDB NULLS
  *     LAST — never rely on the default).
  */
object Det {
  private val D = DecimalType(18, 4)

  /** Order-independent exact sum of a double expression (see above). */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Order-independent mean: exact decimal sum / count, floor-rounded
    * (same IEEE-pure form as [[r4]] — `round()` would reintroduce the
    * cross-engine .xxxx5 divergence on exact means). */
  def davg(c: Column): Column =
    r4(sum(c.cast(D)).cast("double") / count(c))

  /** Cross-engine round-to-4-decimals for computed doubles.
    *
    * NOT `round(x, 4)`: Spark rounds via BigDecimal.valueOf (shortest
    * decimal string, HALF_UP) while DuckDB rounds in C++ off the scaled
    * double — values whose true expansion exceeds 4 decimals (e.g.
    * price*(1-disc)*(1+tax), 6 decimals) land on .xxxx5 boundaries and
    * the engines disagree. floor(x*1e4 + 0.5)/1e4 is pure IEEE-double
    * arithmetic — bit-identical in any engine. */
  def r4(c: Column): Column = floor(c * lit(10000) + lit(0.5)) / lit(10000.0)

  /** Quantize a computed double to exact 1e-4 integer units (a long) —
    * the same IEEE-pure form as [[r4]] WITHOUT the final division.
    * Downstream sums/argmax over these stay in exact long arithmetic
    * (order-free, engine-identical, whole-stage-codegen primitive ops)
    * instead of DECIMAL(18,4) — same determinism as dsum-of-r4 values,
    * none of the per-row Decimal allocation. Scaling every term by the
    * same positive constant (1e4) preserves argmax and exact ties. */
  def qi4(c: Column): Column = floor(c * lit(10000) + lit(0.5)).cast("long")

  /** events.ts normalized for cross-engine semantics (ns vs µs). */
  def ets(c: Column): Column = date_trunc("millisecond", c)

  /** Timestamp for output: second precision (identical text form). */
  def outTs(c: Column): Column = date_trunc("second", c)

  // DuckDB-side equivalents, for composing oracle SQL strings.
  def sqlR4(x: String): String = s"FLOOR(($x) * 10000 + 0.5) / 10000"
  def sqlQi4(x: String): String = s"CAST(FLOOR(($x) * 10000 + 0.5) AS BIGINT)"
  def sqlDsum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  def sqlDavg(x: String): String =
    sqlR4(s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE) / COUNT($x)")
  def sqlEts(x: String): String = s"date_trunc('milliseconds', $x)"
  def sqlOutTs(x: String): String = s"date_trunc('second', $x)"
}
