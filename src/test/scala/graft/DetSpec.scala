package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the determinism kit against BigDecimal references:
  * dsum is exactly the rational sum (order-free), r4 is exactly
  * round-half-up at 4 decimals for the doubles it sees. */
class DetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def checkProp(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, r.status.toString)
  }

  // doubles on the 4-decimal grid (what dsum's DECIMAL(18,4) cast sees
  // loss-free), moderate magnitude
  private val grid4 = Gen.chooseNum(-99999999L, 99999999L).map(_ / 10000.0)

  test("dsum equals the exact BigDecimal sum regardless of partitioning") {
    import spark.implicits._
    checkProp(Prop.forAll(Gen.listOfN(40, grid4)) { xs =>
      xs.isEmpty || {
        val expected = xs.map(BigDecimal(_)).sum.toDouble
        val got = xs.toDF("x").repartition(7)
          .agg(Det.dsum(col("x"))).as[Double].head()
        got == expected
      }
    })
  }

  test("r4 is round-half-up at 4 decimals (BigDecimal reference)") {
    import spark.implicits._
    checkProp(Prop.forAll(Gen.listOfN(20, Gen.chooseNum(-1e6, 1e6))) { xs =>
      xs.isEmpty || {
        val got = xs.toDF("x").select(Det.r4(col("x"))).as[Double].collect()
        val expected = xs.map { v =>
          math.floor(v * 10000.0 + 0.5) / 10000.0
        }
        got.toSeq == expected
      }
    })
  }

  test("ets/outTs truncate without crossing the value") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-03-05 10:11:12.987654")
    val (e, o) = Seq(ts).toDF("ts")
      .select(Det.ets(col("ts")).as("e"), Det.outTs(col("ts")).as("o"))
      .as[(java.sql.Timestamp, java.sql.Timestamp)].head()
    assert(e.toString == "2024-03-05 10:11:12.987")
    assert(o.toString == "2024-03-05 10:11:12.0")
  }
}
