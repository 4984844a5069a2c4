package graft.core

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The exact-ratio ladder: integral `div` all the way (an earlier
  * draft floor-divided via doubles, silently wrong past 2^53), and a
  * zero quotient must render `0.0` regardless of numerator sign.
  */
class Round6Spec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("v")).collect()(0).getDouble(0)

  test("intRatio6 half-away rounding at the .5 boundary, both signs") {
    // 1/8 = 0.125 → micro 125000; 0.0000005 → rounds away to 1e-6
    assert(one(Round6.intRatio6(lit(1L), lit(8L))) == 0.125)
    assert(one(Round6.intRatio6(lit(1L), lit(2000000L))) == 1e-6)
    assert(one(Round6.intRatio6(lit(-1L), lit(2000000L))) == -1e-6)
  }

  test("microRatio6 stays exact beyond 2^53 (the double floor-div cliff)") {
    // numMicro = 1.2e16+1 (> 2^53 — a double floor-div drops the +1),
    // den = 3: quotient micro = 4000000000000000.333… → half-away
    // 4000000000000000 → value 4e9 exactly.
    val got = one(Round6.microRatio6(lit(12000000000000001L), lit(3L)))
    assert(got == 4.0e9, s"got $got")
  }

  test("decRatio6 handles operands past long range and kills -0.0") {
    // negative numerator, quotient exactly zero → must render "0.0"
    val z = Seq(1).toDF("x")
      .select(Round6.decRatio6(lit(-1L), lit(10000000000L)).as("v"))
      .select(col("v"), col("v").cast("string").as("s")).collect()(0)
    assert(z.getDouble(0) == 0.0 && z.getString(1) == "0.0",
      s"negative-zero leak: ${z.getString(1)}")
    // big exact case: num = 123456789012345678901234567 (needs
    // decimal), den = 1e21 → value 123456.789012345678901234567
    // → round6 = 123456.789012
    val big = one(Round6.decRatio6(
      lit("123456789012345678901234567").cast("decimal(38,0)"),
      lit("1000000000000000000000").cast("decimal(38,0)")))
    assert(big == 123456.789012, s"got $big")
  }

  test("decRatio6 half-away at the boundary, negative operands") {
    // -5/10 micro → -0.5 micro... value -0.0000005 → -1e-6 (away)
    assert(one(Round6.decRatio6(lit(-1L), lit(2000000L))) == -1e-6)
    assert(one(Round6.decRatio6(lit(1L), lit(2000000L))) == 1e-6)
  }
}
