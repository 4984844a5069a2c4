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

  test("randomized: microRatio6/decRatio6 == BigDecimal half-away, one batch job") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val rng = new scala.util.Random(7)
    // longs across the full magnitude range (incl. > 2^53) and dens
    // spanning 1..1e12; plus decimal-only cases past long range
    // |num/den| stays under the documented ~9.2e12 value bound (micro
    // must fit the long that `div` returns): num magnitude capped at
    // den * 1e12
    val longCases = (1 to 200).map { _ =>
      val den = 1L + math.abs(rng.nextLong() % math.pow(10, rng.nextInt(13)).toLong.max(1L))
      val cap = if (den > 4600000L) 4600000000000000000L else den * 1000000000000L
      val num = rng.nextLong() % cap
      (num, den)
    }
    // past-long numerators with the value still inside the ~9.2e12
    // bound: num = v·den + r, |v| < 9e12, 0 <= r < den
    val decCases = (1 to 60).map { _ =>
      val den = BigInt(1L + math.abs(rng.nextLong() % 1000000000L)) *
        BigInt(1L + rng.nextInt(1000000))
      val v = BigInt(rng.nextLong() % 9000000000000L)
      val r = BigInt(math.abs(rng.nextLong() % 1000000000L)) % den
      val num = v * den + (if (v.signum >= 0) r else -r)
      (num.toString, den.toString)
    }
    def refMicro(num: BigInt, den: BigInt): Double =
      new JBD(num.bigInteger).divide(new JBD(den.bigInteger), 0, RoundingMode.HALF_UP)
        .doubleValue() / 1e6
    def refRatio(num: BigInt, den: BigInt): Double = refMicro(num * 1000000, den)

    import spark.implicits._
    val gotLong = longCases.toDF("num", "den")
      .select(Round6.microRatio6(col("num"), col("den")).as("m"),
        Round6.decRatio6(col("num"), col("den")).as("r"))
      .collect()
    longCases.zip(gotLong).foreach { case ((n, d), row) =>
      assert(row.getDouble(0) == refMicro(BigInt(n), BigInt(d)), s"microRatio6($n,$d)")
      assert(row.getDouble(1) == refRatio(BigInt(n), BigInt(d)), s"decRatio6($n,$d)")
    }
    val gotDec = decCases.toDF("num", "den")
      .select(Round6.decRatio6(col("num").cast("decimal(38,0)"),
        col("den").cast("decimal(38,0)")).as("r"))
      .collect()
    decCases.zip(gotDec).foreach { case ((n, d), row) =>
      assert(row.getDouble(0) == refRatio(BigInt(n), BigInt(d)), s"decRatio6($n,$d)")
    }
  }

  test("decRatio6 half-away at the boundary, negative operands") {
    // -5/10 micro → -0.5 micro... value -0.0000005 → -1e-6 (away)
    assert(one(Round6.decRatio6(lit(-1L), lit(2000000L))) == -1e-6)
    assert(one(Round6.decRatio6(lit(1L), lit(2000000L))) == 1e-6)
  }
}
