package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact 6-decimal rounding of ratios — the cross-engine knife-edge
  * cure. `round(a / b, 6)` on doubles diverges between engines
  * whenever the true quotient's 7th decimal is exactly 5 but the
  * binary double sits a hair below (Spark rounds the SHORTEST DECIMAL
  * representation, most engines round the BINARY value): measured one
  * doc in 5000 on the LM average at sf0.1. For integer (or
  * micro-scaled DECIMAL) operands the rounded quotient is computable
  * in exact integer arithmetic — half-away-from-zero:
  *
  *   q = (2·|num·10⁶| + den) div (2·den), re-signed, then q / 10⁶
  *
  * The final division of an exactly-representable integer by 10⁶ is
  * the same IEEE double everywhere.
  *
  * Bounds: |num| ≤ ~4·10¹² keeps 2·num·10⁶ inside a long. The SQL
  * twin is the same formula with `//`.
  */
object Round6 {

  /** round6(num / den) for integral columns, den > 0. */
  def intRatio6(num: Column, den: Column): Column =
    microRatio6(num.cast("long") * 1000000L, den)

  /** round6((numMicro/10⁶) / den) — for numerators ALREADY in micro
    * units (e.g. a DECIMAL(28,6) sum times 10⁶), den > 0.
    */
  def microRatio6(numMicro: Column, den: Column): Column = {
    val d = den.cast("long")
    val a = abs(numMicro.cast("long")) * 2 + d
    // integer floor division via remainder subtraction (Column `/` is
    // double division; exact here because the numerator is a multiple)
    val quot = ((a - pmod(a, d * 2)) / (d * 2)).cast("long")
    (when(numMicro < 0, -quot).otherwise(quot)).cast("double") / lit(1000000.0)
  }

  /** round6(sumDec / n) where sumDec is a DECIMAL(28,6) aggregate. */
  def decAvg6(sumDec: Column, n: Column): Column =
    microRatio6((sumDec * lit(1000000)).cast("long"), n)
}
