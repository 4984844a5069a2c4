package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.graftshim.ColumnShim

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
  * the same IEEE double everywhere, and a zero quotient renders `0.0`
  * (never `-0.0` — the signed-zero class a double-path `round` leaks
  * when a negative quotient is exactly zero).
  *
  * Division is Spark's `div` (catalyst `IntegralDivide`) — exact over
  * the FULL long/decimal range. (An earlier draft floor-divided via
  * `(a - pmod(a, d)) / d` on doubles, exact only below 2^53 ≈ 9·10¹⁵
  * — far under the documented bound; `div` has no such cliff.) The
  * SQL twin is the same formula with `//`.
  *
  * Bounds: the long paths need 2·|num·10⁶| + den inside a long, i.e.
  * |num| ≤ ~4.6·10¹² for [[intRatio6]]; [[decRatio6]] runs the whole
  * ladder in DECIMAL(38,0) (exact to 10³⁸) for corpus-scale sums.
  */
object Round6 {

  /** Catalyst `div`: exact integral division on long/decimal operands
    * (the `functions._` DSL has no binding for it).
    */
  private def intDiv(a: Column, b: Column): Column =
    ColumnShim.column(new IntegralDivide(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Exact half-away-from-zero rounding of num/den to an integer, as
    * a LONG column. den > 0; operands integral (or decimal for the
    * decimal overloads — `div` returns long either way).
    */
  private def halfAwayDiv(num: Column, den: Column): Column = {
    val q = intDiv(abs(num) * 2 + den, den * 2)
    when(num < 0, -q).otherwise(q)
  }

  /** Exact half-up rounding of num/den to an integer LONG, for
    * NONNEGATIVE operands — the raw integer form the micro-unit
    * trajectories (HITS, PageRank) carry between iterations, where
    * [[microRatio6]] would prematurely drop to double. Operands may be
    * long or DECIMAL(38,0); callers cast — `div` returns long either
    * way, so the VALUE must fit a long.
    */
  def halfUpDiv(num: Column, den: Column): Column =
    intDiv(num * 2 + den, den * 2)

  /** round6(num / den) for integral columns, den > 0. */
  def intRatio6(num: Column, den: Column): Column =
    microRatio6(num.cast("long") * 1000000L, den)

  /** round6((numMicro/10⁶) / den) — for numerators ALREADY in micro
    * units (e.g. a DECIMAL(28,6) sum times 10⁶), den > 0.
    */
  def microRatio6(numMicro: Column, den: Column): Column =
    halfAwayDiv(numMicro.cast("long"), den.cast("long"))
      .cast("double") / lit(1000000.0)

  /** round6(sumDec / n) where sumDec is a DECIMAL(28,6) aggregate. */
  def decAvg6(sumDec: Column, n: Column): Column =
    microRatio6((sumDec * lit(1000000)).cast("long"), n)

  /** round6(num / den) with the WHOLE ladder in DECIMAL(38,0) — for
    * numerators/denominators that overflow a long (covariance
    * `n·s_ij − s_i·s_j` over micro²-scaled Gram sums, AUC rank sums).
    * den > 0; result is an exact 6-decimal double, signed-zero-free.
    *
    * Bound: the VALUE must satisfy |num/den| ≲ 9.2·10¹² so its micro
    * scaling fits the long that `div` returns — inherent, not
    * incidental: past ~9·10⁹ a 6-decimal value stops being exactly
    * representable in a double at all (2^53 micro-units). Ratios,
    * covariances and AUCs live at O(1).
    */
  def decRatio6(num: Column, den: Column): Column = {
    val n = num.cast("decimal(38,0)")
    val d = den.cast("decimal(38,0)")
    val q = intDiv(abs(n) * 2000000L + d, d * 2)
    (when(n < 0, -q).otherwise(q)).cast("double") / lit(1000000.0)
  }
}
