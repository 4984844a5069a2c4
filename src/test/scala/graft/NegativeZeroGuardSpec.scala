package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** Suite-wide signed-zero guard — the third cross-engine rendering
  * class (after the half-ulp round6 knife edge and the DECIMAL
  * quotient): IEEE `-0.0 == 0.0`, so a value compare passes, but the
  * driver hashes the RENDERING and `-0.0` prints differently from
  * `0.0`. Spark's `round()` normalizes the sign away while DuckDB's
  * preserves it, so any gate whose oracle can produce an exactly-zero
  * negative quotient is one fixture tweak away from a hash mismatch
  * (round 10: q_embed_cov cells (5,9)/(9,5)).
  *
  * The rule this enforces: a gate's DOUBLE/FLOAT output must never
  * contain negative zero — route exact-ratio projections through
  * [[graft.core.Round6]] (integer half-away division renders a zero
  * quotient as `0.0` in every engine) or add `+ 0.0` normalization.
  *
  * Detection: the RENDERING itself — `cast(x as string) = '-0.0'`
  * (a numeric `=== -0.0` compares true for both zeros, and an ANSI
  * session errors on the 1/x sign probe).
  */
class NegativeZeroGuardSpec extends AnyFunSuite with SparkTest {

  private val sfDir = "/root/testdata/sf0.001"

  private def isNegZero(c: Column): Column =
    c.cast("double").cast("string") === lit("-0.0")

  test("no gate emits a negative-zero double at sf0.001") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, q) =>
        val df = q(spark, sfDir)
        val floatCols = df.schema.fields.collect {
          case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
        }
        if (floatCols.isEmpty) Nil
        else {
          val hit = floatCols
            .map(c => sum(when(isNegZero(col(c)), 1L).otherwise(0L)).as(c))
          val row = df.agg(hit.head, hit.tail: _*).collect()(0)
          floatCols.zipWithIndex.collect {
            case (c, i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
              s"$name.$c (${row.getLong(i)} cells)"
          }
        }
    }
    assert(offenders.isEmpty,
      s"negative-zero doubles in gate output: ${offenders.mkString(", ")}")
  }
}
