package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataChecksSpec extends AnyFunSuite with SparkTest {
  import DataChecks._

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "hello world", "en", 11L),
      (2L, "grüße", "de", 5L),
      (3L, null: String, "xx", 0L),
      (4L, "dup", "en", 3L),
      (4L, "dup", "en", 3L)
    ).toDF("doc_id", "text", "lang", "n_chars")
  }

  test("planted violations are caught; clean checks pass") {
    val report = DataChecks.run(docs, Seq(
      SizeAtLeast(1),
      Completeness("text", 1.0),   // violated: one NULL
      Uniqueness("doc_id", 1.0),   // violated: id 4 twice
      ValueRange("n_chars", 0, 100),
      MeanBetween("n_chars", 1, 10),
      PatternRate("lang", "^[a-z]{2}$", 1.0)))
      .collect().map(r => (r.getString(0), r.getBoolean(5))).toMap
    assert(report("size_at_least"))
    assert(!report("completeness"))
    assert(!report("uniqueness"))
    assert(report("value_range"))
    assert(report("mean_between")) // mean = 22/5 = 4.4
    assert(report("pattern_rate"))
  }

  test("metrics carry the evidence, not just the verdict") {
    val rows = DataChecks.run(docs, Seq(Completeness("text", 1.0),
      Uniqueness("doc_id", 1.0), MeanBetween("n_chars", 1, 10)))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(rows("completeness") == 0.8)
    assert(rows("uniqueness") == 0.8)
    assert(rows("mean_between") == 4.4)
  }

  test("all checks evaluate in one aggregation pass (single scan)") {
    val plan = DataChecks.run(docs, Seq(Completeness("text", 1.0),
      ValueRange("n_chars", 0, 100), MeanBetween("n_chars", 1, 10),
      SizeAtLeast(1))).queryExecution.optimizedPlan
    var scans = 0
    plan.foreach {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => scans += 1
      case _ => ()
    }
    assert(scans == 1, s"expected a single scan, plan:\n$plan")
  }

  test("MAD outliers: a planted extreme value flags; the bulk doesn't") {
    import spark.implicits._
    // 20 values around 100 ± 3, one wild outlier
    val rows = ((1 to 20).map(i => ("s", i.toLong, 100L + (i % 7) - 3)) :+
      (("s", 99L, 100000L))).toDF("source", "doc_id", "n_chars")
    val r = DataChecks.madOutliers(rows, "source", "doc_id", "n_chars")
      .collect().head
    assert(r.getLong(1) == 21)          // n
    assert(math.abs(r.getDouble(2) - 100.0) <= 3.0) // median in the bulk
    assert(r.getDouble(3) <= 3.0)       // MAD from the bulk spread
    assert(r.getLong(4) == 1)           // exactly the planted outlier
  }

  test("PSI: identical slices drift 0; a planted shift alarms and is antisymmetric") {
    import spark.implicits._
    val a = (1 to 200).map(i => i % 16).toDF("v")
    val b = (1 to 200).map(i => if (i % 4 == 0) 7 else i % 16).toDF("v")
    def headline(x: org.apache.spark.sql.DataFrame,
                 y: org.apache.spark.sql.DataFrame): Double =
      psi(x, y, col("v") % 8).collect().head.getDouble(0)
    assert(headline(a, a) == 0.0)
    val drift = headline(a, b)
    assert(drift > 0.01, s"planted shift should alarm, got $drift")
    // PSI's term is antisymmetric under slice swap: (p,q) -> (q,p)
    // negates (p-q) and ln(p/q) — so the sum is invariant, and equal
    // smoothing makes the swapped headline identical
    assert(math.abs(headline(b, a) - drift) < 1e-9)
  }
}
