package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTest
import graft.sources.Tables

/** Exercises `percentile_approx` — the documented 100 TB path for
  * q_quantiles (exact `percentile` sorts the full group on one reducer;
  * the approx digest is mergeable map-side). It cannot hash-match a
  * DuckDB oracle (the digest has no cross-engine twin), so the audit is
  * a RANK-ERROR bound instead: for accuracy parameter A, Spark
  * guarantees the returned value's rank is within n/A of the target
  * rank — asserted here as an empirical-CDF error ≤ 1/A (+ slack for
  * ties/interpolation) per group and quantile.
  */
class ApproxQuantileSpec extends AnyFunSuite with SparkTest {

  private val sfDir = "/root/testdata/sf0.001"
  private val ps = Seq(0.25, 0.5, 0.95)
  private val accuracy = 1000

  test("percentile_approx rank error is within 1/accuracy of exact per group") {
    val events = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
    val approx = events.groupBy("event_type")
      .agg(expr(s"percentile_approx(value, array(${ps.mkString(",")}), $accuracy)")
        .as("qs"))
    // empirical CDF of each approx value within its own group
    val ranked = events.join(approx, Seq("event_type"))
      .select(col("event_type") +: col("value") +:
        ps.indices.map(i => col("qs").getItem(i).as(s"q$i")): _*)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        ps.indices.flatMap(i => Seq(
          sum(when(col("value") <= col(s"q$i"), 1L).otherwise(0L)).as(s"le$i"),
          sum(when(col("value") < col(s"q$i"), 1L).otherwise(0L)).as(s"lt$i"))): _*)
      .collect()
    assert(ranked.nonEmpty)
    ranked.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      ps.zipWithIndex.foreach { case (p, i) =>
        // tie-aware two-sided rank bound: ties at q push cdf(<= q)
        // arbitrarily HIGH even for an exactly-correct answer, so the
        // upper bound tests cdf(< q) — the rank where q's run STARTS —
        // while the lower bound tests cdf(<= q), where its run ends
        val le = r.getAs[Long](s"le$i") / n
        val lt = r.getAs[Long](s"lt$i") / n
        assert(le >= p - 1.0 / accuracy,
          s"group ${r.get(0)}: p=$p cdf(<=q)=$le below rank bound")
        assert(lt <= p + 1.0 / accuracy,
          s"group ${r.get(0)}: p=$p cdf(<q)=$lt above rank bound")
      }
    }
  }

  test("percentile_approx stays near exact percentile values") {
    val events = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
    val both = events.groupBy("event_type")
      .agg(expr(s"percentile_approx(value, array(${ps.mkString(",")}), $accuracy)").as("qa"),
        expr(s"percentile(value, array(${ps.mkString(",")}))").as("qe"))
      .collect()
    both.foreach { r =>
      val qa = r.getSeq[Double](1)
      val qe = r.getSeq[Double](2)
      ps.indices.foreach { i =>
        // value-space sanity (loose: value error is data-dependent even
        // when rank error is tight; the rank bound above is the real gate)
        val spreadv = math.max(1e-9, math.abs(qe.last - qe.head))
        assert(math.abs(qa(i) - qe(i)) <= 0.2 * spreadv + 1e-6,
          s"group ${r.get(0)} p=${ps(i)}: approx ${qa(i)} vs exact ${qe(i)}")
      }
    }
  }
}
