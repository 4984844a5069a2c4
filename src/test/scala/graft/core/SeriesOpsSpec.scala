package graft.core

import java.sql.Timestamp

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SeriesOpsSpec extends AnyFunSuite with SparkTest {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resampleLocf carries the latest value forward and nulls stale ticks") {
    import spark.implicits._
    val obs = Seq(
      (1L, ts("2024-01-01 01:00:00"), 10.0),
      (1L, ts("2024-01-01 07:30:00"), 20.0),
      // then silence until the 3rd — every tick past the 24h age is null
      (1L, ts("2024-01-03 00:30:00"), 30.0),
      (2L, ts("2024-01-01 13:00:00"), 99.0)
    ).toDF("statid", "tfrom", "seval")
    val out = SeriesOps.resampleLocf(obs, Seq("statid"), "tfrom", "seval",
        ts("2024-01-01 00:00:00"), ts("2024-01-03 06:00:00"),
        stepSeconds = 6 * 3600, maxAgeSeconds = 24 * 3600)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap

    assert(out((1L, ts("2024-01-01 00:00:00"))).isEmpty)      // before first obs
    assert(out((1L, ts("2024-01-01 06:00:00"))).contains(10.0))
    assert(out((1L, ts("2024-01-01 12:00:00"))).contains(20.0))
    assert(out((1L, ts("2024-01-02 06:00:00"))).contains(20.0)) // 22.5h old: fresh
    assert(out((1L, ts("2024-01-02 12:00:00"))).isEmpty)       // 28.5h old: stale
    assert(out((1L, ts("2024-01-03 06:00:00"))).contains(30.0))
    assert(out((2L, ts("2024-01-01 12:00:00"))).isEmpty)       // key 2 before obs
    assert(out((2L, ts("2024-01-01 18:00:00"))).contains(99.0))
    // grid is dense: every key × tick pair is present
    assert(out.size == 2 * 10)
  }

  test("resampleLocf matches obs exactly ON a grid tick (inclusive asof)") {
    import spark.implicits._
    val obs = Seq((1L, ts("2024-01-01 06:00:00"), 42.0)).toDF("statid", "tfrom", "seval")
    val out = SeriesOps.resampleLocf(obs, Seq("statid"), "tfrom", "seval",
        ts("2024-01-01 00:00:00"), ts("2024-01-01 06:00:00"),
        stepSeconds = 6 * 3600, maxAgeSeconds = 3600)
      .filter(col("tfrom") === ts("2024-01-01 06:00:00")).collect().head
    assert(out.getDouble(2) == 42.0 && out.getTimestamp(3) == ts("2024-01-01 06:00:00"))
  }

  test("gapReport lists exactly the over-threshold gaps per key") {
    import spark.implicits._
    val obs = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 01:00:00")),   // 1h: below
      (1L, ts("2024-01-01 14:00:00")),   // 13h: gap
      (1L, ts("2024-01-02 20:00:00")),   // 30h: gap
      (2L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 11:59:00"))    // 11h59m: below 12h
    ).toDF("statid", "tfrom")
    val got = SeriesOps.gapReport(obs, Seq("statid"), "tfrom", 12 * 3600)
      .orderBy("statid", "gap_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, ts("2024-01-01 01:00:00"), ts("2024-01-01 14:00:00"), 13L * 3600),
      (1L, ts("2024-01-01 14:00:00"), ts("2024-01-02 20:00:00"), 30L * 3600)))
  }
}
