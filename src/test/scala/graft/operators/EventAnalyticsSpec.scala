package graft.operators

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite

class EventAnalyticsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0) = new java.sql.Timestamp(
    1700000000000L + day * 86400000L + hour * 3600000L)

  test("funnel: order matters — a purchase before the first view doesn't convert") {
    val ev = Seq(
      // user 1 converts fully in order
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      // user 2: purchase BEFORE view — reaches stage view only
      (2L, ts(1), "purchase"), (2L, ts(2), "view"),
      // user 3: view then click, no purchase
      (3L, ts(0), "view"), (3L, ts(0, 5), "click"),
      // user 4: click only — never enters the funnel
      (4L, ts(0), "click")
    ).toDF("user_id", "ts", "event_type")
    val f = EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(f(0) == (3L, 1.0))          // users 1,2,3 viewed
    assert(f(1)._1 == 2L)              // users 1,3 clicked after viewing
    assert(f(2) == (1L, 0.5))          // only user 1 purchased after clicking
  }

  test("transitions: per-user journeys, probabilities sum to 1 per source") {
    val ev = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "click"), (1L, ts(2), 3L, "view"),
      (2L, ts(0), 4L, "view"), (2L, ts(1), 5L, "click"),
      (3L, ts(0), 6L, "view")  // singleton journey contributes no pair
    ).toDF("user_id", "ts", "event_id", "event_type")
    val t = EventAnalytics.transitions(ev, "user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(t(("view", "click")) == ((2L, 1.0)))  // both views precede clicks
    assert(t(("click", "view")) == ((1L, 1.0)))
    assert(t.size == 2)
    // cross-user sequences never chain: user 2's click does not lead
    // into user 3's view
  }

  test("cohorts: users retain in their own week offsets only") {
    val ev = Seq(
      (1L, ts(0), "signup"), (1L, ts(1), "view"),   // week 0 activity
      (1L, ts(8), "view"),                          // week 1
      (2L, ts(0), "signup"),                        // week 0 only
      (3L, ts(14), "signup"), (3L, ts(15), "click") // later cohort, week 0
    ).toDF("user_id", "ts", "event_type")
    val c = EventAnalytics.cohorts(ev, "user_id", "ts", "event_type", "signup")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    val weeks = c.keys.map(_._1).toSeq.distinct.sorted
    assert(weeks.size == 2, s"expected two cohort weeks, got $weeks")
    val (w0, w1) = (weeks.head, weeks.last)
    assert(c((w0, 0L)) == 2L) // users 1 and 2 active in their signup week
    assert(c((w0, 1L)) == 1L) // only user 1 returned the next week
    assert(c((w1, 0L)) == 1L) // user 3's cohort
    assert(!c.contains((w1, 1L)))
  }
}
