package graft.core

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeJoinsSpec extends AnyFunSuite with SparkTest {

  test("asof join: latest at-or-before match, null before first right row") {
    import spark.implicits._
    val l = Seq((1, 10L, "a"), (1, 20L, "b"), (1, 5L, "early"), (2, 50L, "other"))
      .toDF("k", "t", "tag")
    val r = Seq((1, 8L, 100.0), (1, 20L, 200.0), (3, 1L, 999.0))
      .toDF("k", "t", "v")
    val got = TimeJoins.asofJoin(l, r, Seq("k"), "t")
      .orderBy("k", "t")
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getString(2),
        Option(x.get(3)).map(_.asInstanceOf[Double]))).toList
    assert(got == List(
      (1, 5L, "early", None),        // before any right row
      (1, 10L, "a", Some(100.0)),    // matches t=8
      (1, 20L, "b", Some(200.0)),    // INCLUSIVE at equality
      (2, 50L, "other", None)))      // key has no right rows at all
  }

  test("interval join: binned equi-join equals the theta join, any bin width") {
    import spark.implicits._
    def ts(m: Long) = new java.sql.Timestamp(1700000000000L + m * 60000)
    val rnd = new scala.util.Random(7)
    val l = Seq.tabulate(40) { i =>
      val f = rnd.nextInt(500); (i, ts(f), ts(f + 1 + rnd.nextInt(89)))
    }.toDF("lid", "lfrom", "luntil")
    val r = Seq.tabulate(40) { i =>
      val f = rnd.nextInt(500); (i, ts(f), ts(f + 1 + rnd.nextInt(89)))
    }.toDF("rid", "rfrom", "runtil")
    val theta = l.join(r, $"lfrom" < $"runtil" && $"rfrom" < $"luntil")
      .select("lid", "rid").collect().map(x => (x.getInt(0), x.getInt(1))).toSet
    for (binSec <- Seq(60L, 3600L, 86400L)) {
      val binned = TimeJoins.intervalJoin(l, r, Seq.empty,
          "lfrom", "luntil", "rfrom", "runtil", binSec)
        .select("lid", "rid").collect().map(x => (x.getInt(0), x.getInt(1))).toSet
      assert(binned == theta, s"binSeconds=$binSec")
    }
  }

  test("asof join matches a reference scan on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val l = Seq.tabulate(200)(i => (rnd.nextInt(5), rnd.nextInt(1000).toLong, i))
    val r = Seq.tabulate(80)(i => (rnd.nextInt(5), rnd.nextInt(1000).toLong, i * 1.5))
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq // unique (k, t)
    val got = TimeJoins.asofJoin(
        l.toDF("k", "t", "lid"), r.toDF("k", "t", "v"), Seq("k"), "t")
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getInt(2),
        Option(x.get(3)).map(_.asInstanceOf[Double]))).toSet
    val expected = l.map { case (k, t, lid) =>
      val m = r.filter(x => x._1 == k && x._2 <= t)
      (k, t, lid, if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
    }.toSet
    assert(got == expected)
  }

  test("asof join carries value columns row-atomically through NULLs") {
    import spark.implicits._
    // the t=20 observation has v = NULL: a per-column fill would carry
    // v from t=8 while obs_ts advances to 20 — true ASOF must keep both
    // from the SAME matched row (v null, obs_ts 20)
    val l = Seq((1, 25L)).toDF("k", "t")
    val r = Seq((1, 8L, Some(100.0), 8L), (1, 20L, None, 20L))
      .toDF("k", "t", "v", "obs_ts")
    val got = TimeJoins.asofJoin(l, r, Seq("k"), "t").collect().head
    assert(got.isNullAt(2), got.toString)          // v from the t=20 row
    assert(got.getLong(3) == 20L, got.toString)    // obs_ts from the same row
  }

  test("asof join refuses colliding value column names") {
    import spark.implicits._
    val l = Seq((1, 10L, 1.0)).toDF("k", "t", "v")
    val r = Seq((1, 8L, 2.0)).toDF("k", "t", "v")
    assertThrows[IllegalArgumentException] {
      TimeJoins.asofJoin(l, r, Seq("k"), "t")
    }
  }
}
