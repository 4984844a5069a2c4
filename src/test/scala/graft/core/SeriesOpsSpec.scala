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

  test("rollingStats matches a brute-force trailing window") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(300) { i =>
      (rnd.nextInt(3).toLong, ts("2024-01-01 00:00:00").getTime +
        rnd.nextInt(200000) * 1000L, rnd.nextInt(10000) / 100.0)
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, ts)
      .map { case (k, ms, v) => (k, new Timestamp(ms), v) }
    val got = SeriesOps.rollingStats(rows.toDF("statid", "tfrom", "seval"),
        Seq("statid"), "tfrom", "seval", windowSeconds = 50000)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
      .toMap
    for ((k, t, v) <- rows) {
      val win = rows.filter { case (k2, t2, _) =>
        k2 == k && t2.getTime <= t.getTime &&
          t.getTime / 1000 - t2.getTime / 1000 <= 50000
      }.map(_._3)
      val (n, s, m, lo, hi) = got((k, t))
      assert(n == win.size, s"$k/$t n")
      assert(math.abs(s - win.sum) < 1e-6, s"$k/$t sum")
      assert(math.abs(m - win.sum / win.size) < 1e-6, s"$k/$t mean")
      assert(lo == win.min && hi == win.max, s"$k/$t min/max")
    }
  }

  test("rollingAnomalies flags a planted spike and nothing in a flat series") {
    import spark.implicits._
    // 48 hourly readings at 10.0 with one 500.0 spike
    val base = (0 until 48).map(h =>
      (1L, ts("2024-01-01 00:00:00").getTime + h * 3600000L,
        if (h == 30) 500.0 else 10.0))
    val df = base.map { case (k, ms, v) => (k, new Timestamp(ms), v) }
      .toDF("statid", "tfrom", "seval")
    val out = SeriesOps.rollingAnomalies(df, Seq("statid"), "tfrom", "seval",
        windowSeconds = 24 * 3600, k = (3, 1))
      .collect().map(r => r.getTimestamp(1) -> r.getBoolean(4)).toMap
    val spikeTs = new Timestamp(ts("2024-01-01 00:00:00").getTime + 30 * 3600000L)
    assert(out(spikeTs), "spike not flagged")
    // flat stretches (zero variance, dev 0) must never flag; readings
    // shortly AFTER the spike see it in their window but sit near the
    // mass of the distribution — also unflagged
    assert(out.count(_._2) == 1, out.filter(_._2).toString)
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

  test("mannKendall: monotone series hit tau ±1; flat is 0; lag bound honored") {
    import spark.implicits._
    def series(id: Long, vs: Seq[Double]) = vs.zipWithIndex.map {
      case (v, i) => (id, ts(f"2024-01-01 00:${i}%02d:00"), v) }
    val obs = (series(1L, (1 to 10).map(_.toDouble)) ++   // rising
      series(2L, (1 to 10).map(i => -i.toDouble)) ++      // falling
      series(3L, Seq.fill(10)(5.0))                       // flat
      ).toDF("statid", "tfrom", "seval")
    val got = SeriesOps.mannKendall(obs, Seq("statid"), "tfrom", "seval",
        maxLag = 12)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // n=10, lag<=12 covers all pairs: n_pairs = 45
    assert(got(1L) == ((10L, 45L, 45L, 1.0)))
    assert(got(2L) == ((10L, 45L, -45L, -1.0)))
    assert(got(3L) == ((10L, 45L, 0L, 0.0)))
    // a tight lag bound counts only nearby pairs: lag<=2 on n=4 -> 5
    val small = series(9L, Seq(1.0, 2.0, 3.0, 4.0)).toDF("statid", "tfrom", "seval")
    val b = SeriesOps.mannKendall(small, Seq("statid"), "tfrom", "seval",
        maxLag = 2)
      .collect()(0)
    assert(b.getLong(2) == 5 && b.getLong(3) == 5 && b.getDouble(4) == 1.0)
  }

  test("mannKendall: randomized series match brute-force bounded-lag pairs") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    val keys = (1 to 6).map { k =>
      k.toLong -> (1 to (2 + rng.nextInt(30))).map(_ =>
        Seq(1.0, 2.0, 3.0)(rng.nextInt(3)))
    }
    val obs = keys.flatMap { case (k, vs) => vs.zipWithIndex.map {
      case (v, i) => (k, ts(f"2024-01-01 ${i / 60}%02d:${i % 60}%02d:00"), v) }
    }.toDF("statid", "tfrom", "seval")
    val maxLag = 5
    val got = SeriesOps.mannKendall(obs, Seq("statid"), "tfrom", "seval", maxLag)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    keys.foreach { case (k, vs) =>
      val pairs = for {
        i <- vs.indices; j <- vs.indices
        if j > i && j - i <= maxLag
      } yield math.signum(vs(j) - vs(i)).toLong
      assert(got(k) == ((pairs.size.toLong, pairs.sum)),
        s"key $k: ${got(k)} vs brute (${pairs.size}, ${pairs.sum})")
    }
  }

  test("timeWeightedAvg: hand-computed trapezoids; single-obs keys drop") {
    import spark.implicits._
    val obs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 00:00:10"), 20.0),
      (1L, ts("2024-01-01 00:00:40"), 0.0),
      (2L, ts("2024-01-01 00:00:00"), 99.0)   // single obs: no span
    ).toDF("statid", "tfrom", "seval")
    val got = SeriesOps.timeWeightedAvg(obs, Seq("statid"), "tfrom", "seval")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getDouble(4), r.getTimestamp(1), r.getTimestamp(2)))
      .toMap
    // (10+20)/2*10 + (20+0)/2*30 = 450 over span 40 -> 11.25
    assert(got.keySet == Set(1L))
    assert(got(1L)._1 == 3 && got(1L)._2 == 11.25)
    assert(got(1L)._3 == ts("2024-01-01 00:00:00") &&
      got(1L)._4 == ts("2024-01-01 00:00:40"))
  }

  test("ewmaLagged: exact integer weights (α=.5 → 8/4/2/1), renormalized head") {
    import spark.implicits._
    val obs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 00:01:00"), 20.0),
      (1L, ts("2024-01-01 00:02:00"), 30.0),
      (1L, ts("2024-01-01 00:03:00"), 40.0),
      (1L, ts("2024-01-01 00:04:00"), 1.25)
    ).toDF("statid", "tfrom", "v")
    val got = SeriesOps.ewmaLagged(obs, Seq("statid"), "tfrom", "v",
        alpha = 0.5, depth = 4)
      .orderBy("tfrom").select("ewma").collect().map(_.getDouble(0))
    // head renormalizes over present weights:
    //   t0: 10 (den 8/8); t1: (20·8+10·4)/12 = 16.666667 (half-away)
    //   t2: (30·8+20·4+10·2)/14 = 24.285714
    //   t3: (40·8+30·4+20·2+10)/15 = 32.666667
    //   t4: (1.25·8+40·4+30·2+20)/15 = 250/15 = 16.666667
    assert(got.toSeq == Seq(10.0, 16.666667, 24.285714, 32.666667, 16.666667))
  }

  test("ewmaLagged: non-dyadic α=0.1 runs the rational ladder 1000/900/810/729") {
    import spark.implicits._
    val obs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 00:01:00"), 20.0),
      (1L, ts("2024-01-01 00:02:00"), 30.0),
      (1L, ts("2024-01-01 00:03:00"), 40.0)
    ).toDF("statid", "tfrom", "v")
    val got = SeriesOps.ewmaLagged(obs, Seq("statid"), "tfrom", "v",
        alpha = 0.1, depth = 4)
      .orderBy("tfrom").select("ewma").collect().map(_.getDouble(0))
    // t0: 10; t1: (20·1000+10·900)/1900 = 15.263158 (half-away)
    // t2: (30·1000+20·900+10·810)/2710 = 56100/2710 = 20.701107
    // t3: (40·1000+30·900+20·810+10·729)/3439 = 90490/3439 = 26.312882
    assert(got.toSeq == Seq(10.0, 15.263158, 20.701107, 26.312882))
  }

  test("ewmaLagged property: matches an exact BigInt reference across alphas/depths") {
    import spark.implicits._
    val rng = new scala.util.Random(41)
    for (alpha <- Seq(0.1, 0.25, 0.3, 0.125, 0.07, 1.0); depth <- Seq(1, 3, 5)) {
      val n = 12
      val vals = Vector.fill(n)(math.rint(rng.nextDouble() * 2000 - 1000) / 100.0)
      val obs = vals.zipWithIndex.map { case (v, i) =>
        (1L, ts(f"2024-01-01 00:${i}%02d:00"), v)
      }.toDF("statid", "tfrom", "v")
      val got = SeriesOps.ewmaLagged(obs, Seq("statid"), "tfrom", "v", alpha, depth)
        .orderBy("tfrom").select("ewma").collect().map(_.getDouble(0)).toSeq
      // reference: p/q from the decimal rendering, weights
      // p·(q−p)^j·q^(d−1−j), micro values, one half-away division
      val bd = java.math.BigDecimal.valueOf(alpha).stripTrailingZeros
      val q0 = BigInt(10).pow(math.max(bd.scale, 0))
      val p0 = BigInt(bd.unscaledValue) * q0 / BigInt(10).pow(bd.scale max 0)
      val g = p0.gcd(q0); val (p, q) = (p0 / g, q0 / g)
      val w = (0 until depth).map(j => p * (q - p).pow(j) * q.pow(depth - 1 - j))
      val want = vals.indices.map { i =>
        val lags = (0 until depth).filter(j => i - j >= 0)
        val num = lags.map(j => BigInt(math.round(vals(i - j) * 1e6)) * w(j)).sum
        val den = lags.map(w).sum
        val micro = if (num < 0) -((2 * -num + den) / (2 * den))
          else (2 * num + den) / (2 * den)
        micro.toDouble / 1e6
      }
      assert(got == want, s"alpha=$alpha depth=$depth")
    }
  }
}
