package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationOpsSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u").select(TextOps.canonicalUrl(col("u"))).head.getString(0)

  test("canonicalUrl: scheme/case/www/default-port/tracking/fragment/slash") {
    assert(canon("HTTP://WWW.Site.COM:80/a/b/?utm_source=x&id=2&ref=y#frag")
      == "site.com/a/b?id=2")
    assert(canon("https://site.com/a/b?id=2") == "site.com/a/b?id=2")
    // params sort; empty params drop; :443 strips
    assert(canon("https://site.com:443/x?b=2&a=1&") == "site.com/x?a=1&b=2")
    // a REAL port is kept — different port, different server
    assert(canon("http://site.com:8080/x") == "site.com:8080/x")
    // bare host, no path/query
    assert(canon("https://www.Site.com/") == "site.com")
    // all params tracking → no query at all
    assert(canon("http://s.co/p?utm_a=1&fbclid=2&gclid=3") == "s.co/p")
  }

  test("urlHost extracts the domain including a non-default port") {
    val host = Seq("site.com:8080/x?a=1").toDF("c")
      .select(TextOps.urlHost(col("c"))).head.getString(0)
    assert(host == "site.com:8080")
  }

  test("noveltyScores: shared windows lower novelty; short docs are NULL") {
    val common = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, common + " unique one tail piece alpha beta gamma delta"),
      (2L, common + " other distinct ending words here now and then"),
      (3L, "entirely fresh text with only its own words present okay"),
      (4L, "too short")
    ).toDF("doc_id", "text")
    val out = CorpusStats.noveltyScores(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // docs 1 and 2 share the 3 windows fully inside the common prefix
    assert(out(1L)._1 == 11 && out(1L)._2 == 8)
    assert(out(2L)._1 == 11 && out(2L)._2 == 8)
    assert(out(1L)._3.contains(BigDecimal(8.0 / 11)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // doc 3 is fully novel
    assert(out(3L)._3.contains(1.0))
    // doc 4 has < k tokens
    assert(out(4L) == ((0L, 0L, None)))
  }

  test("kcoreMembers: K5 survives k=3, pendant chain peels away") {
    // K5 on nodes 1..5 plus a chain 5-6-7 hanging off it
    val k5 = for (a <- 1 to 5; b <- (a + 1) to 5) yield (a.toLong, b.toLong)
    val edges = (k5 ++ Seq((5L, 6L), (6L, 7L))).toDF("src", "dst")
    val out = Graph.kcoreMembers(edges, "src", "dst", k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out.values.forall(_ == 4L)) // the intact K5
  }

  test("kcoreMembers: cascade can empty the graph") {
    // a cycle has uniform degree 2 — k=3 kills everything in one round
    val cyc = (1 to 6).map(i => (i.toLong, (i % 6 + 1).toLong)).toDF("src", "dst")
    assert(Graph.kcoreMembers(cyc, "src", "dst", k = 3, rounds = 2).count() == 0)
  }

  test("kcoreMembers: gate budget of 8 rounds reaches the fixpoint") {
    import graft.sources.Tables
    val op = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").as("src"), col("b.p").as("dst"))
    val at8 = Graph.kcoreMembers(e, "src", "dst", k = 80, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val at9 = Graph.kcoreMembers(e, "src", "dst", k = 80, rounds = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at8 == at9)
  }

  test("AVI of real MJPEG frames: sampled pixels equal direct JPEG decode") {
    import MediaCodecs.Avi
    val mk = (f: Int) => Jpeg.encode(16, 8, 1, i => 2 * ((f * 31 + (i % 16) / 8) % 128))
    val frames = (0 until 3).map(mk)
    val avi = Avi.encode(16, 8, frames)
    val df = Seq((1L, avi)).toDF("id", "media")
    val out = Multimodal.videoFrameSample(df, every = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> r.getInt(3)).toMap
    assert(out.keys.map(_._1).toSet == Set(0, 2)) // frames 0 and 2 kept
    for (f <- Seq(0, 2); i <- 0 until 128)
      assert(out((f, i)) == (Jpeg.decode(mk(f)).payload(i) & 0xff))
    // corrupt media degrades to zero rows, not an exception
    val bad = Seq((2L, Array[Byte](1, 2, 3))).toDF("id", "media")
    assert(Multimodal.videoFrameSample(bad, 2).count() == 0)
  }

  test("centroidOutliers: a planted far vector is flagged against its own cell") {
    // two tight clusters + one far-away point; nCells=2 so the fit
    // recovers the clusters, the far point lands in SOME cell and its
    // distance dwarfs the cell's p90
    val dim = 8
    def v(base: Double, j: Int): Array[Float] =
      Array.tabulate(dim)(i => (base + 0.01 * ((i + j) % 3)).toFloat)
    val rows = ((0 until 20).map(j => (j.toLong, v(0.0, j))) ++
      (20 until 40).map(j => (j.toLong, v(5.0, j))) :+
      (99L, Array.fill(dim)(100.0f))).toDF("vec_id", "embedding")
    val out = Similarity.centroidOutliers(rows, dim, nCells = 2, nIters = 3, q = 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(99L)._4, "planted far vector must be flagged")
    // flagged fraction is small: per-cell p90 keeps >= ~90% unflagged
    val flagged = out.values.count(_._4)
    assert(flagged <= out.size / 5)
    // every reported threshold is its cell's own: vectors in the same
    // cell share thr
    out.values.groupBy(_._1).foreach { case (_, vs) =>
      assert(vs.map(_._3).toSet.size == 1)
    }
  }

  test("charEntropy: uniform alphabet hits ln(k); constant text is 0; empty NULL") {
    val docs = Seq(
      (1L, "abcdabcdabcd"),  // uniform over 4 chars → ln 4
      (2L, "aaaaaa"),        // single char → 0
      (3L, "")
    ).toDF("doc_id", "text")
    val out = CorpusStats.charEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(1L)._1 == 12)
    assert(math.abs(out(1L)._2.get - math.log(4.0)) < 1e-4)
    assert(out(2L)._2.contains(-0.0) || out(2L)._2.contains(0.0))
    assert(out(3L) == ((0L, None)))
  }

  test("winsorize clamps planted extremes to the group's own percentiles") {
    val rows = (1 to 98).map(i => ("s", i.toLong, i.toDouble)) ++
      Seq(("s", 99L, 1e9), ("s", 100L, -1e9))
    val out = DataChecks.winsorize(rows.toDF("source", "doc_id", "v"),
        "source", "doc_id", "v", 0.05, 0.95)
      .collect().map(r => r.getLong(1) -> (r.getDouble(4), r.getDouble(5))).toMap
    val (hi, wTop) = out(99L)
    assert(wTop == hi, "the huge value clamps to p95")
    assert(out(100L)._2 == out(50L)._2.min(out(100L)._1).max(
      out.values.map(_._1).head) || out(100L)._2 > -1e9, "the tiny value clamps up")
    // untouched middle values pass through
    assert(out(50L)._2 == 50.0)
  }

  test("weightedMedian: hand-computed lower weighted medians, tie-safe") {
    val rows = Seq(
      // group a: values 1(w=1) 2(w=1) 3(w=10) -> W=12, half=6 -> median 3
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 10L),
      // group b: heavy head 1(w=5) 9(w=4) -> W=9, cum(1)=5, 2*5>=9 -> 1
      ("b", 1L, 5L), ("b", 9L, 4L),
      // group c: ties at the median value across rows: 2(w=1) 2(w=1)
      // 5(w=2) -> W=4, cum(2)=2, 2*2>=4 -> median 2 regardless of
      // intra-tie row order (RANGE frame)
      ("c", 2L, 1L), ("c", 5L, 2L), ("c", 2L, 1L))
    val got = DataChecks.weightedMedian(rows.toDF("g", "v", "w"), "g", "v", "w")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> ((12L, 3L)), "b" -> ((9L, 1L)), "c" -> ((4L, 2L))))
  }

  test("kAnonymity flags under-k groups and under-l sensitive diversity") {
    val rows = Seq(
      ("a", 1L, "s1"), ("a", 1L, "s2"), ("a", 1L, "s3"),   // n=3 ok, l=3 ok
      ("b", 1L, "s1"), ("b", 1L, "s1"),                     // n=2 < 3; l=1 < 2
      ("c", 1L, "s1"), ("c", 1L, "s2"), ("c", 1L, "s2"))    // n=3 ok, l=2 ok
    val got = DataChecks.kAnonymity(rows.toDF("q1", "q2", "sv"),
        Seq("q1", "q2"), "sv", k = 3, l = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toMap
    assert(got("a") == ((3L, 3L, true, true)))
    assert(got("b") == ((2L, 1L, false, false)))
    assert(got("c") == ((3L, 2L, true, true)))
  }

  test("balancedShards: serpentine deal keeps shard byte totals flat") {
    // lognormal-ish sizes with a few giants — the realistic skew
    val rng = new scala.util.Random(3)
    val rows = (1 to 500).map(i =>
      (i.toLong, math.max(1L, math.round(math.exp(rng.nextGaussian() * 1.2 + 6)))))
    val out = Sampling.balancedShards(rows.toDF("id", "sz"), "id", "sz", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 500 && out.forall(r => r._3 >= 0 && r._3 < 8))
    val totals = out.groupBy(_._3).view.mapValues(_.map(_._2).sum).values.toSeq
    val maxItem = rows.map(_._2).max
    assert(totals.size == 8)
    assert(totals.max - totals.min <= 2 * maxItem,
      s"imbalance ${totals.max - totals.min} > 2x max item $maxItem")
    // deterministic: a second run assigns identically
    val again = Sampling.balancedShards(rows.toDF("id", "sz"), "id", "sz", 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(out.forall { case (id, _, s) => again(id) == s })
  }

  test("spearman: +1 on monotone, -1 on reversed, known value on a swap") {
    val mono = (1 to 10).map(i => (i.toLong, i.toDouble, i * 2.0))
    assert(DataChecks.spearman(mono.toDF("id", "a", "b"), "id", "a", "b")
      .collect()(0).getDouble(1) == 1.0)
    val anti = (1 to 10).map(i => (i.toLong, i.toDouble, -i.toDouble))
    assert(DataChecks.spearman(anti.toDF("id", "a", "b"), "id", "a", "b")
      .collect()(0).getDouble(1) == -1.0)
    // swap two adjacent ranks of 1..5: sum d2 = 2, rho = 1 - 12/120 = 0.9
    val swap = Seq((1L, 1.0, 1.0), (2L, 2.0, 3.0), (3L, 3.0, 2.0),
      (4L, 4.0, 4.0), (5L, 5.0, 5.0))
    val r = DataChecks.spearman(swap.toDF("id", "a", "b"), "id", "a", "b")
      .collect()(0)
    assert(r.getLong(0) == 5 && r.getDouble(1) == 0.9)
  }

  test("winsorize pLow=0 clamps to the group minimum (not an empty join)") {
    // ceil(n·0) = 0 matched no rank before the greatest(1, …) clamp —
    // the lo join silently emptied and EVERY row vanished
    val rows = (1 to 10).map(i => ("s", i.toLong, i.toDouble))
    val out = DataChecks.winsorize(rows.toDF("source", "doc_id", "v"),
        "source", "doc_id", "v", 0.0, 0.9)
      .collect()
    assert(out.length == 10, "pLow=0 must keep all rows")
    assert(out.forall(_.getDouble(3) == 1.0), "lo = group minimum")
  }

  test("fuzzyJoinSorted: sort-adjacent near-misses pair; beyond-window pairs don't") {
    val recs = Seq(
      (1L, "alpha corp"), (2L, "alpha corq"),   // adjacent, dist 1
      (3L, "beta inc"), (4L, "bete inc"),       // adjacent after sort, dist 1
      (5L, "zeta llc"),
      // a similar pair separated by > window positions in sort order
      (6L, "m start"), (7L, "m1 pad"), (8L, "m2 pad"), (9L, "m3 pad"),
      (10L, "m4 pad"), (11L, "n start")
    ).toDF("id", "name")
    val out = TextOps.fuzzyJoinSorted(recs, "id", "name", window = 2, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(4)).toMap
    assert(out.contains((1L, 2L)) && out((1L, 2L)) == 1)
    assert(out.contains((3L, 4L)) && out((3L, 4L)) == 1)
    // "m start" vs "n start" is dist 1 but 5 sort positions apart —
    // the window (the blocking tradeoff) excludes it
    assert(!out.contains((6L, 11L)))
    // parity with the single-window formulation
    import org.apache.spark.sql.expressions.Window
    val r = recs.withColumn("rk",
      row_number().over(Window.orderBy(col("name"), col("id"))).cast("long"))
    val expect = r.as("a").join(r.as("b"),
        col("b.rk") > col("a.rk") && col("b.rk") - col("a.rk") <= 2 &&
          levenshtein(col("a.name"), col("b.name")) <= 1)
      .select(col("a.id"), col("b.id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(out.keySet == expect)
  }

  test("videoNearDupPairs: copies collapse, overlapping videos pair, disjoint don't") {
    import graft.operators.MediaCodecs.Avi
    def frame(seed: Int) = Jpeg.encode(40, 16, 1, i => {
      val bx = (i % 40) / 8; val by = (i / 40) / 8
      2 * ((seed * 37 + (by * 5 + bx) * 29) % 128)
    })
    def video(seeds: Seq[Int]) = Avi.encode(40, 16, seeds.map(frame))
    val vids = Seq(
      (1L, video(Seq(10, 11, 12))),
      (2L, video(Seq(10, 11, 12))),  // exact copy of 1 — collapses
      (3L, video(Seq(11, 12, 13))),  // shares two frames with 1
      (4L, video(Seq(50, 60, 70)))   // disjoint
    ).toDF("id", "media")
    val pairs = Multimodal.videoNearDupPairs(vids, every = 1, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.keySet == Set((1L, 3L)), s"got $pairs")
    assert(pairs((1L, 3L)) == 2L)
  }

  test("audio energy hash: volume-invariant, content-sensitive, corrupt-safe") {
    import MediaCodecs.Wav
    def wav(scale: Int, n: Int, gen: Int => Int) =
      Wav.encode(n, 1, 8000, i => {
        val s = gen(i) * scale
        math.max(-32768, math.min(32767, s))
      })
    val gen = (i: Int) => ((i * 97) % 1601) - 800
    val base = AudioHash.energyHash64(wav(1, 200, gen))
    // doubling the volume preserves every energy comparison
    assert(AudioHash.energyHash64(wav(2, 200, gen)) == base)
    // different content, different hash
    val other = AudioHash.energyHash64(wav(1, 200, i => ((i * 31) % 901) - 450))
    assert(other != base)
    // the dataframe wrapper drops undecodable blobs
    val df = Seq((1L, wav(1, 200, gen)), (2L, Array[Byte](1, 2, 3)))
      .toDF("id", "media")
    val rows = AudioHash.ahash(df).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L))
    val (hi, lo) = base
    assert(rows.head.getLong(1) == (hi.toLong & 0xffffffffL))
    assert(rows.head.getLong(2) == (lo.toLong & 0xffffffffL))
  }

  test("fuzzyJoinBlocked: suffix typos match; prefix typos escape the block") {
    val a = Seq((1L, "acme widgets inc"), (2L, "globex corp")).toDF("id_a", "name_a")
    val b = Seq(
      (10L, "acme widgets anc"),  // 1 sub, outside the 8-char block
      (11L, "acme widgets inc"),  // exact
      (12L, "ocme widgets inc"),  // typo INSIDE the block prefix — escapes
      (13L, "globex cork"),       // 1 sub, outside the block
      (14L, "initech llc")
    ).toDF("id_b", "name_b")
    val out = TextOps.fuzzyJoinBlocked(a, b, "name_a", "name_b",
        blockLen = 8, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getInt(4)).toMap
    assert(out == Map((1L, 10L) -> 1, (1L, 11L) -> 0, (2L, 13L) -> 1))
  }

  test("tableStats: min/max/nulls/ndv per column in one relation") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 2.5), (2L, null), (2L, 7.5), (4L, 2.5))
      .toDF("k", "v")
    val out = DataChecks.tableStats(df, Seq("k", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("k") == ((1.0, 4.0, 0L, 3L)))
    assert(out("v") == ((2.5, 7.5, 1L, 2L)))
  }

  test("labelPropagation: two cliques joined by a bridge keep separate labels") {
    // K4 on 1-4 and K4 on 11-14, bridged by (4, 11): plurality voting
    // keeps each side on its own minimum label
    def k4(base: Long) = for (a <- 0 to 3; b <- (a + 1) to 3)
      yield (base + a, base + b)
    val edges = (k4(1L) ++ k4(11L) :+ ((4L, 11L))).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, "src", "dst", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).map(out).toSet.size == 1, "left clique converges")
    assert((11L to 14L).map(out).toSet.size == 1, "right clique converges")
    assert(out(1L) != out(12L), "the bridge must not merge the cliques")
  }

  test("calibration: a perfectly calibrated score reports frac_pos == its bin") {
    // bin b gets score (b+0.05)/1 with positives at exactly that rate
    val rows = for (b <- 0 until 10; i <- 0 until 20)
      yield (b / 10.0 + 0.05, i < 2 * b) // frac_pos = b/10 per bin... i < 2b of 20
    val out = DataChecks.calibration(rows.toDF("score", "label"),
        "score", "label", bins = 10)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.size == 10)
    for (b <- 0 until 10) {
      val (n, mean, frac) = out(b)
      assert(n == 20)
      assert(math.abs(mean - (b / 10.0 + 0.05)) < 1e-9)
      assert(math.abs(frac - b / 10.0) < 1e-9)
    }
  }

  test("rocAuc: separation, reversal, ties — matches the pair-counting definition") {
    def auc(rows: Seq[(Double, Boolean)]): Option[Double] = {
      val r = DataChecks.rocAuc(rows.toDF("score", "label"), "score", "label").head
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    }
    def brute(rows: Seq[(Double, Boolean)]): Double = {
      val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
      val s = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      BigDecimal(s / (pos.size * neg.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val sep = Seq((0.9, true), (0.8, true), (0.3, false), (0.1, false))
    assert(auc(sep).contains(1.0))
    val rev = sep.map { case (s, l) => (s, !l) }
    assert(auc(rev).contains(0.0))
    val tied = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
    assert(auc(tied).contains(0.5))
    val mixed = Seq((0.9, true), (0.5, true), (0.5, false), (0.5, true),
      (0.2, false), (0.9, false), (0.1, false), (0.7, true))
    assert(auc(mixed).contains(brute(mixed)))
    // single-class input is undefined, not 0/1
    assert(auc(Seq((0.4, true), (0.6, true))).isEmpty)
  }

  test("prCurve: hand-computed confusion counts, exact ratios, brute-force parity") {
    val rows = Seq((0.9, true), (0.8, false), (0.8, true), (0.7, false),
      (0.6, true))
    val got = DataChecks.prCurve(rows.toDF("score", "label"), "score", "label")
      .orderBy(desc("threshold")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (0.9, 1L, 0L, 1.0, 0.333333),
      (0.8, 2L, 1L, 0.666667, 0.666667),
      (0.7, 2L, 2L, 0.5, 0.666667),
      (0.6, 3L, 2L, 0.6, 1.0)))
    // randomized brute-force parity
    val rng = new scala.util.Random(23)
    val rand = Seq.fill(60)((math.rint(rng.nextDouble() * 20) / 20.0,
      rng.nextBoolean()))
    val want = rand.map(_._1).distinct.sorted.reverse.map { t =>
      val pred = rand.map { case (s, y) => (s >= t, y) }
      val tp = pred.count { case (p, y) => p && y }
      val fp = pred.count { case (p, y) => p && !y }
      def r6(a: Int, b: Int) = // half-away integer division, as intRatio6
        ((2000000L * a + b) / (2L * b)).toDouble / 1e6
      (t, tp.toLong, fp.toLong, r6(tp, tp + fp),
        r6(tp, rand.count(_._2)))
    }
    val got2 = DataChecks.prCurve(rand.toDF("score", "label"), "score", "label")
      .orderBy(desc("threshold")).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got2.toSeq == want)
    // no positives -> recall NULL, precision still defined
    val noPos = DataChecks.prCurve(
      Seq((0.5, false), (0.4, false)).toDF("score", "label"),
      "score", "label").collect()
    assert(noPos.forall(_.isNullAt(4)))
    assert(noPos.forall(_.getDouble(3) == 0.0))
  }

  test("bitextMine: a planted translation pair mines; a hub vector does not") {
    val dim = 8
    val rnd = new scala.util.Random(7)
    def noise(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    // A-side 1L and B-side 101L are near-identical (the planted pair);
    // B-side 102L is a hub: the normalized all-ones direction that
    // everything is mildly similar to
    val pairA = Array.tabulate(dim)(i => (1.0 + 0.1 * i).toFloat)
    val pairB = Array.tabulate(dim)(i => (1.0 + 0.1 * i + 0.001).toFloat)
    val a = ((1L, pairA) +: (2L to 10L).map(i => (i, noise()))).toDF("vec_id", "embedding")
    val b = ((101L, pairB) +: (102L, Array.fill(dim)(1.0f)) +:
      (103L to 110L).map(i => (i, noise()))).toDF("vec_id", "embedding")
    val mined = Retrieval.bitextMine(a, b, k = 3, threshold = 1.05)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(mined.contains(1L) && mined(1L)._1 == 101L,
      "planted pair must mine as the forward best match")
    assert(mined(1L)._2 > 1.05)
    // no mined pair may point at the hub with a high margin: the ratio
    // margin divides by the hub's own high average similarity
    mined.values.filter(_._1 == 102L).foreach { case (_, m) =>
      assert(m < mined(1L)._2)
    }
  }

  test("bitextMineLsh: near-identical vectors share buckets and still mine") {
    val dim = 64
    val rnd = new scala.util.Random(11)
    def noise(): Array[Float] = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val pairA = Array.tabulate(dim)(i => (1.0 + 0.1 * (i % 7)).toFloat)
    val pairB = pairA.clone()
    val a = ((1L, pairA) +: (2L to 10L).map(i => (i, noise()))).toDF("vec_id", "embedding")
    val b = ((101L, pairB) +: (103L to 110L).map(i => (i, noise()))).toDF("vec_id", "embedding")
    val mined = Retrieval.bitextMineLsh(a, b, k = 3, threshold = 1.05, dim = dim)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mined.get(1L).contains(101L),
      "identical vectors collide in every table and must mine")
  }

  test("exactStratifiedSample: quotas are exact ceil(n/den) per group") {
    val docs = ((1 to 23).map(i => ("a", i.toLong)) ++
      (24 to 28).map(i => ("b", i.toLong)) ++
      Seq(("c", 99L))).toDF("source", "doc_id")
    val out = Sampling.exactStratifiedSample(docs, "source", "doc_id", 1, 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byGroup = out.groupBy(_._1)
    assert(byGroup("a").length == 5)  // ceil(23/5)
    assert(byGroup("b").length == 1)  // ceil(5/5)
    assert(byGroup("c").length == 1)  // ceil(1/5) — a singleton stratum survives
    assert(out.forall { case (_, _, rank, quota) => rank <= quota })
    // deterministic: same call, same selection
    val again = Sampling.exactStratifiedSample(docs, "source", "doc_id", 1, 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(again == out.map(t => (t._1, t._2)).toSet)
  }

  test("ewmaLagged: renormalizes over present lags; constant series is constant") {
    import graft.core.SeriesOps
    val rows = Seq(
      ("a", new java.sql.Timestamp(1000L), 10.0),
      ("a", new java.sql.Timestamp(2000L), 20.0),
      ("a", new java.sql.Timestamp(3000L), 30.0),
      ("b", new java.sql.Timestamp(1000L), 7.0),
      ("b", new java.sql.Timestamp(2000L), 7.0))
      .toDF("k", "ts", "v")
    val out = SeriesOps.ewmaLagged(rows, Seq("k"), "ts", "v",
        alpha = 0.5, depth = 4)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime) -> r.getDouble(3)).toMap
    // first row: only itself → its own value
    assert(out(("a", 1000L)) == 10.0)
    // second: (20*.5 + 10*.25) / .75
    assert(out(("a", 2000L)) == BigDecimal((20.0 * 0.5 + 10.0 * 0.25) / 0.75)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // third: (30*.5 + 20*.25 + 10*.125) / .875
    assert(out(("a", 3000L)) == BigDecimal((30.0 * 0.5 + 20.0 * 0.25 + 10.0 * 0.125) / 0.875)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // constant series stays constant under any renormalization
    assert(out(("b", 1000L)) == 7.0 && out(("b", 2000L)) == 7.0)
  }

  test("ROUGE-1/2: hand-computed overlaps, clipping, case-fold, empty sides") {
    import spark.implicits._
    val rows = Seq(
      (1L, "the cat sat on the mat", "the cat lay on the mat"),
      (2L, "a a a", "a"), // clipped: min(3,1) = 1
      (3L, "The CAT", "the cat"), // case-folds to identical
      (4L, "x", ""), // empty reference: all zeros
      (5L, "same text here", "same text here"))
      .toDF("id", "cand", "ref")
    val got = TextOps.rougeScores(rows, "cand", "ref")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    // id 1: o1=5 (the:2, cat, on, mat), c1=r1=6 → p=r=f1=5/6;
    //       bigram overlap 3 of 5 → f1 = 6/10
    assert(got(1L) == ((0.833333, 0.833333, 0.833333, 0.6)))
    // id 2: p = 1/3, r = 1/1, f1 = 2/4; no shared bigram (ref has none)
    assert(got(2L) == ((0.333333, 1.0, 0.5, 0.0)))
    // id 3: perfect unigram; single bigram each, equal
    assert(got(3L) == ((1.0, 1.0, 1.0, 1.0)))
    // id 4: empty ref → recall and f1 denominators guard to 0.0
    assert(got(4L) == ((0.0, 0.0, 0.0, 0.0)))
    assert(got(5L) == ((1.0, 1.0, 1.0, 1.0)))
  }
}
