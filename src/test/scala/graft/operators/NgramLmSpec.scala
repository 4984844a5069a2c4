package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram stupid-backoff LM scoring: hand-computed expectations on a
  * corpus exercising all three probability branches, then the
  * hot-head-broadcast twin must be row-identical to the direct join on
  * real data (the provably-identical claim behind the shared oracle).
  */
class NgramLmSpec extends AnyFunSuite with SparkTest {

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("all three backoff branches score as hand-computed") {
    import spark.implicits._
    // train: d1 "a b a b", d2 "a c" -> uni a:3 b:2 c:1, T=6;
    //        bi ab:2 ba:1 ac:1
    val docs = Seq(
      (1L, "tr", "a b a b"),
      (2L, "tr", "a c"),
      (3L, "ev", "a b c z"), // seen bigram / unseen-bigram-seen-w2 / unseen-w2
      (4L, "ev", "solo"),    // <2 tokens -> absent from output
      (5L, "ev", "  "))      // blank -> absent
      .toDF("doc_id", "split", "text")
    val got = NgramLm.scoreDocs(docs, "doc_id", "text",
      col("split") === "tr")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toList

    val ab = r6(math.log(2.0 / 3)) // c12=2, c1(a)=3
    val ba = r6(math.log(1.0 / 2))
    val ac = r6(math.log(1.0 / 3))
    val bc = r6(math.log(0.4 * 1 / 6))        // backoff to uni c:1
    val cz = r6(math.log(0.4 * 0.4 / 6))      // unknown-word floor
    def avg(xs: Double*): Double = r6(xs.sum / xs.length)
    assert(got == List(
      (1L, 3L, avg(ab, ba, ab), 0.0),
      (2L, 1L, avg(ac), 0.0),
      (3L, 3L, avg(ab, bc, cz), r6(2.0 / 3))))
  }

  test("empty train slice fails fast instead of emitting NULL scores") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      NgramLm.scoreDocs(docs, "doc_id", "text", lit(false)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("train slice")))
  }

  test("broadcast-model scoring equals the join path on an uncapped model") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pred = Sampling.hashBucket(col("doc_id"), 100) < 80
    val model = NgramLm.fitModel(docs, "doc_id", "text", pred)
    val viaModel = NgramLm.scoreWith(docs, "doc_id", "text", model)
    val viaJoin = NgramLm.scoreDocs(docs, "doc_id", "text", pred)
    assert(viaModel.count() > 0)
    assert(viaModel.exceptAll(viaJoin).isEmpty &&
      viaJoin.exceptAll(viaModel).isEmpty)
  }

  test("capped model routes the dropped tail through backoff, never throws") {
    import spark.implicits._
    val docs = Seq(
      (1L, "tr", "x x x y rare1 rare2"), // y survives nothing at cap 1
      (2L, "ev", "x y rare1"))
      .toDF("doc_id", "split", "text")
    // vocab cap 1 keeps only 'x'; bigram cap 1 keeps only 'x x' —
    // 'x y' then has a kept w1 but its bigram is dropped, and 'y rare1'
    // has both dropped
    val m = NgramLm.fitModel(docs, "doc_id", "text",
      col("split") === "tr", maxVocab = 1, maxBigrams = 1)
    assert(m.uni.keySet == Set("x") && m.bi.keySet == Set(("x", "x")))
    val got = NgramLm.scoreWith(docs.filter(col("split") === "ev"),
      "doc_id", "text", m).collect()
    assert(got.length == 1 && got(0).getLong(1) == 2L)
    assert(got(0).getDouble(3) == 1.0) // every bigram scored as unseen
  }

  test("broadcast-model scoring matches the join path on hostile unicode") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // tokens drawn from a pool that stresses case mapping (Turkish İ,
    // dotless ı, ß, ligatures, Greek final sigma, fullwidth letters)
    // and unicode whitespace adjacency
    val pool = Seq("İstanbul", "ışık", "STRASSE", "ß", "ﬁle", "ΣΟΦΟΣ",
      "σοφός", "Ｗｉｄｅ", "mixed", "MIXED", "café", "CAFÉ", "a", "b")
    val docs = (0L until 60L).map { i =>
      val n = 2 + rnd.nextInt(8)
      (i, "t" + (i % 3), Seq.fill(n)(pool(rnd.nextInt(pool.size)))
        .mkString(" "))
    }.toDF("doc_id", "split", "text")
    val pred = col("split") === "t0" || col("split") === "t1"
    val model = NgramLm.fitModel(docs, "doc_id", "text", pred)
    val viaModel = NgramLm.scoreWith(docs, "doc_id", "text", model)
    val viaJoin = NgramLm.scoreDocs(docs, "doc_id", "text", pred)
    val a = viaModel.collect().map(_.toSeq).toSet
    val b = viaJoin.collect().map(_.toSeq).toSet
    assert(a == b, s"model-only=${a -- b} join-only=${b -- a}")
  }

  test("hot-bigram broadcast head is row-identical to the direct join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pred = Sampling.hashBucket(col("doc_id"), 100) < 80
    val direct = NgramLm.scoreDocs(docs, "doc_id", "text", pred)
    val hot = NgramLm.scoreDocs(docs, "doc_id", "text", pred,
      hotBigrams = 64)
    assert(direct.count() > 0)
    assert(direct.exceptAll(hot).isEmpty && hot.exceptAll(direct).isEmpty)
    // the model actually backs off somewhere on real data
    assert(direct.filter(col("oov_rate") > 0).count() > 0)
  }

  test("ccnet buckets: per-group tiles are even and ordered by fluency") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pred = Sampling.hashBucket(col("doc_id"), 100) < 80
    val b = NgramLm.ccnetBuckets(docs, "doc_id", "text", pred, "source")
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getString(3)))
    val byGroup = b.groupBy(_._1)
    byGroup.foreach { case (src, rows) =>
      val sizes = rows.groupBy(_._3).view.mapValues(_.length).toMap
      val n = rows.length
      // ntile evenness: bucket sizes differ by at most 1 tile unit
      assert(sizes.values.forall(s => (s - n / 3).abs <= 1), s"$src: $sizes")
      // every head doc scores >= every tail doc within the group
      for {
        h <- rows.filter(_._3 == "head").map(_._2)
        t <- rows.filter(_._3 == "tail").map(_._2)
      } assert(h >= t, s"$src: head $h < tail $t")
    }
    assert(byGroup.nonEmpty)
  }

  test("KN doc scoring: all three branches (seen pair, seen ctx, unseen ctx)") {
    import spark.implicits._
    // train (d1,d2): bi ab:2 ba:1 ac:1 -> N=3; c(a·)=3 n1f(a)=2;
    // c(b·)=1 n1f(b)=1; n1b(a)=n1b(b)=n1b(c)=1
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "a b x"), (4L, "z a"))
      .toDF("doc_id", "text")
    val got = NgramLm.scoreDocsKn(docs, "doc_id", "text", col("doc_id") <= 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // d3 "a b x": (a,b) seen pair p=21/36->0.583333; (b,x) seen ctx,
    // unseen pair, n1b(x)=0 -> ñ=1, p=3/12=0.25. ctx_oov_rate 0.
    val lpAb = r6(math.log(0.583333))
    val lpBx = r6(math.log(0.25))
    val d3 = got.find(_._1 == 3L).get
    assert(d3._2 == 2 &&
      d3._3 == r6Avg(Seq(lpAb, lpBx)) && d3._4 == 0.0, d3.toString)
    // d4 "z a": ctx z unseen -> continuation p = ñ(a)/N = 1/3
    val d4 = got.find(_._1 == 4L).get
    assert(d4._2 == 1 && d4._3 == r6(math.log(0.333333)) && d4._4 == 1.0,
      d4.toString)
  }

  /** exact micro-average of already-round6 terms (the decAvg6 twin) */
  private def r6Avg(xs: Seq[Double]): Double = {
    val micro = xs.map(x => math.round(x * 1e6)).sum
    val n = xs.size
    val q = (math.abs(micro) * 2 + n) / (2L * n)
    (if (micro < 0) -q else q) / 1e6
  }

  test("Kneser-Ney probabilities match the hand-computed x4N identity") {
    import spark.implicits._
    // bi: ab:2 ba:1 ac:1 -> N=3; c(a·)=3 n1f(a)=2; c(b·)=1 n1f(b)=1;
    // n1b(a)=n1b(b)=n1b(c)=1
    //   p(b|a) = (5·3 + 3·2·1)/(4·3·3) = 21/36 = 0.583333
    //   p(a|b) = (1·3 + 3·1·1)/(4·1·3) = 6/12  = 0.5
    //   p(c|a) = (1·3 + 3·2·1)/(4·3·3) = 9/36  = 0.25
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = NgramLm.knProbs(docs, "doc_id", "text", minCount = 1, limit = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(("a", "b", 2L, 0.583333), ("b", "a", 1L, 0.5),
      ("a", "c", 1L, 0.25)))
    // a proper smoothing: conditionals over each context sum to 1
    // when every bigram is kept (check context 'a' over b and c)
    val all = NgramLm.knProbs(docs, "doc_id", "text", minCount = 1, limit = 10)
      .filter(col("w1") === "a").agg(sum("p_kn")).collect()(0).getDouble(0)
    // each term is round6'd, so the sum can be off by up to 1e-6/term
    assert(math.abs(all - (21.0 / 36 + 9.0 / 36)) < 1e-6)
  }
}
