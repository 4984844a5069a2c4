package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite with SparkTest {

  test("HLL estimate lands within the p=9 error band on known cardinalities") {
    import spark.implicits._
    // three groups with planted cardinalities well above the raw-
    // estimator bias region (~2.5m = 1280 at p=9)
    val rows = Seq(2000, 5000, 20000).zipWithIndex.flatMap { case (n, g) =>
      (0 until n).map(i => (s"g$g", s"v${g}_$i"))
    } ++ (0 until 3000).map(i => ("g0", s"v0_${i % 2000}")) // duplicates
    val df = rows.toDF("grp", "v")
    val est = Sketches.hllDistinct(df, Seq("grp"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((g, exact) <- Seq("g0" -> 2000.0, "g1" -> 5000.0, "g2" -> 20000.0)) {
      val rel = math.abs(est(g) - exact) / exact
      // 1.04/sqrt(512) ≈ 4.6% standard error; 3 sigma ≈ 14%
      assert(rel < 0.14, s"$g: est ${est(g)} vs $exact (rel $rel)")
    }
  }

  test("HLL registers are max-mergeable: split input == whole input") {
    import spark.implicits._
    val all = (0 until 4000).map(i => ("g", s"x$i")).toDF("grp", "v")
    val whole = Sketches.hllDistinct(all, Seq("grp"), col("v"))
      .collect().head.getDouble(1)
    // the same values arriving twice (two "days" unioned) must yield
    // the identical estimate — registers are maxes, duplicates vanish
    val doubled = Sketches.hllDistinct(all.union(all), Seq("grp"), col("v"))
      .collect().head.getDouble(1)
    assert(whole == doubled)
  }

  test("CMS estimates never undercount and are exact for heavy hitters") {
    import spark.implicits._
    // zipfish stream: token t_k appears ~N/k times
    val stream = (1 to 60).flatMap(k => Seq.fill(1200 / k)(s"t$k")).toDF("v")
    val counters = Sketches.cmsCounters(stream, col("v"))
    val truth = stream.groupBy("v").agg(count(lit(1)).as("n_true"))
    val est = Sketches.cmsEstimate(counters, truth, "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(est.nonEmpty)
    // CMS is a strict over-estimator: collisions only ever add
    est.foreach { case (v, t, e) => assert(e >= t, s"$v: est $e < true $t") }
    // 60 distinct values in 4×1024 counters: the min over 4 rows is
    // collision-free with overwhelming probability
    est.foreach { case (v, t, e) => assert(e == t, s"$v: est $e != true $t") }
  }

  test("CMS estimate reports 0 for candidates absent from the stream") {
    import spark.implicits._
    val stream = (1 to 30).flatMap(k => Seq.fill(300 / k)(s"t$k")).toDF("v")
    val counters = Sketches.cmsCounters(stream, col("v"))
    // candidates the stream never saw: every one must appear, with a
    // (probably) zero estimate — and never vanish from the output
    val unseen = (1 to 50).map(i => s"never_$i").toDF("v")
    val est = Sketches.cmsEstimate(counters, unseen, "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.size == 50)
    // 30 distinct stream values in 4×1024 counters: an unseen value
    // colliding in ALL 4 rows is ~(30/1024)^4 ≈ 7e-7 — expect exact 0s
    assert(est.values.forall(_ == 0L), est.toString)
  }

  test("HLL and Bloom skip NULL values like count(DISTINCT) does") {
    import spark.implicits._
    val clean = (0 until 3000).map(i => Option(s"x$i")).toDF("v")
    val dirty = ((0 until 3000).map(i => Option(s"x$i")) ++
      Seq.fill(7)(Option.empty[String])).toDF("v")
    val a = Sketches.hllDistinct(clean, Seq.empty, col("v")).collect().head.getDouble(0)
    val b = Sketches.hllDistinct(dirty, Seq.empty, col("v")).collect().head.getDouble(0)
    assert(a == b, s"NULLs shifted the HLL estimate: $a vs $b")
    val wa = Sketches.bloomBuild(clean, col("v"), 4096, 5)
    val wb = Sketches.bloomBuild(dirty, col("v"), 4096, 5)
    assert(wa.sameElements(wb), "NULL rows set phantom Bloom bits")
  }

  test("weighted CMS counters from a frequency table == raw-stream counters") {
    import spark.implicits._
    val stream = (1 to 40).flatMap(k => Seq.fill(800 / k)(s"t$k")).toDF("v")
    val raw = Sketches.cmsCounters(stream, col("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val tf = stream.groupBy("v").agg(count(lit(1)).as("n"))
    val weighted = Sketches.cmsCountersWeighted(tf, col("v"), col("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(raw == weighted)
  }

  test("Bloom filter: zero false negatives, bounded false positives, UDF==Column hash") {
    import spark.implicits._
    val members = (0 until 200).map(i => s"member_$i")
    val df = members.toDF("v")
    val mBits = 4096; val k = 5
    val words = Sketches.bloomBuild(df, col("v"), mBits, k)
    val test = Sketches.bloomMightContain(words, mBits, k)
    // every inserted value MUST hit (the filter's only hard guarantee)
    val memberHits = df.withColumn("hit", test(col("v")))
      .filter(!col("hit")).count()
    assert(memberHits == 0)
    // non-members: ~(1-e^(-kn/m))^k ≈ 0.9% expected FP rate here
    val others = (0 until 2000).map(i => s"other_$i").toDF("v")
    val fps = others.withColumn("hit", test(col("v"))).filter(col("hit")).count()
    assert(fps < 100, s"implausible FP count $fps / 2000")
    // the UDF's JVM md5 positions must equal the Column form that built
    // the filter — otherwise membership silently breaks
    val colPos = df.limit(20)
      .select(explode(sequence(lit(0), lit(k - 1))).as("i"), col("v"))
      .select(col("v"), col("i"), Sketches.bloomPosition(col("i"), col("v"), mBits).as("p"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val digest = java.security.MessageDigest.getInstance("MD5")
    colPos.foreach { case ((v, i), p) =>
      val hex = digest.digest((i + ":" + v).getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      digest.reset()
      assert(java.lang.Long.parseLong(hex, 16) % mBits == p, s"$v/$i")
    }
  }

  test("CMS counters are additive across splits") {
    import spark.implicits._
    val a = (1 to 500).map(i => s"w${i % 40}").toDF("v")
    val b = (1 to 700).map(i => s"w${i % 55}").toDF("v")
    val merged = Sketches.cmsCounters(a.union(b), col("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val summed = Sketches.cmsCounters(a, col("v")).union(Sketches.cmsCounters(b, col("v")))
      .groupBy("__r", "__bkt").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == summed)
  }

  test("KMV estimates land within the k=256 error band; set algebra matches planted overlaps") {
    import spark.implicits._
    val k = 256
    // planted sets with known overlap: A = 0..7999, B = 4000..13999
    val a = (0 until 8000).map(i => s"e$i").toDF("v")
    val b = (4000 until 14000).map(i => s"e$i").toDF("v")
    val ska = Sketches.kmvSketch(a, col("v"), k)
    val skb = Sketches.kmvSketch(b, col("v"), k)
    def within(est: Double, truth: Double, tol: Double) =
      assert(math.abs(est - truth) <= tol * truth, s"est $est vs $truth")
    within(Sketches.kmvEstimate(ska, k).collect().head.getDouble(0), 8000, 0.2)
    within(Sketches.kmvEstimate(skb, k).collect().head.getDouble(0), 10000, 0.2)
    val ops = Sketches.kmvSetOps(ska, skb, k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    within(ops("union"), 14000, 0.2)
    within(ops("intersect"), 4000, 0.35) // θ-sample of the overlap: wider band
    within(ops("diff_ab"), 4000, 0.35)
  }

  test("KMV exact path: an unsaturated sketch counts exactly, including empty") {
    import spark.implicits._
    val k = 256
    val tiny = (0 until 37).map(i => s"t$i").toDF("v")
    assert(Sketches.kmvEstimate(Sketches.kmvSketch(tiny, col("v"), k), k)
      .collect().head.getDouble(0) == 37.0)
    val empty = Seq.empty[String].toDF("v")
    assert(Sketches.kmvEstimate(Sketches.kmvSketch(empty, col("v"), k), k)
      .collect().head.getDouble(0) == 0.0)
    // two unsaturated sketches: set ops are EXACT
    val c = (0 until 40).map(i => s"t$i").toDF("v")
    val ops = Sketches.kmvSetOps(
      Sketches.kmvSketch(tiny, col("v"), k),
      Sketches.kmvSketch(c, col("v"), k), k)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ops == Map("union" -> 40.0, "intersect" -> 37.0, "diff_ab" -> 0.0))
  }

  test("KMV via KMinAgg: sketch set identical to distinct+TakeOrdered; ONE aggregate, no distinct") {
    import spark.implicits._
    val k = 64
    // heavy duplication across partitions so partial buffers actually
    // dedup (each partition sees most of the distinct domain)
    val data = (0 until 20000).map(i => s"p${i % 5000}").toDF("v")
      .repartition(8)
    val viaAgg = Sketches.kmvSketch(data, col("v"), k)
      .collect().map(_.getLong(0)).toSeq
    // the reference form: full distinct then k-min
    val unfiltered = data.where(col("v").isNotNull)
      .select(Sketches.kmvHash(col("v")).as("__h"))
      .distinct().orderBy("__h").limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(viaAgg == unfiltered,
      "KMinAgg must not change the sketch set (or its order)")
    assert(viaAgg.size == k)
    // plan pin: one k_min_agg aggregate pair (partial + final), no
    // distinct hash-aggregate, no TakeOrdered, no MapPartitions —
    // merged buffers are <= k longs each
    val plan = Sketches.kmvSketch(data, col("v"), k)
      .queryExecution.executedPlan.toString
    assert(plan.contains("k_min_agg"), plan)
    assert(!plan.contains("TakeOrdered"), plan)
    assert(!plan.contains("MapPartitions"), plan)
    // exactly one aggregation (rendered as partial+final pair), not
    // a second one for a distinct
    assert("ObjectHashAggregate|SortAggregate".r
      .findAllIn(plan).size <= 4, plan)
  }

  test("KMinAgg: null-safe, sub-k groups return all distinct values, serialize round-trips") {
    import spark.implicits._
    val df = Seq[java.lang.Long](5L, null, 3L, 5L, 9L, 3L).toDF("h")
    val got = df.agg(graft.functions.KMin.agg(col("h"), 10).as("ks"))
      .select(explode(col("ks"))).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 5L, 9L))
    // k = 1 keeps only the minimum
    val one = df.agg(graft.functions.KMin.agg(col("h"), 1).as("ks"))
      .select(explode(col("ks"))).collect().map(_.getLong(0)).toSeq
    assert(one == Seq(3L))
    // empty input: empty array, not null
    val empty = spark.range(0).select(col("id").as("h"))
      .agg(graft.functions.KMin.agg(col("h"), 4).as("ks"))
      .collect()
    assert(empty.head.getSeq[Long](0).isEmpty)
    // partition-count invariance (forces serialize/merge paths)
    val wide = (0 until 10000).map(i => (i * 2654435761L) % 100000L)
      .toDF("h").repartition(16)
    val a = wide.agg(graft.functions.KMin.agg(col("h"), 32).as("ks"))
      .select(explode(col("ks"))).collect().map(_.getLong(0)).toSeq
    val b = wide.coalesce(1)
      .agg(graft.functions.KMin.agg(col("h"), 32).as("ks"))
      .select(explode(col("ks"))).collect().map(_.getLong(0)).toSeq
    assert(a == b && a.size == 32)
  }

  test("KMV union of sketch states equals the sketch of the union (mergeability)") {
    import spark.implicits._
    val k = 128
    val a = (0 until 5000).map(i => s"m$i").toDF("v")
    val b = (2500 until 9000).map(i => s"m$i").toDF("v")
    // merging = k smallest distinct hashes across the two STATES; it
    // must equal sketching the concatenated data directly — the
    // property that lets per-slice artifacts roll up to a corpus
    // sketch without re-reading any slice
    val viaStates = Sketches.kmvSketch(a, col("v"), k)
      .unionByName(Sketches.kmvSketch(b, col("v"), k))
      .distinct().orderBy("__h").limit(k)
      .collect().map(_.getLong(0)).toSeq
    val direct = Sketches.kmvSketch(a.unionByName(b), col("v"), k)
      .collect().map(_.getLong(0)).toSeq
    assert(viaStates == direct)
  }
}
