package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite with SparkTest {

  private def refDot(a: Array[Float], b: Array[Float]): Double = {
    var acc = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
    acc
  }

  test("fvec_dot / fvec_cosine match the reference loops, incl. ragged lengths") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(50) { i =>
      val la = 1 + rnd.nextInt(8)
      val lb = 1 + rnd.nextInt(8)
      (i.toLong, Array.fill(la)(rnd.nextFloat() - 0.5f), Array.fill(lb)(rnd.nextFloat() - 0.5f))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id",
        VectorExpressions.fvecDot($"a", $"b").as("d"),
        VectorExpressions.fvecCosine($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { case (id, a, b) =>
      val (d, c) = got(id)
      assert(d == refDot(a, b), s"dot mismatch id=$id")
      val expC = refDot(a, b) / (math.sqrt(refDot(a, a)) * math.sqrt(refDot(b, b)))
      assert(c == expC, s"cosine mismatch id=$id")
    }
  }

  test("null inputs produce null, not a crash") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f, 2.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val r = df.select(VectorExpressions.fvecCosine($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  private def refJaccard(a: Seq[String], b: Seq[String]): Double =
    if (a.isEmpty || b.isEmpty) 0.0
    else {
      val common = a.toSet.intersect(b.toSet).size
      java.math.BigDecimal.valueOf(common.toDouble / (a.size + b.size - common))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }

  test("arr_jaccard matches the set-arithmetic reference, incl. edges") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ümlaut ø", "x y z", "")
    val rows = Seq.tabulate(60) { i =>
      def draw() = rnd.shuffle(vocab).take(rnd.nextInt(vocab.size + 1))
      (i.toLong, draw(), draw())
    } :+ (100L, Seq.empty[String], Seq("aa")) :+
      (101L, Seq("aa", "bb"), Seq("aa", "bb"))
    val got = rows.toDF("id", "a", "b")
      .select($"id", VectorExpressions.arrJaccard($"a", $"b").as("j"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { case (id, a, b) =>
      assert(got(id) == refJaccard(a, b), s"jaccard mismatch id=$id a=$a b=$b")
    }
    assert(got(100L) == 0.0 && got(101L) == 1.0)
  }

  test("arr_jaccard runs inside whole-stage codegen over a range source") {
    val df = spark.range(50)
      .select(col("id"),
        array((0 until 5).map(i => concat(lit("s"), (col("id") + i).cast("string"))): _*).as("a"),
        array((0 until 5).map(i => concat(lit("s"), (col("id") + i + 2).cast("string"))): _*).as("b"))
      .select(VectorExpressions.arrJaccard(col("a"), col("b")).as("j"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.trim.startsWith("*(")), plan)
    // 5-element arrays offset by 2 → 3 common of 7 distinct = 0.428571
    val vals = df.collect().map(_.getDouble(0)).distinct.toSeq
    assert(vals == Seq(0.428571), vals.toString)
  }

  test("zorder2: interleave matches a bit-by-bit reference") {
    val rnd = new scala.util.Random(11)
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16)
        z |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      z
    }
    for (_ <- 0 until 500) {
      val a = rnd.nextLong() & 0xffffL
      val b = rnd.nextLong() & 0xffffL
      assert(ZOrder2.interleave(a, b) == ref(a, b), s"($a, $b)")
    }
    // masking: bits above 16 are ignored
    assert(ZOrder2.interleave(0x1ffffL, 0L) == ZOrder2.interleave(0xffffL, 0L))
  }

  test("zorder2 sort yields bounded 2-D locality per chunk") {
    import spark.implicits._
    // full 64x64 grid: 64 consecutive Morton codes form an aligned 8x8
    // block, so every 64-row chunk of the z-sorted grid spans EXACTLY
    // 7 in both dims; an x-then-y sort spans the full 63 in y
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
      .withColumn("z", VectorExpressions.zorder2($"x", $"y"))
    val zSorted = df.orderBy("z").collect().map(r => (r.getLong(0), r.getLong(1)))
    val spreads = zSorted.grouped(64).map { chunk =>
      val xs = chunk.map(_._1); val ys = chunk.map(_._2)
      (xs.max - xs.min, ys.max - ys.min)
    }.toSeq
    assert(spreads.forall { case (sx, sy) => sx == 7 && sy == 7 }, spreads.take(3))
    val linSorted = grid.sortBy(identity)
    val linY = linSorted.grouped(64).map(c => c.map(_._2).max - c.map(_._2).min)
    assert(linY.forall(_ == 63)) // the locality z-order buys
  }

  test("expressions run inside whole-stage codegen (no fallback)") {
    // a range source (not a local relation, which constant-folds away)
    val df = spark.range(100)
      .select(col("id"),
        array((0 until 8).map(i => (col("id") + i).cast("float")): _*).as("a"),
        array((0 until 8).map(i => (col("id") * 2 + i).cast("float")): _*).as("b"))
      .select(VectorExpressions.fvecCosine(col("a"), col("b")).as("c"))
    // the `*(n)` star prefix marks operators inside a WholeStageCodegen
    // stage; a fallback expression would strip it from the Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.trim.startsWith("*(")), plan)
    assert(df.count() == 100)
  }
}
