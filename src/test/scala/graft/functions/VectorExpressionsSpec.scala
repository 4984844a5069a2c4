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
