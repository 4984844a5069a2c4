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
