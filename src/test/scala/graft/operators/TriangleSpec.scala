package graft.operators

import graft.SparkTest
import org.scalatest.funsuite.AnyFunSuite

class TriangleSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4: every node sits in 3 triangles") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    assert(counts(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("a star has zero triangles; hub orientation generates no wedges") {
    val star = (2L to 40L).map(i => (1L, i))
    val c = counts(star)
    assert(c.values.forall(_ == 0L) && c.size == 40)
  }

  test("duplicate, reversed and self-loop edges don't inflate counts") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (1L, 1L), (3L, 3L))
    assert(counts(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("matches brute force on a deterministic pseudo-random graph") {
    // splitmix-ish edge sample, fixed — no RNG in tests
    val edges = (0 until 300).map { i =>
      val x = i * 2654435761L
      (math.abs(x % 25) + 1, math.abs((x >> 8) % 25) + 1)
    }.filter { case (a, b) => a != b }
    val got = counts(edges)
    val und = edges.map { case (a, b) => (a min b, a max b) }.toSet
    val nodes = und.flatMap { case (a, b) => Set(a, b) }
    val tris = for {
      a <- nodes.toSeq; b <- nodes.toSeq if a < b; c <- nodes.toSeq if b < c
      if und((a, b)) && und((b, c)) && und((a, c))
    } yield Seq(a, b, c)
    val expect = nodes.map(n => n -> tris.count(_.contains(n)).toLong).toMap
    assert(got == expect)
    assert(tris.nonEmpty, "fixture should contain triangles")
  }
}
