package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompositeKeySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("pack/hi/lo round-trip, including the field boundaries") {
    val B = 51
    val loMax = (1L << B) - 1
    val hiMax = Long.MaxValue >> B
    val parts = Seq(
      (0L, 0L), (0L, loMax), (hiMax, 0L), (hiMax, loMax),
      (9L, 1704844800000000L), (3L, 1L))
    val got = parts.toDF("h", "l")
      .select(CompositeKey.pack(col("h"), col("l"), B).as("k"))
      .select(CompositeKey.hi(col("k"), B), CompositeKey.lo(col("k"), B))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == parts)
  }

  test("packed order IS tuple order (the property range scans lean on)") {
    val B = 20
    val tuples = for (h <- Seq(0L, 1L, 5L, 100L); l <- Seq(0L, 7L, (1L << B) - 1))
      yield (h, l)
    val packed = tuples.toDF("h", "l")
      .select(col("h"), col("l"), CompositeKey.pack(col("h"), col("l"), B).as("k"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(packed.sortBy(_._1).map(_._2).toSeq ==
      packed.map(_._2).sorted.toSeq)
    // range() brackets exactly the tuples with that hi
    val (lo, hi) = CompositeKey.range(5L, 0L, (1L << B) - 1, B)
    val in = packed.filter { case (_, k) => lo <= k && k <= hi }.map(_._1)
    assert(in.forall(_._1 == 5L) && in.length == 3)
  }

  test("out-of-range parts are refused loudly, nulls stay null") {
    val B = 51
    def bad(h: Long, l: Long) = assertThrows[Exception] {
      Seq((h, l)).toDF("h", "l")
        .select(CompositeKey.pack(col("h"), col("l"), B)).collect()
    }
    bad(-1L, 0L)
    bad(0L, -1L)
    bad(0L, 1L << B)
    bad((Long.MaxValue >> B) + 1, 0L)
    val n = Seq((Some(1L), Option.empty[Long])).toDF("h", "l")
      .select(CompositeKey.pack(col("h"), col("l"), B)).collect()
    assert(n.head.isNullAt(0))
  }
}
