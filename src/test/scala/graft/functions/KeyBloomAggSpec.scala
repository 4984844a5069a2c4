package graft.functions

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KeyBloomAggSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  test("no false negatives, partition-invariant bits, sane FPR") {
    val mBits = 1 << 14
    val keys = (0L until 1000L).map(_ * 37L + 5L)
    def bloomOf(partitions: Int): Array[Byte] =
      keys.toDF("k").repartition(partitions)
        .agg(KeyBloom.agg(col("k"), mBits).as("b"))
        .collect().head.getAs[Array[Byte]](0)
    val b1 = bloomOf(1)
    // merge is byte-OR, so the filter is a pure SET of the keys'
    // probe bits — identical bytes under any partitioning
    assert(java.util.Arrays.equals(b1, bloomOf(7)))
    assert(java.util.Arrays.equals(b1, bloomOf(32)))
    // never a false negative
    assert(keys.forall(KeyBloom.mightContain(b1, _)))
    // false-positive rate lands in the theory band: kn/m ≈ 0.244,
    // (1 − e^−0.244)^4 ≈ 2.3e-3 — allow generous slack either side
    val probes = (0L until 20000L).map(_ * 37L + 6L) // never inserted
    val fp = probes.count(KeyBloom.mightContain(b1, _))
    assert(fp < 200, s"FPR too high: $fp / 20000")
    // nulls don't contribute bits
    val bn = Seq[Option[Long]](Some(keys.head), None).toDF("k")
      .agg(KeyBloom.agg(col("k"), mBits)).collect().head.getAs[Array[Byte]](0)
    val expect = new Array[Byte](mBits / 8)
    KeyBloom.set(expect, keys.head, mBits)
    assert(java.util.Arrays.equals(bn, expect))
  }
}
