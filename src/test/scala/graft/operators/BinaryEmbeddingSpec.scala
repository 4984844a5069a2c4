package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BinaryEmbeddingSpec extends AnyFunSuite with SparkTest {

  private val sf = "/root/testdata/sf0.001"
  private def vecs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("packed words equal a direct scala recompute of the sign bits") {
    import spark.implicits._
    val floats = vecs.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    val packed = Similarity.binaryQuantize(vecs)
      .select(col("vec_id").cast("long"), col("bits"))
      .as[(Long, Array[Long])].collect()
    assert(packed.nonEmpty)
    packed.foreach { case (id, bits) =>
      val emb = floats(id)
      assert(bits.length == 2)
      (0 until 64).foreach { j =>
        val expected = if (emb(j) > 0f) 1L else 0L
        val got = (bits(j / 32) >> (j % 32)) & 1L
        assert(got == expected, s"vec $id bit $j")
      }
      // unsigned-word invariant: no sign bit in play
      assert(bits.forall(w => w >= 0 && w <= 0xffffffffL))
    }
  }

  test("self-retrieval: every query finds itself at rank 1 with dist 0") {
    val top = Similarity.hammingTopK(vecs, vecs.filter(col("vec_id") < 5), k = 3)
      .filter(col("rank") === 1).collect()
    assert(top.length == 5)
    top.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) && r.getLong(2) == 0L)
    }
  }

  test("hamming neighbors approximate cosine neighbors (recall audit)") {
    import spark.implicits._
    val queries = vecs.filter(col("vec_id") < 5)
    val ham = Similarity.hammingTopK(vecs, queries, k = 10)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val cos = Similarity.bruteForceTopK(vecs, queries, k = 10)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = ham.map { case (q, h) =>
      h.intersect(cos(q)).size.toDouble / 10.0 }.toSeq
    val mean = recalls.sum / recalls.size
    // 64 sign bits on 64 dims: not exact, but far above chance
    // (chance ≈ 10/500 = 0.02); bound pinned loose to stay stable
    assert(mean >= 0.3, s"mean hamming@10 recall vs cosine = $mean")
  }
}
