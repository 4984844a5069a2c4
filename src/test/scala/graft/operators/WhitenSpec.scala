package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WhitenSpec extends AnyFunSuite with SparkTest {

  private val sf = "/root/testdata/sf0.001"
  private def vecs = spark.read.parquet(s"$sf/embeddings.parquet")

  test("jacobi recovers a known eigensystem") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1
    val (vals, vecsM) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)), sweeps = 16)
    assert(vals.sorted.zip(Seq(1.0, 3.0)).forall {
      case (a, b) => math.abs(a - b) < 1e-12 })
    // eigenvectors orthonormal
    val dot = vecsM(0)(0) * vecsM(0)(1) + vecsM(1)(0) * vecsM(1)(1)
    assert(math.abs(dot) < 1e-12)
  }

  test("covariance matrix is partition-invariant (exact long sums)") {
    val c1 = Similarity.covarianceMatrix(vecs.repartition(1)).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val c7 = Similarity.covarianceMatrix(vecs.repartition(7)).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(c1 == c7)
    assert(c1.size == 64 * 64)
    // symmetric, positive diagonal
    c1.foreach { case ((i, j), v) => assert(v == c1((j, i))) }
    (0 until 64).foreach(i => assert(c1((i, i)) >= 0.0))
  }

  test("gate margin: top-16 whitened covariance is within 1e-3 of identity") {
    // the q_embed_whiten gate rounds this block to 2 decimals against a
    // closed-form identity oracle; the rounding boundary is 0.005 —
    // require 5× headroom so quantization noise can't flip a cell
    val w = Similarity.whiten(vecs, eps = 1e-9)
      .select(col("vec_id"), col("whitened").as("embedding"))
    val cov = Similarity.covarianceMatrix(w).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val worst = (for (i <- 0 until 16; j <- 0 until 16) yield
      math.abs(cov((i, j)) - (if (i == j) 1.0 else 0.0))).max
    assert(worst < 1e-3, s"gate margin eroded: max |cov - I| = $worst")
  }

  test("whitened embeddings have ~identity covariance") {
    import spark.implicits._
    val w = Similarity.whiten(vecs)
      .select(col("vec_id"), col("whitened").as("embedding"))
    val cov = Similarity.covarianceMatrix(w).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    (0 until 64).foreach { i =>
      assert(math.abs(cov((i, i)) - 1.0) < 0.05, s"diag $i = ${cov((i, i))}")
      (0 until 64).foreach { j =>
        if (i != j) assert(math.abs(cov((i, j))) < 0.05, s"off ($i,$j)")
      }
    }
  }
}
