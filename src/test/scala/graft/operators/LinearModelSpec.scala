package graft.operators

import graft.SparkTest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The GD fit must actually LEARN, not just replay deterministically:
  * monotone mse descent, and a final mse that beats the best constant
  * predictor (else the features carry no signal / lr diverged).
  */
class LinearModelSpec extends AnyFunSuite with SparkTest {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("gd descends monotonically and beats the constant predictor") {
    val t = LinearModel.fitQualityGd(docs).orderBy("iter")
      .collect().map(r => (r.getInt(0), r.getDouble(5)))
    assert(t.map(_._1).toSeq == Seq(1, 2, 3))
    val mses = t.map(_._2)
    assert(mses.sliding(2).forall(p => p(1) < p(0)),
      s"mse not descending: ${mses.mkString(", ")}")
    // variance of y = mse of the best constant model; iteration 1's mse
    // is exactly E[y^2] (w=0), so by iter 3 the fit must be below Var(y)
    val y = docs.select(TextOps.qualityScore(col("text")).as("y"))
      .collect().map(_.getDouble(0))
    val mean = y.sum / y.length
    val varY = y.map(v => (v - mean) * (v - mean)).sum / y.length
    assert(mses.last < varY,
      s"final mse ${mses.last} not below constant-model variance $varY")
  }

  test("predict applies the final trajectory weights and tracks the target") {
    val traj = LinearModel.fitQualityGd(docs).orderBy("iter").collect()
    val w = LinearModel.fitWeights(docs)
    val last = traj.last
    assert(w.toSeq == Seq(last.getDouble(1), last.getDouble(2),
      last.getDouble(3), last.getDouble(4)))
    val preds = LinearModel.predictQuality(docs, w).collect()
    assert(preds.length == docs.count())
    // mean |error| must beat the trivial predict-the-mean baseline
    val y = docs.select(TextOps.qualityScore(col("text")).as("y"))
      .collect().map(_.getDouble(0))
    val mean = y.sum / y.length
    val maeConst = y.map(v => math.abs(v - mean)).sum / y.length
    val mae = preds.map(_.getDouble(2)).sum / preds.length
    assert(mae < maeConst, s"model mae $mae not below constant-model mae $maeConst")
  }

  test("trajectory is deterministic across runs") {
    val a = LinearModel.fitQualityGd(docs).collect().map(_.toSeq)
    val b = LinearModel.fitQualityGd(docs).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
