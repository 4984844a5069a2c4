package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed full-batch training of a linear model over corpus-scale
  * features — the "fit a quality regressor in T scans of 100 TB" shape:
  * each gradient-descent iteration is ONE aggregation job (a handful of
  * DECIMAL-exact sums), the model state is four doubles that broadcast
  * back into the next scan as literals, and nothing else ever leaves
  * the executors. The same layout trains any linear/logistic head whose
  * gradient is a per-row term summed over the corpus (cf. the classic
  * MLlib linear-model design: per-partition gradient partials,
  * tree-combined).
  *
  * Determinism discipline (what makes the gate a FULL value oracle):
  * per-row terms are IEEE double expressions with pinned left-assoc
  * structure, accumulated in DECIMAL(38,12) (exact, order-independent)
  * and cast back — both engines produce bit-identical gradients, hence
  * bit-identical weight trajectories. No exp/log in the features or the
  * loss (plain least squares), so there is no transcendental-ulp risk.
  */
object LinearModel {

  /** The cheap quality features (shared fragments with
    * [[TextOps.qualityScore]], so the oracle reuses the already-proven
    * SQL): length saturation, punctuation ratio, raw stopword ratio.
    */
  private def feats(text: Column): (Column, Column, Column) = {
    val nTok = size(TextOps.tokens(text)).cast("double")
    val x1 = least(nTok / lit(50.0), lit(1.0))
    val x2 = TextOps.punctCount(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val x3 = TextOps.stopwordHits(TextOps.tokens(text)).cast("double") /
      greatest(nTok, lit(1.0))
    (x1, x2, x3)
  }

  /** Fit `y ≈ w0 + w1·lenScore + w2·punctRatio + w3·stopRatio` against
    * the heuristic quality target by `iters` rounds of full-batch
    * gradient descent from w=0. Returns one row per iteration:
    * (iter, w0..w3 AFTER the update, mse BEFORE it — the trajectory a
    * training log would show).
    */
  def fitQualityGd(docs: DataFrame, textCol: String = "text",
                   iters: Int = 3, lr: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trajectory(docs, textCol, iters, lr)
      .toDF("iter", "w0", "w1", "w2", "w3", "mse")
  }

  /** The trained weights after `iters` rounds — the broadcastable model
    * artifact [[predictQuality]] applies at scan time.
    */
  def fitWeights(docs: DataFrame, textCol: String = "text",
                 iters: Int = 3, lr: Double = 0.5): Array[Double] = {
    val t = trajectory(docs, textCol, iters, lr).last
    Array(t._2, t._3, t._4, t._5)
  }

  private def trajectory(docs: DataFrame, textCol: String, iters: Int,
      lr: Double): Seq[(Int, Double, Double, Double, Double, Double)] = {
    val (x1, x2, x3) = feats(col(textCol))
    // one materialization; every iteration re-reads features, not text
    val f = docs.select(x1.as("x1"), x2.as("x2"), x3.as("x3"),
      TextOps.qualityScore(col(textCol)).as("y")).localCheckpoint(false)
    trajectoryOver(f, iters, lr)
  }

  /** GD rounds over an ALREADY-extracted feature frame (x1,x2,x3,y
    * columns; extra columns like an id ride along unread) — lets
    * train-then-apply callers pay the regex feature scan once.
    */
  private def trajectoryOver(f: DataFrame, iters: Int,
      lr: Double): Seq[(Int, Double, Double, Double, Double, Double)] = {
    def decSum(c: Column) = sum(c.cast("decimal(38,12)")).cast("double")
    var w = Array(0.0, 0.0, 0.0, 0.0)
    (1 to iters).map { it =>
      // pinned left-assoc: (((w0 + w1*x1) + w2*x2) + w3*x3) - y
      val resid = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
        lit(w(3)) * col("x3") - col("y")
      val r = f.agg(decSum(resid).as("g0"), decSum(resid * col("x1")).as("g1"),
        decSum(resid * col("x2")).as("g2"), decSum(resid * col("x3")).as("g3"),
        decSum(resid * resid).as("ms"), count(lit(1)).as("n")).collect().head
      val n = r.getLong(5)
      val mse = r.getDouble(4) / n
      w = Array.tabulate(4)(j => w(j) - lr * (r.getDouble(j) / n))
      (it, w(0), w(1), w(2), w(3), mse)
    }
  }

  /** Apply trained weights at scan speed: per-doc prediction with the
    * same pinned-structure linear form, plus the absolute error against
    * the heuristic target — the monitoring relation a curation run
    * would emit. Weights ride in as literals (a broadcast model in the
    * codegen sense: zero join, zero state).
    */
  def predictQuality(docs: DataFrame, w: Array[Double],
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val (x1, x2, x3) = feats(col(textCol))
    val pred = lit(w(0)) + lit(w(1)) * x1 + lit(w(2)) * x2 + lit(w(3)) * x3
    docs.select(col(idCol),
      pred.as("pred"),
      abs(pred - TextOps.qualityScore(col(textCol))).as("abs_err"))
  }

  /** Train-then-apply paying the regex feature extraction ONCE: the id-
    * carrying feature frame is checkpointed, the GD trajectory
    * aggregates over it, and the fitted weights apply back over the
    * SAME frame — versus [[fitWeights]]+[[predictQuality]], which
    * re-tokenizes the text a fourth time for the apply scan. Output and
    * weight trajectory are bit-identical (the features are
    * deterministic), only the redundant scans go away.
    */
  def fitPredict(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", iters: Int = 3,
                 lr: Double = 0.5): DataFrame = {
    val (x1, x2, x3) = feats(col(textCol))
    val f = docs.select(col(idCol), x1.as("x1"), x2.as("x2"), x3.as("x3"),
      TextOps.qualityScore(col(textCol)).as("y")).localCheckpoint(false)
    val t = trajectoryOver(f, iters, lr).last
    val w = Array(t._2, t._3, t._4, t._5)
    val pred = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
      lit(w(3)) * col("x3")
    f.select(col(idCol), pred.as("pred"), abs(pred - col("y")).as("abs_err"))
  }
}
