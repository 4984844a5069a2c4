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

  // ---- fastText-class logistic classifier over hashed n-grams ------

  /** Sigmoid lookup table, the public fastText trick (Joulin et al.
    * 2016 "Bag of Tricks" reference implementation precomputes sigmoid
    * over 512 cells of [−8, 8]): σ̃(z) = table[clamp(⌊(z+8)·32⌋, 0,
    * 511)]. Entries round to 6 decimals ONCE on the driver and embed
    * as literals in BOTH the Spark plan and the generated oracle SQL —
    * so the only transcendental in the whole trajectory is evaluated
    * nowhere at query time, and cross-engine exp/ln ulp divergence is
    * structurally impossible. Clamping to the table (never exactly
    * 0/1) keeps the ln-loss tables finite.
    */
  private[graft] val sigmoidTable: Array[Double] = Array.tabulate(512) { k =>
    val x = -8.0 + k.toDouble / 32.0
    java.math.BigDecimal.valueOf(1.0 / (1.0 + math.exp(-x)))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }
  private[graft] val lnSigTable: Array[Double] = sigmoidTable.map(s =>
    java.math.BigDecimal.valueOf(math.log(s))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
  private[graft] val ln1mSigTable: Array[Double] = sigmoidTable.map(s =>
    java.math.BigDecimal.valueOf(math.log1p(-s))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())

  /** Hashed-n-gram feature relation: (doc_id, bucket, xnorm) with
    * lowercased unigrams + adjacent bigrams md5-hashed into `buckets`
    * cells, counts mean-normalized per doc (xnorm = cnt/Σcnt — the
    * fastText averaging, which also keeps full-batch GD
    * well-conditioned: every doc's feature mass is 1 regardless of
    * length, so the stable-lr bound doesn't depend on corpus length
    * statistics), plus one BIAS row per doc at bucket index `buckets`
    * with xnorm = 1. One tokenize+explode scan; the output is (docs ×
    * distinct-buckets)-sized, never gram-sized, because counts
    * collapse per (doc, bucket) before anything joins.
    *
    * PRECONDITION: `idCol` is unique in `docs` (every caller trains or
    * scores one row per document; the oracles assume the same). Under
    * duplicated ids the per-row token count is not the per-ID gram
    * total, so xnorm would be denominated per row, not per id — the
    * same class of garbage the old window form produced (doubled bias
    * rows), just a different shape of it.
    */
  private def hashedGramFeatures(docs: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame = {
    val toks = TextOps.tokens(lower(col(textCol)))
    val base = docs.select(col(idCol), toks.as("__t"))
    val n = size(col("__t"))
    // unigrams ++ adjacent bigrams as ONE array per doc: the previous
    // shape scanned/tokenized the corpus twice (a unigram branch and a
    // bigram branch unioned back together) and then paid a WINDOW
    // shuffle just to recover the per-doc gram total — but that total
    // is simply the gram-array length, known before the explode. Same
    // gram multiset per doc, same md5 buckets, same cnt/len division →
    // bit-identical xnorm; one tokenize scan, one exchange (the
    // groupBy), zero window.
    val grams = concat(col("__t"),
      when(n >= 2, zip_with(
        slice(col("__t"), lit(1), n - 1),
        slice(col("__t"), lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b)))
        .otherwise(array().cast("array<string>")))
    val bucket = conv(substring(md5(col("gram")), 1, 8), 16, 10)
      .cast("long") % buckets
    val perBucket = base.select(col(idCol), col("__t"))
      .select(col(idCol), size(col("__t")).as("__n"),
        explode(grams).as("gram"))
      .groupBy(col(idCol), col("__n"), bucket.as("bucket"))
      .agg(count(lit(1)).as("__cnt"))
      // per-doc gram total from the token count alone: n unigrams plus
      // max(n-1, 0) bigrams — exactly the window sum this replaces
      .select(col(idCol), col("bucket"),
        (col("__cnt").cast("double") /
          (col("__n") + greatest(col("__n") - 1, lit(0))).cast("double"))
          .as("xnorm"))
    perBucket.unionByName(docs.select(col(idCol),
      lit(buckets.toLong).as("bucket"), lit(1.0).as("xnorm")))
  }

  /** Model-representation crossover: up to this many buckets the
    * (buckets+1)-double model rides as a PLAN LITERAL (`typedLit` +
    * `element_at` — zero join, inlined into codegen) and the
    * per-iteration gradient collects to a driver map. Past it, both
    * stop being the right shape — a fastText-real model is 2M buckets,
    * and a 2M-element literal array bloats every plan while the
    * gradient collect ships MBs per iteration — so the model becomes a
    * broadcast-joined weight RELATION (bucket, w) and the GD update a
    * metadata-sized left join, with the arithmetic structured
    * IDENTICALLY (same IEEE ops, same DECIMAL sums) so both paths
    * produce bit-equal trajectories at any common bucket count
    * (pinned by `LogitPathParitySpec`). The sweep in SCALING.md
    * locates the measured crossover.
    */
  private[graft] val literalModelMaxBuckets = 4096

  /** The ONE routing predicate for the model representation — every
    * auto-switching entry point (fit/predict/score) must branch on
    * this, never on a re-inlined comparison, so a future threshold or
    * policy change lands everywhere at once.
    */
  private def viaRelationFor(buckets: Int): Boolean =
    buckets > literalModelMaxBuckets

  /** Full-batch logistic GD over hashed n-gram features — the
    * fastText-class quality/language gate (linear head over a hashed
    * bag of 1/2-grams), in the same train-in-T-scans shape as
    * [[fitQualityGd]]: each iteration is one z-aggregation plus one
    * gradient aggregation over the checkpointed feature relation, the
    * (buckets+1)-double model broadcasts back (as a literal array up
    * to [[literalModelMaxBuckets]], as a broadcast weight relation
    * past it), and per-term products accumulate in DECIMAL(38,12) so
    * the weight trajectory replays bit-exactly in the oracle's
    * unrolled CTEs.
    *
    * @param label boolean column on `docs` (the training target)
    * @return (iter, bucket, w, loss): weights AFTER each update,
    *         mean ln-loss BEFORE it, one row per (iteration, bucket)
    */
  def fitLogitGd(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", label: Column,
                 buckets: Int = 64, iters: Int = 3,
                 lr: Double = 0.5): DataFrame =
    if (!viaRelationFor(buckets)) {
      val spark = docs.sparkSession
      import spark.implicits._
      val (w, traj, _, _) = logitTrajectory(docs, idCol, textCol, label,
        buckets, iters, lr, withLoss = true)
      require(w.length == buckets + 1)
      traj.toDF("iter", "bucket", "w", "loss")
    } else {
      val spark = docs.sparkSession
      val (_, iterOut, _, _) = logitTrajectoryRel(docs, idCol, textCol,
        label, buckets, iters, lr, withLoss = true)
      // the loop runs on the ACTIVE bucket support; the trajectory
      // contract is one row per (iteration, bucket), so densify here —
      // off-support buckets provably hold exactly +0.0 at every
      // iteration (see logitTrajectoryRel)
      val dense = spark.range(buckets + 1L).select(col("id").as("bucket"))
      iterOut.map { case (it, wr, loss) =>
        dense.join(wr, Seq("bucket"), "left")
          .select(lit(it).as("iter"), col("bucket"),
            coalesce(col("__w"), lit(0.0)).as("w"), lit(loss).as("loss"))
      }.reduce(_.unionByName(_))
    }

  /** Train then score every doc with the fitted logistic model at scan
    * speed: (doc_id, sigma, pred) with σ̃ from the shared table and
    * pred = σ̃ ≥ 0.5. The feature relation is built once and reused by
    * the GD scans and the apply.
    */
  def fitPredictLogit(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", label: Column,
                      buckets: Int = 64, iters: Int = 3,
                      lr: Double = 0.5): DataFrame =
    fitPredictLogitVia(docs, idCol, textCol, label, buckets, iters, lr,
      viaRelation = viaRelationFor(buckets))

  /** [[fitPredictLogit]] with the model-representation path pinned —
    * the sweep bench compares both at one bucket count; production
    * callers use the auto-switching public method.
    */
  private[graft] def fitPredictLogitVia(docs: DataFrame, idCol: String,
      textCol: String, label: Column, buckets: Int, iters: Int,
      lr: Double, viaRelation: Boolean): DataFrame =
    if (!viaRelation) {
      val (w, _, f, d) = logitTrajectory(docs, idCol, textCol, label,
        buckets, iters, lr, withLoss = false)
      val zs = zSigma(f, d, idCol, w)
      zs.select(col(idCol), col("__sig").as("sigma"),
        (col("__sig") >= 0.5).as("pred"))
    } else {
      val (wRel, _, f, d) = logitTrajectoryRel(docs, idCol, textCol,
        label, buckets, iters, lr, withLoss = false)
      zSigmaRel(f, d, idCol, wRel)
        .select(col(idCol), col("__sig").as("sigma"),
          (col("__sig") >= 0.5).as("pred"))
    }

  /** Train, then emit the RAW logit score z per doc (the margin —
    * monotone in σ̃ but at full resolution, where σ̃ is quantized to
    * the 512 table cells). The threshold-picking surface: a PR curve
    * over z has one point per distinct margin, not per table cell.
    */
  def fitScoreLogit(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", label: Column,
                    buckets: Int = 64, iters: Int = 3,
                    lr: Double = 0.5): DataFrame =
    if (!viaRelationFor(buckets)) {
      val (w, _, f, d) = logitTrajectory(docs, idCol, textCol, label,
        buckets, iters, lr, withLoss = false)
      zSigma(f, d, idCol, w).select(col(idCol), col("__z").as("z"))
    } else {
      val (wRel, _, f, d) = logitTrajectoryRel(docs, idCol, textCol,
        label, buckets, iters, lr, withLoss = false)
      zSigmaRel(f, d, idCol, wRel).select(col(idCol), col("__z").as("z"))
    }

  /** The trained model as a (bucket, w) RELATION — the broadcastable
    * artifact at realistic (fastText-default 2M) bucket counts, where
    * a plan-literal array stops being the right shape. Store it, join
    * it, [[predictLogitWithRel]] it.
    */
  def logitWeightsRel(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", label: Column,
                      buckets: Int = 64, iters: Int = 3,
                      lr: Double = 0.5): DataFrame = {
    val (wRel, _, _, _) = logitTrajectoryRel(docs, idCol, textCol, label,
      buckets, iters, lr, withLoss = false)
    // densify: the stored-model artifact keeps its one-row-per-bucket
    // contract; off-support buckets are exactly +0.0 (see
    // logitTrajectoryRel) — one model-sized left join at OUTPUT time
    // instead of per GD iteration
    docs.sparkSession.range(buckets + 1L).select(col("id").as("bucket"))
      .join(wRel, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("__w"), lit(0.0)).as("w"))
  }

  /** Score `docs` with an already-trained (bucket, w) weight relation:
    * the model rides as a BROADCAST join against the feature relation
    * — the shape that scales to fastText-real bucket counts (a 2M ×
    * 8-byte model is a ~16 MB broadcast, not a 2M-element plan
    * literal). Bit-parity with [[predictLogitWith]] at any common
    * bucket count: the per-term multiply, DECIMAL sum and table
    * lookup are structurally identical.
    */
  def predictLogitWithRel(docs: DataFrame, wRel: DataFrame,
                          idCol: String = "doc_id",
                          textCol: String = "text",
                          buckets: Int = 64): DataFrame = {
    val f = hashedGramFeatures(docs, idCol, textCol, buckets)
    val d = docs.select(col(idCol), lit(0.0).as("__y"))
    zSigmaRel(f, d, idCol,
        wRel.select(col("bucket"), col("w").as("__w")))
      .select(col(idCol), col("__sig").as("sigma"),
        (col("__sig") >= 0.5).as("pred"))
  }

  /** The trained (buckets+1)-double logistic model — the broadcastable
    * artifact [[predictLogitWith]] applies, e.g. to a STREAM of
    * arriving documents (train on the standing corpus, score forever).
    */
  def logitWeights(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", label: Column,
                   buckets: Int = 64, iters: Int = 3,
                   lr: Double = 0.5): Array[Double] =
    logitTrajectory(docs, idCol, textCol, label, buckets, iters, lr,
      withLoss = false)._1

  /** Score `docs` with an already-trained logistic model: the weights
    * ride as a literal array (broadcast in the codegen sense), the
    * sigmoid is the shared table — a stateless per-doc projection,
    * which is what makes it safe inside a streaming foreachBatch.
    */
  def predictLogitWith(docs: DataFrame, w: Array[Double],
                       idCol: String = "doc_id",
                       textCol: String = "text",
                       buckets: Int = 64): DataFrame = {
    require(w.length == buckets + 1)
    val f = hashedGramFeatures(docs, idCol, textCol, buckets)
    val d = docs.select(col(idCol), lit(0.0).as("__y"))
    zSigma(f, d, idCol, w)
      .select(col(idCol), col("__sig").as("sigma"),
        (col("__sig") >= 0.5).as("pred"))
  }

  /** (doc_id, z, σ̃, y) for weight vector `w` over feature frame `f`
    * and label frame `d`.
    */
  private def zSigma(f: DataFrame, d: DataFrame, idCol: String,
                     w: Array[Double]): DataFrame = {
    val wLit = typedLit(w.toSeq)
    val sigLit = typedLit(sigmoidTable.toSeq)
    val z = f.groupBy(col(idCol))
      .agg(sum((col("xnorm") * element_at(wLit, col("bucket").cast("int") + 1))
        .cast("decimal(38,12)")).cast("double").as("__z"))
    z.join(d, idCol)
      .withColumn("__idx",
        least(greatest(floor((col("__z") + 8.0) * 32.0).cast("int"), lit(0)),
          lit(511)))
      .withColumn("__sig", element_at(sigLit, col("__idx") + 1))
  }

  /** (doc_id, z, σ̃, y) for a weight RELATION (bucket, __w): the
    * broadcast-join twin of [[zSigma]]. The per-term multiply
    * `xnorm · w`, the DECIMAL(38,12) sum and the table lookup are the
    * same IEEE ops in the same order as the literal path — only HOW
    * the weight value reaches the multiply differs (broadcast-join
    * row vs inlined literal), so the two paths are bit-equal.
    */
  private def zSigmaRel(f: DataFrame, d: DataFrame, idCol: String,
                        wRel: DataFrame): DataFrame = {
    val sigLit = typedLit(sigmoidTable.toSeq)
    val z = f.join(broadcast(wRel), "bucket")
      .groupBy(col(idCol))
      .agg(sum((col("xnorm") * col("__w")).cast("decimal(38,12)"))
        .cast("double").as("__z"))
    z.join(d, idCol)
      .withColumn("__idx",
        least(greatest(floor((col("__z") + 8.0) * 32.0).cast("int"), lit(0)),
          lit(511)))
      .withColumn("__sig", element_at(sigLit, col("__idx") + 1))
  }

  /** The GD loop with the model kept DISTRIBUTED as a (bucket, __w)
    * relation end to end: z is a broadcast join of the checkpointed
    * features with the current weights, the gradient stays a
    * (bucket, g) relation, and the update is a model-sized left join
    * `w − lr·(coalesce(g,0)/n)` — nothing model-sized ever collects
    * to the driver or inlines into a plan. Per-iteration weight
    * relations are localCheckpointed (the [[Graph.pageRank]] lineage
    * discipline). The arithmetic mirrors the driver loop of
    * [[logitTrajectory]] token for token, so trajectories are
    * bit-equal across paths at any common bucket count.
    *
    * The loop carries only the ACTIVE bucket support — the distinct
    * buckets that occur in the feature relation (bias included; it
    * occurs for every doc). Off-support buckets hold exactly +0.0 at
    * every iteration of the dense loop this replaces: w starts 0.0,
    * the gradient relation only ever contains f's buckets (it is an
    * f-join aggregate), and `0.0 − lr·(coalesce(NULL→0.0)/n)` is
    * `+0.0` in IEEE — so z (an inner join on f.bucket ⊆ support),
    * the gradient, the loss and every per-doc output are bit-equal,
    * while the per-iteration checkpoint/broadcast shrink from
    * O(buckets) to O(min(buckets, distinct grams)). At fastText-real
    * width over a web corpus the support saturates to all buckets and
    * this IS the dense loop; below saturation the dense rows were
    * pure overhead. Callers whose OUTPUT is bucket-complete
    * ([[fitLogitGd]], [[logitWeightsRel]]) densify once at the end.
    *
    * @param withLoss when false, the per-iteration mean-ln-loss jobs
    *   are skipped entirely (loss is observational — it never feeds
    *   the weight trajectory) and the z/σ̃ frame stays un-checkpointed
    *   (it then has a single consumer, the gradient join); the
    *   returned per-iter losses are NaN.
    * @return (final weights, per-iter (iter, weights, loss), f, d)
    */
  private def logitTrajectoryRel(docs: DataFrame, idCol: String,
      textCol: String, label: Column, buckets: Int, iters: Int,
      lr: Double, withLoss: Boolean): (DataFrame, Seq[(Int, DataFrame, Double)],
        DataFrame, DataFrame) = {
    require(buckets >= 1 && iters >= 1)
    val f = hashedGramFeatures(docs, idCol, textCol, buckets)
      .localCheckpoint(eager = false)
    val d = docs.select(col(idCol),
        when(label, 1.0).otherwise(0.0).as("__y"))
      .localCheckpoint(eager = false)
    val n = d.count()
    require(n > 0, "empty training set")
    val lnSigLit = typedLit(lnSigTable.toSeq)
    val ln1mLit = typedLit(ln1mSigTable.toSeq)
    var wRel = f.select(col("bucket")).distinct()
      .withColumn("__w", lit(0.0))
      .localCheckpoint(eager = false)
    val iterOut = (1 to iters).map { it =>
      val zs0 = zSigmaRel(f, d, idCol, wRel)
        .withColumn("__resid", col("__sig") - col("__y"))
      val (zs, loss) =
        if (!withLoss) (zs0, Double.NaN)
        else {
          val z = zs0.withColumn("__lt",
              -(col("__y") * element_at(lnSigLit, col("__idx") + 1) +
                (lit(1.0) - col("__y")) * element_at(ln1mLit, col("__idx") + 1)))
            .localCheckpoint(eager = false)
          val l = z.agg(sum(col("__lt").cast("decimal(38,12)"))
            .cast("double").as("l")).collect().head.getDouble(0) / n
          (z, l)
        }
      val g = f.join(zs.select(col(idCol), col("__resid")), idCol)
        .groupBy("bucket")
        .agg(sum((col("__resid") * col("xnorm")).cast("decimal(38,12)"))
          .cast("double").as("__g"))
      wRel = wRel.join(g, Seq("bucket"), "left")
        .select(col("bucket"),
          (col("__w") - lit(lr) * (coalesce(col("__g"), lit(0.0)) /
            lit(n.toDouble))).as("__w"))
        .localCheckpoint(eager = false)
      (it, wRel, loss)
    }
    (wRel, iterOut, f, d)
  }

  /** Driver-loop GD at literal-model widths. `withLoss = false` skips
    * the observational per-iteration loss job (and the z/σ̃ checkpoint
    * it required — without the loss aggregate the frame has a single
    * consumer); the weight trajectory is untouched and the traj rows'
    * loss slots are NaN (callers that skip loss never emit them).
    */
  private def logitTrajectory(docs: DataFrame, idCol: String,
      textCol: String, label: Column, buckets: Int, iters: Int,
      lr: Double, withLoss: Boolean): (Array[Double],
        Seq[(Int, Long, Double, Double)], DataFrame, DataFrame) = {
    require(buckets >= 1 && iters >= 1)
    val f = hashedGramFeatures(docs, idCol, textCol, buckets)
      .localCheckpoint(eager = false)
    val d = docs.select(col(idCol),
        when(label, 1.0).otherwise(0.0).as("__y"))
      .localCheckpoint(eager = false)
    val n = d.count()
    require(n > 0, "empty training set")
    val lnSigLit = typedLit(lnSigTable.toSeq)
    val ln1mLit = typedLit(ln1mSigTable.toSeq)
    var w = Array.fill(buckets + 1)(0.0)
    val traj = (1 to iters).flatMap { it =>
      val zs0 = zSigma(f, d, idCol, w)
        .withColumn("__resid", col("__sig") - col("__y"))
      val (zs, loss) =
        if (!withLoss) (zs0, Double.NaN)
        else {
          val z = zs0.withColumn("__lt",
              -(col("__y") * element_at(lnSigLit, col("__idx") + 1) +
                (lit(1.0) - col("__y")) * element_at(ln1mLit, col("__idx") + 1)))
            .localCheckpoint(eager = false)
          val l = z.agg(sum(col("__lt").cast("decimal(38,12)"))
            .cast("double").as("l")).collect().head.getDouble(0) / n
          (z, l)
        }
      val g = f.join(zs.select(col(idCol), col("__resid")), idCol)
        .groupBy("bucket")
        .agg(sum((col("__resid") * col("xnorm")).cast("decimal(38,12)"))
          .cast("double").as("g"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      w = Array.tabulate(buckets + 1)(b =>
        w(b) - lr * (g.getOrElse(b.toLong, 0.0) / n))
      (0 to buckets).map(b => (it, b.toLong, w(b), loss))
    }
    (w, traj, f, d)
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
