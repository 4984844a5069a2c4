package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al., NeurIPS 2023):
  * pick the raw-corpus examples whose hashed n-gram profile looks most
  * like a target domain — the standard way a pretraining pipeline tilts
  * a web crawl toward a high-quality reference corpus without training
  * a classifier per domain.
  *
  * Features are the paper's: word unigrams + bigrams, WITH multiplicity
  * (DSIR counts feature occurrences; the dedup shingle sets elsewhere
  * in this package are deliberately distinct), hashed into a fixed
  * bucket space. Each side (target, raw) gets a smoothed bag-of-buckets
  * model p̂ / q̂; a document's log importance weight is
  * Σ_grams (ln p̂(b) − ln q̂(b)).
  *
  * Distributed shape: both bucket tables are `buckets` rows — tiny
  * aggregates of one explode scan each, broadcast back — so scoring is
  * explode → broadcast-join → one groupBy(id) shuffle, and selection is
  * a TakeOrdered top-N. Nothing corpus-sized touches the driver, and
  * the bucket space is a CONSTANT: unlike the hyperplane-LSH family
  * (SCALING.md's one super-linear knob), feature collisions don't grow
  * pair work — they only blur the estimate, exactly as in the paper.
  *
  * Determinism discipline (the [[NgramLm]] precedent): md5-derived
  * bucket ids (engine-portable), ln-probs rounded to 6 decimals, the
  * per-gram difference rounded to 6 before an order-free DECIMAL(28,6)
  * sum, final weight rounded back to 6 — the whole computation replays
  * value-exactly in DuckDB.
  */
object Dsir {

  /** One row per gram occurrence (unigrams + bigrams, WITH
    * multiplicity) carrying its bucket id. The token array is
    * materialized as a real column FIRST — referenced from inside the
    * bigram lambda as an attribute, not an expression tree, so the
    * interpreted higher-order transform can't re-run the regex split
    * per element (the q_condition_eval lesson: that re-evaluation is
    * the difference between scan-bound and quadratic-per-doc). The md5
    * bucket hash runs on EXPLODED rows — plain codegen'd expressions,
    * no lambda in the hot path.
    */
  private def explodeGrams(df: DataFrame, keep: Seq[String], textCol: String,
                           buckets: Int): DataFrame = {
    val toksed = df.withColumn("__toks", TextOps.tokens(col(textCol)))
    val bigrams = when(size(col("__toks")) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(col("__toks")) - 1),
        i => concat_ws(" ", element_at(col("__toks"), i),
          element_at(col("__toks"), i + 1))))
    toksed
      .select(keep.map(col) :+
        explode(concat(col("__toks"), bigrams)).as("__g"): _*)
      .select(keep.map(col) :+
        (conv(substring(md5(col("__g")), 1, 8), 16, 10).cast("long") % buckets)
          .as("bk"): _*)
  }

  /** Smoothed (add-1 over `buckets`) round6 ln-prob table for one side:
    * exactly `buckets` rows, built off spark.range so unseen buckets
    * carry their smoothing mass.
    */
  private def lnTable(grams: DataFrame, buckets: Int, outCol: String): DataFrame = {
    val spark = grams.sparkSession
    val counts = grams.groupBy("bk").agg(count(lit(1)).as("__c"))
    val total = counts.agg(coalesce(sum("__c"), lit(0L)).as("__t"))
    spark.range(buckets).toDF("bk")
      .join(counts, Seq("bk"), "left")
      .crossJoin(broadcast(total))
      .select(col("bk"),
        round(log((coalesce(col("__c"), lit(0L)) + lit(1)).cast("double") /
          (col("__t") + lit(buckets)).cast("double")), 6).as(outCol))
  }

  /** Per-document log importance weight ln p̂(doc) − ln q̂(doc) under
    * the hashed-gram bag model. Every raw document appears in the
    * output; gram-free documents weigh exactly 0.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int = 64): DataFrame = {
    require(buckets > 0)
    // the gram relation feeds BOTH the raw-side fit and the scoring
    // join — materialize it once instead of re-running the explode scan
    // per consumer (the q_curate_pipeline localCheckpoint discipline)
    val rawG = explodeGrams(raw, Seq(idCol), textCol, buckets)
      .localCheckpoint(eager = false)
    val tgtG = explodeGrams(target, Seq.empty, textCol, buckets)
    val tbl = lnTable(tgtG, buckets, "__lnp")
      .join(lnTable(rawG.select("bk"), buckets, "__lnq"), "bk")
    val weights = rawG.join(broadcast(tbl), "bk")
      .select(col(idCol), round(col("__lnp") - col("__lnq"), 6).as("__w"))
      .groupBy(idCol)
      .agg(round(sum(col("__w").cast("decimal(28,6)")).cast("double"), 6)
        .as("weight"))
    raw.select(col(idCol)).join(weights, Seq(idCol), "left")
      .na.fill(0.0, Seq("weight"))
  }

  /** Deterministic DSIR selection: the top-N raw documents by
    * importance weight. (The paper resamples with Gumbel noise; the
    * argmax form is the reproducible gate variant — add a seeded Gumbel
    * column to `weight` to recover the sampled one.)
    */
  def selectTopN(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, buckets: Int = 64, topN: Int = 100): DataFrame =
    importanceWeights(raw, target, idCol, textCol, buckets)
      .orderBy(desc("weight"), col(idCol))
      .limit(topN)
}
