package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Corpus-level distribution diagnostics for training-data curation:
  * the statistics a corpus card reports to decide whether a crawl
  * slice looks like natural language before it is mixed in.
  *
  * - [[zipfFit]]: OLS fit of the token log-rank/log-frequency curve.
  *   Natural language sits near slope −1 (Zipf's law); machine-
  *   generated or template spam bends the curve, so the slope is a
  *   cheap corpus-health signal.
  * - [[distinctNgrams]]: distinct-n diversity ratios (Li et al. 2016)
  *   — the fraction of n-gram OCCURRENCES that are unique; collapsing
  *   ratios flag repetitive/boilerplate-heavy slices.
  *
  * Distributed shape: both reduce to one token/gram explode scan and a
  * vocabulary-sized groupBy — the same partial-aggregated shuffle the
  * corpus card already pays. zipfFit's regression then runs on a
  * top-K-bounded relation (a constant: limit → one ≤K-row window →
  * one-row aggregate); distinctNgrams' two-level count (group then
  * count groups) is the skew-safe distinct the other corpus stats use.
  *
  * Determinism discipline: ln/products rounded to 6 decimals before
  * order-free DECIMAL(28,6) sums; slope is rounded BEFORE the
  * intercept consumes it — both engines then do identical double
  * arithmetic (the NgramLm precedent).
  */
object CorpusStats {

  /** One row per n-gram occurrence (token array materialized as a
    * column first — the interpreted-lambda lesson, SCALING.md r10).
    */
  private def gramsOfN(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    val toksed = docs.withColumn("__toks", TextOps.tokens(col(textCol)))
    val grams =
      if (n == 1) col("__toks")
      else when(size(col("__toks")) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(1), size(col("__toks")) - lit(n - 1)),
          i => concat_ws(" ", slice(col("__toks"), i, lit(n)))))
    toksed.select(explode(grams).as("g"))
  }

  /** Distinct-n diversity: (n, total, uniq, distinct_ratio) for each
    * requested n.
    */
  def distinctNgrams(docs: DataFrame, textCol: String,
                     ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(ns.nonEmpty)
    ns.map { n =>
      gramsOfN(docs, textCol, n)
        .groupBy("g").agg(count(lit(1)).as("__c"))
        .agg(count(lit(1)).as("uniq"), sum(col("__c")).as("total"))
        .select(lit(n).as("n"), col("total"), col("uniq"),
          round(col("uniq") / col("total").cast("double"), 6).as("distinct_ratio"))
    }.reduce(_.unionByName(_))
  }

  /** Exact per-group quality percentiles by nearest-rank selection
    * (rank ⌈q·n⌉ in (score, id) order — deterministic, no
    * interpolation): the per-source table an adaptive filter reads to
    * set group-relative thresholds instead of one global cutoff (a
    * global bar silently deletes entire low-scoring-but-wanted
    * sources; a per-source bar trims each one's own tail).
    *
    * The rank window partitions by group — one reducer per source,
    * bounded by source size; a mega-source at 100 TB swaps in the
    * approximate percentile sketch, same output contract.
    *
    * @return (groupCol, n, p25, p50, p75)
    */
  def qualityPercentiles(docs: DataFrame, groupCol: String, idCol: String,
                         textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("__q"), col(idCol))
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
    def pick(q: Double, out: String) =
      max(when(col("__rk") === ceil(col("__n") * lit(q)), col("__q"))).as(out)
    docs.select(col(groupCol), col(idCol),
        TextOps.qualityScore(col(textCol)).as("__q"))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wg))
      .groupBy(groupCol)
      .agg(max(col("__n")).as("n"), pick(0.25, "p25"), pick(0.5, "p50"),
        pick(0.75, "p75"))
  }

  /** OLS fit of ln(freq) ~ ln(rank) over the top-K token frequencies.
    * Returns one row (k, slope, intercept).
    */
  def zipfFit(docs: DataFrame, textCol: String, topK: Int = 1000): DataFrame = {
    require(topK > 1)
    val tf = docs.select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("__f"))
      .orderBy(desc("__f"), col("tok")).limit(topK)
    // ≤K rows from here: single-reducer window over a bounded relation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(length(col("tok")), lit(1)))
      .orderBy(desc("__f"), col("tok"))
    val xy = tf.withColumn("__rk", row_number().over(w))
      .select(round(log(col("__rk")), 6).as("x"),
        round(log(col("__f")), 6).as("y"))
    def dsum(c: Column) = sum(c.cast("decimal(28,6)")).cast("double")
    val s = xy.agg(count(lit(1)).as("k"),
      dsum(round(col("x") * col("y"), 6)).as("__sxy"),
      dsum(col("x")).as("__sx"), dsum(col("y")).as("__sy"),
      dsum(round(col("x") * col("x"), 6)).as("__sxx"))
    s.withColumn("slope",
        round((col("k") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("k") * col("__sxx") - col("__sx") * col("__sx")), 6))
      .select(col("k"), col("slope"),
        round((col("__sy") - col("slope") * col("__sx")) / col("k"), 6)
          .as("intercept"))
  }

  /** Top-k collocations by pointwise mutual information over adjacent
    * token pairs — PMI(w1,w2) = ln(c12·T / (c1·c2)) (Church & Hanks
    * 1990), the classic phrase-mining signal (a corpus card lists
    * them; tokenizer training seeds multi-word merges from them).
    *
    * Scale: pair and unigram counts are vocab-sized groupBys with
    * map-side combine; `minCount` prunes the pair tail BEFORE the two
    * vocab-scale count joins, so the joins touch only collocation
    * candidates; the final top-k orders a pruned relation. The ln is
    * rounded to 6 (the repo oracle discipline); counts and the total
    * are exact integers, the product/quotient exact IEEE at corpus
    * magnitudes.
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
                      minCount: Long = 5, topK: Int = 50): DataFrame = {
    require(minCount >= 1 && topK >= 1)
    val toksed = docs.withColumn("__toks", TextOps.tokens(col(textCol)))
      .localCheckpoint(eager = false) // feeds pair AND unigram scans
    val pairs = toksed.filter(size(col("__toks")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("__toks")) - 1),
        i => struct(element_at(col("__toks"), i).as("w1"),
          element_at(col("__toks"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val uni = toksed.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum(col("c")).as("t")) // single row
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    bi.join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(tot))
      .withColumn("pmi", round(log(col("c12").cast("double") * col("t") /
        (col("c1") * col("c2"))), 6))
      .orderBy(desc("pmi"), col("w1"), col("w2")).limit(topK)
      .select("w1", "w2", "c12", "c1", "c2", "pmi")
  }

  /** Per-document character-level Shannon entropy — the cheap
    * garbage-content detector (base64 blobs, minified code, random
    * strings sit far above natural prose; truncation/repetition junk
    * far below). H = −Σ p_c·ln(p_c) over the character distribution.
    *
    * One explode to (id, char) rows, a per-(id, char) count, and a
    * per-doc aggregate — the character alphabet bounds the inner
    * relation. Determinism: ln rounded to 6, each term rounded to 6
    * into a DECIMAL(28,6) sum (the PSI/LM discipline), final round6.
    *
    * @return (idCol, n_chars_t, entropy) — empty docs report 0 chars
    *         and NULL entropy
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = docs.select(col(idCol), explode(split(col(textCol), "")).as("__c"))
      .filter(col("__c") =!= "")
    val counts = chars.groupBy(idCol, "__c").agg(count(lit(1)).as("__n"))
      .localCheckpoint(eager = false) // feeds totals AND terms
    val totals = counts.groupBy(idCol).agg(sum("__n").as("__t"))
    val p = col("__n").cast("double") / col("__t").cast("double")
    val perDoc = counts.join(totals, idCol)
      .select(col(idCol), col("__t"),
        round(p * round(log(p), 6), 6).as("__term"))
      .groupBy(idCol)
      .agg(max("__t").as("__t"),
        sum(col("__term").cast("decimal(28,6)")).cast("double").as("__s"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__t"), lit(0L)).as("n_chars_t"),
        when(col("__t").isNull, lit(null).cast("double"))
          .otherwise(round(-col("__s"), 6)).as("entropy"))
  }

  /** Per-document novelty score — the memorization-risk signal (Lee et
    * al. 2022's duplication analysis, inverted): the fraction of a
    * document's `k`-token windows whose fingerprint occurs EXACTLY ONCE
    * in the whole corpus. novelty 1.0 = every window is unique to this
    * document; 0.0 = every window also appears elsewhere (a doc the
    * span-dedup pass would gut). Curation uses it to up-weight novel
    * text and to audit what exact-span dedup is about to remove.
    *
    * Distributed shape (the [[Dedup.removeDuplicateSpans]] layout): one
    * explode to (id, window-md5) rows — 32-hex keys shuffle, bodies
    * never do — a corpus-wide count per fingerprint (partial-aggregated,
    * hot boilerplate windows combine map-side), a join back on the
    * fingerprint, and a per-doc aggregate. Window COUNTS are occurrence
    * counts, so a window repeated inside one document already makes
    * that window non-novel — within-doc self-duplication is
    * memorization risk too.
    *
    * @return (idCol, n_windows, n_novel, novelty) — docs with fewer
    *         than `k` tokens report 0 windows and NULL novelty
    */
  def noveltyScores(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 8): DataFrame = {
    require(k >= 2)
    val toks = docs.select(col(idCol),
      TextOps.tokens(col(textCol)).as("__toks"))
    val grams = toks.filter(size(col("__toks")) >= k)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("__toks")) - k),
        i => md5(concat_ws(" ", slice(col("__toks"), i + 1, lit(k))))))
        .as("__fp"))
    val freq = grams.groupBy("__fp").agg(count(lit(1)).as("__n"))
    val perDoc = grams.join(freq, "__fp")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("__n") === 1, 1L).otherwise(0L)).as("n_novel"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(col("n_windows").isNull, lit(null).cast("double"))
          .otherwise(graft.core.Round6.intRatio6(col("n_novel"),
            col("n_windows"))).as("novelty"))
  }
}
