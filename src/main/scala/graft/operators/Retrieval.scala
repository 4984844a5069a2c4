package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus retrieval scoring — Okapi BM25 (Robertson & Walker 1994;
  * the public formula every search stack uses). In a training-data
  * pipeline this is the query side of curation: "find the documents
  * most about X" for targeted decontamination, mixture probing, and
  * eval-leak audits — the retrieval twin of [[Dedup.decontaminate]]'s
  * containment test.
  *
  * Distributed shape: one scan builds per-doc term frequencies for the
  * query terms only (the filter pushes into the explode — posting
  * lists for three terms, not an index over the whole vocabulary);
  * document frequencies and the corpus length stats are tiny
  * aggregates broadcast back; scoring is then a per-row expression and
  * the only shuffle is the final (score, id) top-k. Nothing
  * corpus-sized ever sits on the driver.
  *
  * Determinism discipline (the [[NgramLm]] precedent): the ln-based
  * idf is rounded to 6 decimals, every per-term score is rounded to 6
  * decimals before entering a DECIMAL(28,6) sum — summation order
  * stops mattering — and the final score rounds back to 6. The whole
  * computation replays value-exactly in DuckDB.
  */
object Retrieval {

  /** Top-k documents for `query` under BM25 with the standard
    * k1 = 1.2, b = 0.75. Returns (idCol, score), fully ordered by
    * (score DESC, id) for determinism.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               query: Seq[String], topK: Int = 20): DataFrame = {
    require(query.nonEmpty, "empty query")
    val toks = docs.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
    val lens = toks.select(col(idCol), size(col("__toks")).cast("long").as("__len"))
    // corpus stats: one row — DECIMAL-exact mean length
    val stats = lens.agg(count(lit(1)).as("__n"),
      (sum(col("__len").cast("decimal(38,6)")).cast("double") / count(lit(1)))
        .as("__avg"))
    val tf = toks.select(col(idCol), explode(col("__toks")).as("__t"))
      .filter(col("__t").isin(query: _*))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__tf"))
    val dfT = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
    val idf = dfT.crossJoin(broadcast(stats))
      .select(col("__t"),
        round(log((col("__n") - col("__df") + lit(0.5)) /
          (col("__df") + lit(0.5)) + lit(1.0)), 6).as("__idf"),
        col("__avg"))
    // per-term BM25 contribution, round6 before the order-free sum;
    // expression structure mirrors the oracle SQL token for token
    val perTerm = tf.join(lens, Seq(idCol))
      .join(broadcast(idf), Seq("__t"))
      .select(col(idCol),
        round(col("__idf") * (col("__tf") * lit(2.2)) /
          (col("__tf") + lit(1.2) *
            (lit(0.25) + (lit(0.75) * col("__len")) / col("__avg"))), 6)
          .as("__s"))
    perTerm.groupBy(idCol)
      .agg(round(sum(col("__s").cast("decimal(28,6)")).cast("double"), 6)
        .as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(topK)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * combine any number of (id, score) rankings — typically sparse
    * BM25 and dense cosine top-k — by summing 1/(kRrf + rank). Only
    * ranks enter the fusion, so score-scale mismatch between the
    * retrieval families is irrelevant; this is the standard hybrid
    * front door of a RAG / curation stack.
    *
    * Distributed shape: each input ranking is already top-k truncated,
    * a CONSTANT-size relation at any corpus scale — all the heavy
    * lifting happened in the retrieval runs that produced them. The
    * per-list rank window therefore runs over ≤k rows (partitioned on
    * a non-foldable constant, one reducer, bounded input by
    * construction), and the fused aggregate touches ≤ lists×k rows.
    *
    * Determinism discipline: rank = row_number over (score DESC, id);
    * each reciprocal is rounded to 6 decimals before the order-free
    * DECIMAL(28,6) sum, and the fused score rounds back to 6 — the
    * whole fusion replays value-exactly in DuckDB.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, scoreCol: String,
              kRrf: Int = 60, topK: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "no rankings to fuse")
    val contribs = rankings.map { r =>
      // bounded ≤k rows: a single-reducer window is the right plan here
      val w = Window.partitionBy(pmod(col(idCol), lit(1)))
        .orderBy(col(scoreCol).desc, col(idCol))
      r.select(col(idCol), col(scoreCol))
        .withColumn("__rk", row_number().over(w))
        .select(col(idCol),
          round(lit(1.0) / (lit(kRrf) + col("__rk")), 6).as("__c"))
    }
    contribs.reduce(_.unionByName(_))
      .groupBy(idCol)
      .agg(round(sum(col("__c").cast("decimal(28,6)")).cast("double"), 6)
          .as("rrf"),
        count(lit(1)).as("n_lists"))
      .orderBy(desc("rrf"), col(idCol))
      .limit(topK)
  }

  /** Hard-negative mining for contrastive retrieval training (the
    * DPR/Contriever recipe, Karpukhin et al. 2020): positives are one
    * retriever's top hits; hard negatives are a DIFFERENT retriever's
    * top candidates that the first one did NOT pick — lexically
    * plausible, semantically wrong, exactly the examples a dense model
    * learns the most from.
    *
    * Both inputs are (idCol, scoreCol) rankings already truncated to
    * their own top-k, so everything here — the anti-join, the rank
    * windows, the union — runs over constant-size relations; the
    * corpus-scale work happened in the retrieval runs that produced
    * them.
    *
    * @return (idCol, label, rank, score): label 1 = positive (ranked by
    *         its own list), 0 = hard negative (candidate order, top
    *         `nNeg` after removing positives)
    */
  def hardNegatives(positives: DataFrame, candidates: DataFrame,
                    idCol: String, scoreCol: String, nNeg: Int): DataFrame = {
    def ranked(r: DataFrame) = {
      val w = Window.partitionBy(pmod(col(idCol), lit(1)))
        .orderBy(col(scoreCol).desc, col(idCol))
      r.select(col(idCol), col(scoreCol))
        .withColumn("rank", row_number().over(w))
    }
    val pos = ranked(positives).withColumn("label", lit(1))
    val neg = ranked(candidates.join(positives.select(idCol), Seq(idCol), "left_anti"))
      .filter(col("rank") <= nNeg)
      .withColumn("label", lit(0))
    pos.unionByName(neg)
      .select(col(idCol), col("label"), col("rank"), col(scoreCol).as("score"))
  }

  /** Doc-to-doc k-nearest-neighbors in SPARSE tf-idf space — the
    * lexical complement of the dense-embedding ANN family (finds
    * near-dups and related docs that share rare vocabulary, which
    * embeddings can miss and vice versa).
    *
    * Vector space: w(d,t) = tf·idf with the BM25 idf
    * ln((N−df+0.5)/(df+0.5)+1), L2-normalized per doc over the KEPT
    * terms. Terms with df > `maxDf` are dropped BEFORE normalization —
    * they carry near-zero idf but quadratic join cost (a df-10⁶ term
    * alone generates 10¹² candidate pairs); the bound is part of the
    * operator's semantics and replays identically in the oracle.
    *
    * Scale: similarity flows through the inverted index — postings
    * self-join per term (≤ maxDf² pairs/term, the prefix-filter
    * regime), DECIMAL-summed dot products, then a SALTED top-k per doc
    * ([[graft.core.SkewOps.topKByKey]]): a hub document with a million
    * neighbors never sorts on one reducer. No dense n² anywhere.
    *
    * @return (doc_id, neighbor_id, sim, rnk) — k rows per doc that has
    *         any qualifying neighbor
    */
  def sparseCosineTopK(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, maxDf: Long = 100): DataFrame = {
    val tf = docs
      .select(col(idCol).as("id"),
        explode(TextOps.tokens(lower(col(textCol)))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false) // feeds df-counts AND postings
    val n = docs.agg(countDistinct(col(idCol)).as("n")) // 1 row
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val weighted = tf
      .join(dfT, "term") // drops pruned terms
      .crossJoin(broadcast(n))
      .withColumn("w", round(col("tf") *
        round(log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 6), 6))
    val norms = weighted.groupBy("id")
      .agg(round(sqrt(sum(round(col("w") * col("w"), 6)
        .cast("decimal(28,6)")).cast("double")), 6).as("nrm"))
    val postings = weighted.join(norms, "id")
      .select(col("term"), col("id"), round(col("w") / col("nrm"), 6).as("wn"))
      .localCheckpoint(eager = false) // both sides of the pair join
    val pairs = postings.as("a")
      .join(postings.as("b"),
        col("a.term") === col("b.term") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(round(sum(round(col("a.wn") * col("b.wn"), 6)
        .cast("decimal(28,6)")).cast("double"), 6).as("sim"))
    val sym = pairs.select(col("id_a").as("doc_id"),
        col("id_b").as("neighbor_id"), col("sim"))
      .unionByName(pairs.select(col("id_b").as("doc_id"),
        col("id_a").as("neighbor_id"), col("sim")))
    graft.core.SkewOps.topKByKey(sym, Seq("doc_id"),
        Seq(col("sim").desc, col("neighbor_id")), k)
      .select("doc_id", "neighbor_id", "sim", "rnk")
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019 — the
    * LASER/CCMatrix recipe, public literature): candidate parallel
    * pairs between two embedding slices are the FORWARD nearest
    * neighbors whose cosine stands out against both endpoints' local
    * neighborhoods — margin(x, y) = cos(x, y) / ((avgTopK(x) +
    * avgTopK(y)) / 2), the "ratio" margin that suppresses hubness
    * (a vector close to everything mines nothing).
    *
    * This is how web-scale multilingual corpora mine translation
    * pairs; the same shape mines caption↔image or query↔doc pairs
    * from any two aligned embedding spaces.
    *
    * Gate/audit shape: exact A×B cosines with the smaller side
    * broadcast, computed ONCE and checkpointed (both kNN windows and
    * the pair pick read it). At corpus scale swap the candidate
    * generator for the hyperplane-LSH buckets
    * ([[Similarity.cosinePairsLsh]]'s layout) — the margin math below
    * is unchanged. Per-id windows are bounded by the mined slice
    * size. Determinism: cosines round6; the margin multiplies through
    * its denominator — cos·2k / (Σtopk_a + Σtopk_b) with the sums
    * exact DECIMAL(28,6) — so the whole statistic is ONE IEEE division
    * of deterministic operands, rounded once (a round6 of the
    * INTERMEDIATE k-mean would sit on a systematic half-ulp knife
    * edge: a sum of round6 values over 4 is a multiple of 2.5e-7).
    * Ties in the kNN windows break on the partner id.
    *
    * @return (id_a, id_b, cos_sim, margin) — forward best matches of
    *         `a` in `b` with margin ≥ `threshold`
    */
  def bitextMine(a: DataFrame, b: DataFrame, k: Int,
                 threshold: Double): DataFrame = {
    require(k >= 1)
    val sims = a.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
      .crossJoin(broadcast(
        b.select(col("vec_id").as("id_b"), col("embedding").as("eb"))))
      .select(col("id_a"), col("id_b"),
        Similarity.cosRound6Udf(col("ea"), col("eb")).as("cos_sim"))
    marginMine(sims, k, threshold)
  }

  /** The scale shape of [[bitextMine]]: candidate pairs come from the
    * shared hyperplane-LSH buckets ([[Similarity.vectorBuckets]] — the
    * storable index artifact) instead of the full A×B cross, and the
    * kNN neighborhoods are the CANDIDATE neighborhoods — exactly how
    * CCMatrix runs the margin over FAISS-retrieved neighbors rather
    * than exact kNN. The A×B form is the oracle-exact baseline; this
    * is what a 100 TB corpus executes: bucket-join candidate
    * generation (one shuffle on (table, bucket)), cosines for the
    * candidate sliver only, margins unchanged.
    */
  def bitextMineLsh(a: DataFrame, b: DataFrame, k: Int, threshold: Double,
                    dim: Int, nPlanes: Int = 8, nTables: Int = 12): DataFrame = {
    require(k >= 1)
    val ba = Similarity.vectorBuckets(a, dim, nPlanes, nTables)
    val bb = Similarity.vectorBuckets(b, dim, nPlanes, nTables)
    val cand = ba.select(col("table"), col("bucket"), col("id").as("id_a"))
      .join(bb.select(col("table"), col("bucket"), col("id").as("id_b")),
        Seq("table", "bucket"))
      .select("id_a", "id_b").distinct()
    val sims = cand
      .join(a.select(col("vec_id").as("id_a"), col("embedding").as("ea")), "id_a")
      .join(b.select(col("vec_id").as("id_b"), col("embedding").as("eb")), "id_b")
      .select(col("id_a"), col("id_b"),
        Similarity.cosRound6Udf(col("ea"), col("eb")).as("cos_sim"))
    marginMine(sims, k, threshold)
  }

  /** Shared margin machinery over a (id_a, id_b, cos_sim) candidate
    * relation: both kNN rank windows, DECIMAL top-k sums, the
    * multiplied-through ratio margin, forward-best selection.
    */
  private def marginMine(simsIn: DataFrame, k: Int,
                         threshold: Double): DataFrame = {
    val sims = simsIn.localCheckpoint(eager = false)
    val wA = Window.partitionBy("id_a").orderBy(desc("cos_sim"), col("id_b"))
    val wB = Window.partitionBy("id_b").orderBy(desc("cos_sim"), col("id_a"))
    val ranked = sims
      .withColumn("rk_a", row_number().over(wA))
      .withColumn("rk_b", row_number().over(wB))
      .localCheckpoint(eager = false)
    def knnSum(idCol: String, rkCol: String, out: String) =
      ranked.filter(col(rkCol) <= k).groupBy(idCol)
        .agg(sum(col("cos_sim").cast("decimal(28,6)")).cast("double").as(out))
    ranked.filter(col("rk_a") === 1)
      .join(knnSum("id_a", "rk_a", "sum_a"), "id_a")
      .join(knnSum("id_b", "rk_b", "sum_b"), "id_b")
      .withColumn("margin", round(col("cos_sim") * lit(2.0 * k) /
        (col("sum_a") + col("sum_b")), 6))
      .filter(col("margin") >= threshold)
      .select("id_a", "id_b", "cos_sim", "margin")
  }
}
