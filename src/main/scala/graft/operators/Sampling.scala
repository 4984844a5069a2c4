package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting by content hash.
  *
  * A training pipeline at corpus scale needs split assignment that is
  * (a) stable across runs, engines, and cluster sizes, (b) a pure
  * function of the row's identity — a document's split must not depend
  * on what else is in the corpus, or incremental re-crawls silently
  * migrate documents between train and eval. Both properties fall out
  * of hashing the id instead of sampling: no RNG state, no
  * partition-order sensitivity, no coordination.
  *
  * md5 is used as the hash because every engine computes identical hex
  * for identical bytes — the DuckDB oracle replicates assignments
  * EXACTLY (the same trick as [[TextOps.winnowUdf]]; crc32/xxhash64
  * have no cross-engine twin).
  */
object Sampling {

  /** Bucket in `[0, buckets)` from the md5 of the id's decimal string —
    * uniform for any id distribution (sequential ids land uniformly).
    * DuckDB twin: `CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))
    * AS BIGINT) % buckets`.
    */
  def hashBucket(id: Column, buckets: Int): Column = {
    require(buckets > 0)
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % buckets
  }

  /** Named split assignment with integer weights, e.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)`: the id's bucket in
    * `[0, sum(weights))` picks the split by cumulative range. Weights
    * are exact population proportions only in expectation — the split
    * is per-row deterministic, not stratified.
    */
  def hashSplit(id: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.nonEmpty && weights.forall(_._2 > 0))
    val b = hashBucket(id, weights.map(_._2).sum)
    weights.foldLeft((Option.empty[Column], 0)) {
      case ((acc, cum), (name, wt)) =>
        val hi = cum + wt
        val branch = acc match {
          case None    => when(b < hi, lit(name))
          case Some(c) => c.when(b < hi, lit(name))
        }
        (Some(branch), hi)
    }._1.get
  }

  /** Keep a deterministic `num`-in-`den` fraction of rows (hash
    * Bernoulli sampling): `hashBucket(id, den) < num`. Subsets nest —
    * a 1% sample is contained in the 10% sample — so scaling-law runs
    * on nested corpus fractions reuse the same predicate.
    */
  def sampledIn(id: Column, num: Int, den: Int): Column = {
    require(num >= 0 && num <= den)
    hashBucket(id, den) < num
  }

  /** Stratified hash sampling: a per-group keep-fraction (num, den),
    * with a default for groups not named — the "downsample CommonCrawl,
    * keep all of Wikipedia" corpus-mixing primitive. Purely row-local
    * (one CASE over the group column and the id hash): no shuffle, no
    * per-group state, and each stratum inherits [[sampledIn]]'s nesting
    * property, so mixture re-weights reuse the same hashes.
    */
  def stratifiedIn(id: Column, group: Column,
                   rates: Seq[(String, (Int, Int))],
                   default: (Int, Int)): Column = {
    require(rates.nonEmpty)
    val branch = rates.foldLeft(Option.empty[Column]) {
      case (acc, (g, (num, den))) =>
        require(num >= 0 && num <= den)
        val keep = sampledIn(id, num, den)
        Some(acc.fold(when(group === g, keep))(_.when(group === g, keep)))
    }.get
    branch.otherwise(sampledIn(id, default._1, default._2))
  }

  /** Temperature-flattened mixture sampling (the multilingual /
    * multi-domain rebalancing rule from the mBERT/XLM-R line of work):
    * source s with n_s documents gets sampling weight
    * w_s = n_s^alpha / Σ n_t^alpha — alpha = 1 reproduces the natural
    * mixture, alpha → 0 the uniform one — and a quota of
    * floor(w_s · budget) documents, filled by deterministic md5 rank so
    * the same corpus always yields the same sample.
    *
    * Distributed shape: the weight table is #sources rows (one tiny
    * aggregate, broadcast back); selection is a per-source md5-rank
    * window — at 100 TB with a mega-source, swap the window for the
    * threshold form [[sampledIn]] uses (approximate quota, zero skew)
    * or salt the rank the way `SkewOps.globalRank` does.
    *
    * Determinism discipline for the oracle: pow is rounded to 6
    * decimals per source BEFORE the DECIMAL(38,6) denominator sum,
    * and w_s rounds back to 6 — both engines then do identical double
    * arithmetic on identical inputs.
    *
    * @return the sampled docs: (idCol, sourceCol, rk) with rk the
    *         1-based md5 rank inside the source
    */
  def temperatureMix(docs: DataFrame, sourceCol: String, idCol: String,
                     alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    require(budget > 0)
    val counts = docs.groupBy(sourceCol).agg(count(lit(1)).as("__ns"))
      .withColumn("__ps", round(pow(col("__ns"), lit(alpha)), 6))
    val denom = counts.agg(
      sum(col("__ps").cast("decimal(38,6)")).cast("double").as("__den"))
    val quotas = counts.crossJoin(broadcast(denom))
      .select(col(sourceCol),
        round(col("__ps") / col("__den"), 6).as("__w"))
      .select(col(sourceCol),
        floor(col("__w") * lit(budget.toDouble)).cast("long").as("__quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol).orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.select(col(idCol), col(sourceCol))
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), sourceCol)
      .where(col("rk") <= col("__quota"))
      .select(col(idCol), col(sourceCol), col("rk"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirtakis
    * 2006, A-Res), log-domain: each row gets key ln(u)/w for a uniform
    * u ∈ (0,1) and weight w > 0; the top-n keys are an exact weighted
    * sample. ln(u)/w orders identically to the paper's u^(1/w) (both
    * monotone), and the log form replays value-exactly under the round6
    * discipline where pow's last-ulp behavior would not.
    *
    * Determinism: u is the md5-derived uniform every sampling operator
    * here uses ((h + 0.5)/2^32 — the division is by a power of two, so
    * the double is exact), making the "sample" a pure function of the
    * ids: re-runs, retries and the DuckDB oracle all agree. Per-row
    * work + one top-n; no shuffle beyond TakeOrdered.
    *
    * @param weight strictly positive weight expression (e.g. a quality
    *               score or token count; caller guarantees > 0)
    * @return (idCol, w, logkey) for the n sampled rows
    */
  def weightedSample(docs: DataFrame, idCol: String, weight: Column,
                     n: Int): DataFrame = {
    require(n > 0)
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val lnu = round(log((h.cast("double") + lit(0.5)) / lit(4294967296.0)), 6)
    docs.select(col(idCol), weight.cast("long").as("w"),
        round(lnu / weight.cast("long").cast("double"), 6).as("logkey"))
      .orderBy(desc("logkey"), col(idCol))
      .limit(n)
  }

  /** UniMax mixture allocation (Chung et al. 2023): give every source
    * as close to a uniform share of the `budget` as its data allows,
    * capping repetition at `maxEpochs` passes. Water-filling: walk
    * sources in ascending capacity c_s = n_s·maxEpochs; a source whose
    * capacity fits under the current fair share keeps all of it, and
    * the first source that does not marks the fill line — it and every
    * larger source split the remaining budget evenly.
    *
    * The sequential recursion has a closed form because capacities are
    * ascending: every source before the fill line j* is capacity-bound,
    * so the budget consumed before j* is just the capacity prefix sum —
    * quota_s = c_s for s < j*, floor((B − C_{j*−1})/(k − j* + 1))
    * otherwise. That makes the whole allocation two windows and one
    * tiny aggregate over the #sources-row count table (the corpus-sized
    * work is the one groupBy count) — integer-exact, no float
    * discipline needed until the reported epochs ratio.
    *
    * @return one row per source: (sourceCol, ns, cap, quota, epochs),
    *         quota in examples, epochs = round6(quota/ns)
    */
  def unimaxMix(docs: DataFrame, sourceCol: String, budget: Long,
                maxEpochs: Int): DataFrame = {
    require(budget > 0 && maxEpochs > 0)
    val caps = docs.groupBy(sourceCol).agg(count(lit(1)).as("ns"))
      .withColumn("cap", col("ns") * lit(maxEpochs.toLong))
    // #sources rows from here down — windows on a non-foldable constant
    // partition are single-reducer over a tiny bounded relation
    val all = pmod(length(col(sourceCol).cast("string")), lit(1))
    val wOrd = org.apache.spark.sql.expressions.Window.partitionBy(all)
      .orderBy(col("cap"), col(sourceCol))
    val idxd = caps
      .withColumn("__idx", row_number().over(wOrd).cast("long"))
      .withColumn("__cprev", coalesce(
        sum(col("cap")).over(wOrd.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("__k", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(all)))
      .withColumn("__fl",
        col("cap") * (col("__k") - col("__idx") + 1) <= lit(budget) - col("__cprev"))
    val line = idxd.agg(
      min(when(!col("__fl"), col("__idx"))).as("__js"),
      min(when(!col("__fl"), col("__cprev"))).as("__cjs"))
    idxd.crossJoin(broadcast(line))
      .withColumn("quota",
        when(col("__js").isNull || col("__idx") < col("__js"), col("cap"))
          .otherwise(floor((lit(budget) - col("__cjs")) /
            (col("__k") - col("__js") + 1).cast("double")).cast("long")))
      .select(col(sourceCol), col("ns"), col("cap"), col("quota"),
        round(col("quota") / col("ns").cast("double"), 6).as("epochs"))
  }

  /** Deterministic source-interleaved training order: shuffle WITHIN
    * each source (md5 key, the [[graft.core.SkewOps.globalRank]]
    * epoch-shuffle discipline), then stride the sources so consecutive
    * training positions cycle through them — batch homogenization (a
    * window of S consecutive positions sees every source once) without
    * moving a single document twice.
    *
    * Position = (withinSourceRank − 1)·S + sourceIndex: residues mod S
    * are disjoint per source, so the order is total and collision-free
    * by construction; sorting by `pos` IS the training order.
    *
    * Skew posture: the within-source rank derives from ONE skew-safe
    * globalRank over (source, key, id) — range-partitioned, no
    * per-source single-reducer window (a web corpus has few sources
    * with millions of rows each; `Window.partitionBy(source)` would
    * funnel each source through one task). Group minima come from a
    * groupBy (aggregation, not a window) and join back broadcast.
    */
  def interleaveBySource(docs: DataFrame, idCol: String, groupCol: String,
                         salt: String = "epoch0"): DataFrame = {
    val keyed = docs.select(col(groupCol), col(idCol),
      md5(concat_ws(":", lit(salt), col(idCol).cast("string"))).as("__k"))
    val ranked = graft.core.SkewOps.globalRank(keyed,
      Seq(col(groupCol), col("__k"), col(idCol)), "__g")
    // per-group offset (min global rank) + dense source index + group
    // count — all computed on the groups-sized frame (the zipfFit
    // bounded-window discipline: non-foldable constant partition)
    val wTiny = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(length(col(groupCol)), lit(1)))
    val gidx = ranked.groupBy(groupCol).agg(min("__g").as("__m"))
      .withColumn("__s",
        row_number().over(wTiny.orderBy(col(groupCol))).cast("long") - 1)
      .withColumn("__n_groups", count(lit(1)).over(wTiny))
    ranked.join(broadcast(gidx), groupCol)
      .withColumn("r", col("__g") - col("__m") + 1)
      .select(col(idCol), col(groupCol), col("r"),
        ((col("r") - 1) * col("__n_groups") + col("__s")).as("pos"))
  }

  /** EXACT-quota stratified sample: ⌈n_g·num/den⌉ rows per group,
    * chosen in md5(id) order — the complement of [[stratifiedIn]]'s
    * rate-based keep: eval sets and ablation slices need exact sizes,
    * not sizes in expectation. The md5 order keeps the selection
    * deterministic, engine-portable, and independent of how the data
    * is laid out; the quota is pure integer arithmetic
    * ((n·num + den − 1) div den).
    *
    * One rank window per group (bounded by group size — the
    * percentile-gate precedent; a mega-stratum at 100 TB pre-filters
    * with [[stratifiedIn]] at a slightly higher rate first, then
    * exact-ranks the survivors).
    *
    * @return (groupCol, idCol, smp_rank, quota) for the selected rows
    */
  def exactStratifiedSample(df: DataFrame, groupCol: String, idCol: String,
                            num: Int, den: Int): DataFrame = {
    require(num >= 0 && den > 0 && num <= den)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val wg = Window.partitionBy(groupCol)
    df.select(col(groupCol), col(idCol))
      .withColumn("smp_rank", row_number().over(w).cast("long"))
      .withColumn("quota", expr(
        s"CAST((count(1) OVER (PARTITION BY $groupCol) * $num + ${den - 1}) " +
          s"DIV $den AS BIGINT)"))
      .filter(col("smp_rank") <= col("quota"))
      .select(col(groupCol), col(idCol), col("smp_rank"), col("quota"))
  }

  /** Balanced shard assignment for training-data export: rank docs by
    * (size DESC, id) and deal them SERPENTINE over the shards (block
    * 0 left-to-right, block 1 right-to-left, …) — the deterministic,
    * relationally-expressible cousin of greedy first-fit-decreasing:
    * each 2-block round gives every shard exactly one large-half and
    * one small-half pick, so shard byte totals differ by at most a
    * couple of document sizes — flat enough that data loaders stream
    * shards in lock-step. Unlike greedy FFD there is no sequential
    * state, so the assignment is ONE skew-safe rank plus row-local
    * arithmetic at any corpus size, and the oracle replays it exactly.
    *
    * @return (idCol, sizeCol, shard) with shard ∈ [0, nShards)
    */
  def balancedShards(df: DataFrame, idCol: String, sizeCol: String,
                     nShards: Int): DataFrame = {
    require(nShards >= 1)
    val ranked = graft.core.SkewOps.globalRank(
      df.select(col(idCol), col(sizeCol).cast("long").as(sizeCol)),
      Seq(col(sizeCol).desc, col(idCol)), "__r")
    val r0 = col("__r") - 1
    // integral div, not the double `/` (exact over the full long range)
    val block = org.apache.spark.sql.graftshim.ColumnShim.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftshim.ColumnShim.expression(r0),
        org.apache.spark.sql.graftshim.ColumnShim.expression(lit(nShards.toLong))))
    val pos = pmod(r0, lit(nShards)).cast("long")
    ranked.select(col(idCol), col(sizeCol),
      when(pmod(block, lit(2)) === 0, pos)
        .otherwise(lit(nShards.toLong - 1) - pos).as("shard"))
  }
}
