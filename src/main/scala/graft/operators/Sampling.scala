package graft.operators

import org.apache.spark.sql.Column
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
}
