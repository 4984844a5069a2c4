package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cardinality and frequency sketches for corpus-scale profiling:
  * HyperLogLog distinct counts and Count-Min frequency estimation.
  *
  * Both are built from md5-derived integer hashes — the only hash both
  * Spark and DuckDB compute identically — and keep ALL sketch
  * arithmetic in exact integers (register sums as powers of two,
  * counter minima), so every query over them carries a FULL value
  * oracle instead of a rows-only gate. The single floating-point step
  * in HLL (the final estimate) is one IEEE division of exact integers
  * by a shared literal constant, bit-identical across engines.
  *
  * Scale posture: both sketches shuffle on (group, bucket) first —
  * a hot group spreads over its buckets (512 for HLL, depth×width for
  * CMS) before per-group partials meet, the same skew layout as
  * [[graft.core.SkewOps]]. Register/counter tables are tiny and
  * mergeable, so at 100 TB the second phase moves kilobytes per group.
  */
object Sketches {

  /** HLL precision: p=9 → m=512 registers, ~4.6% relative standard
    * error — the classic space/accuracy point for per-slice profiling.
    */
  val HllP: Int = 9
  val HllM: Int = 1 << HllP
  /** Bits left of the 60-bit md5-derived hash after the bucket index. */
  private val HllW: Int = 60 - HllP
  /** Max register value (rank of an all-zero remainder). */
  private val HllZ: Int = HllW + 1

  /** `alpha_m * m^2 * 2^Z` as ONE shared double constant: the raw HLL
    * estimate is `alpha_m * m^2 / sum(2^-rho_j)`; with the register sum
    * kept as the exact integer `S = sum(2^(Z - rho_j))` this becomes
    * `HllNumerator / S` — a single correctly-rounded division both
    * engines perform on identical inputs. The oracle SQL interpolates
    * THIS value (shortest-round-trip decimal form), so the literal is
    * the same double on both sides.
    */
  val HllNumerator: Double =
    0.7213 / (1.0 + 1.079 / HllM) * HllM.toDouble * HllM.toDouble *
      math.pow(2.0, HllZ)

  /** Approximate distinct count of `value` per group (raw HLL
    * estimator; the small-cardinality linear-counting correction is
    * deliberately omitted — it needs `ln`, whose last-ulp behavior
    * differs across engines, and profiling slices at corpus scale sit
    * far above the bias region. Expect +~17% bias only below ~2.5·m
    * ≈ 1300 distinct values at p=9).
    *
    * NULL values contribute nothing — mirroring `count(DISTINCT v)`,
    * which skips NULLs. (Without the filter, md5(NULL) would produce a
    * NULL bucket row that `sum` skips but `count` counts, silently
    * skewing the empty-register term.)
    *
    * Layout: (group, bucket) max-rank partial → per-group exact integer
    * register sum → one division. Duplicate values collapse inside the
    * first aggregation's map-side combine — no pre-distinct pass.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
                  estName: String = "hll_est"): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, value), groupCols, estName)

  /** The sketch STATE: per-group (bucket, register) max-rank rows.
    * This is the storable/mergeable artifact — registers from disjoint
    * slices max-merge into exactly the whole-corpus registers
    * (gated by `q_hll_merge`), which is what lets a 100 TB profile be
    * maintained incrementally: store ≤512 rows per slice, merge on
    * read.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String],
                   value: Column): DataFrame = {
    // 60-bit integer from the first 15 md5 hex chars (fits a signed
    // long; DuckDB twin: CAST('0x'||substr(md5(v),1,15) AS BIGINT))
    val h = conv(substring(md5(value), 1, 15), 16, 10).cast("long")
    val bucket = shiftright(h, HllW)
    val rem = h.bitwiseAND(lit((1L << HllW) - 1))
    // rank = leading zeros of the W-bit remainder + 1, computed exactly
    // as Z - len(bin(rem)) — no floating log
    val rho = when(rem === 0, lit(HllZ)).otherwise(lit(HllZ) - length(bin(rem)))
    df.where(value.isNotNull)
      .select(groupCols.map(col) :+ bucket.as("__bkt") :+ rho.as("__rho"): _*)
      .groupBy((groupCols :+ "__bkt").map(col): _*)
      .agg(max("__rho").as("__reg"))
  }

  /** Max-merge register states across the `dropCols` dimensions (e.g.
    * per-slice states → one corpus state). Exact: max is associative,
    * commutative, idempotent — re-merging a slice changes nothing.
    */
  def hllMergeRegisters(regs: DataFrame, keepCols: Seq[String]): DataFrame =
    regs.groupBy((keepCols :+ "__bkt").map(col): _*)
      .agg(max("__reg").as("__reg"))

  /** Estimate from (possibly merged) register rows. */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String],
                  estName: String = "hll_est"): DataFrame =
    regs
      .groupBy(groupCols.map(col): _*)
      .agg((sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllZ - __reg)")) +
        (lit(HllM.toLong) - count(lit(1))) * lit(1L << HllZ)).as("__intsum"))
      .select(groupCols.map(col) :+
        (lit(HllNumerator) / col("__intsum").cast("double")).as(estName): _*)

  /** Count-Min bucket of `v` in hash row `r`: md5 over "r:v" → first 8
    * hex chars → mod width. Exact-integer, engine-portable.
    */
  def cmsBucket(r: Column, v: Column, width: Int): Column =
    pmod(conv(substring(md5(concat_ws(":", r.cast("string"), v)), 1, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Count-Min sketch counters over a value stream: `depth` hash rows ×
    * `width` buckets of exact occurrence counts — `(r, bucket, cnt)`,
    * at most depth·width rows regardless of input size. Counters are
    * additive (sum-mergeable across partitions, days, or corpora).
    */
  def cmsCounters(df: DataFrame, value: Column, depth: Int = 4,
                  width: Int = 1024): DataFrame =
    df.select(value.as("__v"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("__r"), col("__v"))
      .select(col("__r"), cmsBucket(col("__r"), col("__v"), width).as("__bkt"))
      .groupBy("__r", "__bkt").agg(count(lit(1)).as("cnt"))

  /** CMS counters from a pre-aggregated (value, weight) relation —
    * identical counters to [[cmsCounters]] over the raw stream (each
    * counter is the sum of its values' weights), but the explode+shuffle
    * carries DISTINCT values instead of occurrences. The natural path
    * whenever a term-frequency table already exists, which a corpus
    * profile computes anyway — at 100 TB this is the difference between
    * sketching the vocabulary and re-shuffling every token.
    */
  def cmsCountersWeighted(df: DataFrame, value: Column, weight: Column,
                          depth: Int = 4, width: Int = 1024): DataFrame =
    df.select(value.as("__v"), weight.as("__w"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("__r"),
        col("__v"), col("__w"))
      .select(col("__r"), cmsBucket(col("__r"), col("__v"), width).as("__bkt"),
        col("__w"))
      .groupBy("__r", "__bkt").agg(sum("__w").as("cnt"))

  /** Mergeable histogram quantiles — the 100 TB quantile path. Exact
    * `percentile` sorts every value of a group on one reducer;
    * `percentile_approx`'s digest has no cross-engine twin. A
    * fixed-width histogram has both properties a corpus profile needs:
    * bin counts are additive (mergeable across partitions/days, like
    * the CMS counters), and the quantile read-off is deterministic
    * integer arithmetic — `cum * den >= n * num` avoids both floating
    * thresholds and ceil — so it carries a FULL value oracle. The
    * estimate returns the upper edge of the selected bin (error bounded
    * by one bin width); out-of-range values clamp to the edge bins.
    *
    * @param ps quantiles as (outputName, numerator, denominator),
    *   e.g. ("p95", 95, 100)
    */
  def histogramQuantiles(df: DataFrame, groupCols: Seq[String], value: Column,
                         lo: Double, hi: Double, bins: Int,
                         ps: Seq[(String, Int, Int)]): DataFrame = {
    require(bins > 0 && hi > lo && ps.nonEmpty)
    import org.apache.spark.sql.expressions.Window
    val width = (hi - lo) / bins
    // Spark's floor(double) returns LONG already; clamp in the integer
    // domain (the DuckDB twin CASTs its floor to BIGINT — a cast that
    // rounds, which is exact here because the input is integral)
    val bin = least(greatest(floor((value - lit(lo)) / lit(width)), lit(0L)),
      lit((bins - 1).toLong))
    val counts = df.select(groupCols.map(col) :+ bin.as("__bin"): _*)
      .groupBy((groupCols :+ "__bin").map(col): _*)
      .agg(count(lit(1)).as("__c"))
    // per-group cumulative over at most `bins` rows — the heavy shuffle
    // is the bin groupBy above; this window moves sketch-sized data
    val wCum = Window.partitionBy(groupCols.map(col): _*).orderBy("__bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val cum = counts
      .withColumn("__cum", sum("__c").over(wCum))
      .withColumn("__n", sum("__c").over(wAll))
    cum.groupBy(groupCols.map(col): _*)
      .agg(ps.head match { case (name, num, den) =>
          min(when(col("__cum") * den >= col("__n") * num, col("__bin"))).as(s"__b_$name")
        },
        ps.tail.map { case (name, num, den) =>
          min(when(col("__cum") * den >= col("__n") * num, col("__bin"))).as(s"__b_$name")
        }: _*)
      .select(groupCols.map(col) ++ ps.map { case (name, _, _) =>
        (lit(lo) + (col(s"__b_$name") + 1).cast("double") * lit(width)).as(name)
      }: _*)
  }

  /** Bloom-filter bit position of value `v` for hash row `i`:
    * md5 over "i:v" → first 8 hex chars → mod mBits. Same md5-portable
    * shape as the CMS bucket, so membership replays in the oracle.
    */
  def bloomPosition(i: Column, v: Column, mBits: Int): Column =
    pmod(conv(substring(md5(concat_ws(":", i.cast("string"), v)), 1, 8), 16, 10)
      .cast("long"), lit(mBits.toLong))

  /** Build a Bloom bitset over a value column. Scale-safe even for a
    * huge value set: the job collects the DISTINCT SET POSITIONS (at
    * most mBits longs), never the values — the driver materializes at
    * most mBits/64 words no matter how many rows feed the filter.
    *
    * NULL values are skipped, matching [[bloomMightContain]]'s
    * `null → false`: a NULL tests as non-member, and building from a
    * column with NULLs sets no phantom bits. (concat_ws silently drops
    * a NULL operand, so an unfiltered NULL row would otherwise hash
    * just the row index and inflate the FP rate.)
    *
    * The returned words broadcast with the closure of
    * [[bloomMightContain]] — the classic join-pruning primitive: test
    * the big side against the small side's fingerprint filter before
    * paying the join shuffle (guaranteed no false negatives).
    */
  def bloomBuild(df: DataFrame, value: Column, mBits: Int, k: Int): Array[Long] = {
    require(mBits % 64 == 0 && mBits > 0 && k > 0)
    val pos = df.where(value.isNotNull)
      .select(explode(sequence(lit(0), lit(k - 1))).as("__i"), value.as("__v"))
      .select(bloomPosition(col("__i"), col("__v"), mBits).as("__p"))
      .distinct().collect().map(_.getLong(0))
    val words = new Array[Long](mBits / 64)
    pos.foreach(p => words((p >> 6).toInt) |= 1L << (p & 63))
    words
  }

  /** Membership test against a built bitset: true iff ALL k positions
    * of the value are set (may be a false positive; never a false
    * negative). The JVM md5 replicates Spark's `md5()` hex exactly, so
    * the predicate is oracle-replayable position arithmetic.
    */
  def bloomMightContain(words: Array[Long], mBits: Int,
                        k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (v: String) =>
      if (v == null) false
      else {
        val digest = java.security.MessageDigest.getInstance("MD5")
        var i = 0
        var all = true
        while (all && i < k) {
          val hex = digest.digest(s"$i:$v".getBytes("UTF-8"))
            .take(4).map(b => f"$b%02x").mkString
          val pos = (java.lang.Long.parseLong(hex, 16) % mBits).toInt
          all = (words(pos >> 6) & (1L << (pos & 63))) != 0
          digest.reset()
          i += 1
        }
        all
      }
    }

  /** Point-estimate the frequency of each candidate value from CMS
    * counters: min over the depth rows of the candidate's counter —
    * an over-estimate by construction (collisions only add). The
    * counter table is sketch-sized, so it broadcasts; estimation never
    * shuffles the candidates.
    *
    * Every candidate appears in the output: a counter row absent from
    * the (sparse) counter table is an exact zero, so the join is LEFT
    * and missing counters coalesce to 0 before the min — a candidate
    * never seen in the stream estimates 0 instead of vanishing (or
    * taking its min over a subset of depth rows).
    */
  def cmsEstimate(counters: DataFrame, candidates: DataFrame,
                  valueCol: String, depth: Int = 4, width: Int = 1024,
                  estName: String = "n_est"): DataFrame = {
    val keep = candidates.columns.toSeq
    candidates
      .select(keep.map(col) :+ explode(sequence(lit(0), lit(depth - 1))).as("__r"): _*)
      .withColumn("__bkt", cmsBucket(col("__r"), col(valueCol), width))
      .join(broadcast(counters), Seq("__r", "__bkt"), "left")
      .groupBy(keep.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as(estName))
  }

  // ------------------------------------------------------------------
  // KMV (k-minimum-values) θ-sketch: distinct-count SET ALGEBRA — the
  // public Apache DataSketches theta design. HLL answers "how many
  // distinct"; KMV additionally answers union/intersection/difference
  // BETWEEN corpora ("how many NEW docs does crawl B add?") from two
  // k-row artifacts, never touching the tables again. The sketch is
  // the k smallest distinct 60-bit md5 hashes; θ = the kth smallest;
  // below θ every set's hashes are a uniform sample of its distinct
  // values at rate θ/D, so |entries < θ| · D/θ estimates any
  // composed set. All arithmetic is exact integers until one
  // Round6-disciplined division — full cross-engine oracle.
  // ------------------------------------------------------------------

  /** Hash domain: 60-bit md5-derived values live in [0, 2^60). */
  val KmvDomain: Long = 1L << 60

  /** 60-bit uniform hash of `v` (DuckDB twin:
    * `CAST('0x'||substr(md5(v),1,15) AS BIGINT)`).
    */
  def kmvHash(value: Column): Column =
    conv(substring(md5(value), 1, 15), 16, 10).cast("long")

  /** The sketch STATE: the k smallest DISTINCT hashes of `value`
    * (≤ k rows, column `__h`, ascending).
    *
    * Scale shape: ONE native aggregate ([[graft.functions.KMinAgg]],
    * a bounded-TreeSet TypedImperativeAggregate) — map-side partial
    * buffers are ≤ k longs each, so the exchange under the final
    * merge carries at most k·partitions longs instead of every
    * distinct hash in the corpus (at 100 TB that exchange is the
    * difference between k-rows-per-task and shipping ~n distinct
    * 8-byte hashes). Bit-identical to the reference
    * distinct+TakeOrdered form by construction: the k smallest
    * distinct hashes, ascending. The artifact stays k rows, storable
    * and mergeable (union IS the merge).
    */
  def kmvSketch(df: DataFrame, value: Column, k: Int): DataFrame = {
    require(k >= 2, "kmv needs k >= 2")
    df.where(value.isNotNull)
      .agg(graft.functions.KMin.agg(kmvHash(value), k).as("__ks"))
      .select(explode(col("__ks")).as("__h"))
  }

  /** One row (`__theta`, `__n`): θ = the kth smallest hash when the
    * sketch saturated, else the full domain (the set was counted
    * EXACTLY — every distinct hash is present).
    */
  private def kmvScalar(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("__n"), max(col("__h")).as("__mx"))
      .select(when(col("__n") < k, lit(KmvDomain))
        .otherwise(col("__mx")).as("__theta"), col("__n"))

  /** cnt · D/θ with the numerator in DECIMAL(38,0) (cnt·2^60 overflows
    * a long) and one exact half-away 6-decimal division; θ = D means
    * the count is exact.
    */
  private def kmvEst(cnt: Column, theta: Column): Column =
    when(theta === KmvDomain, cnt.cast("double"))
      .otherwise(graft.core.Round6.decRatio6(
        cnt.cast("decimal(38,0)") * lit(KmvDomain), theta))

  /** Distinct-count estimate from one sketch: (k-1)·D/h_(k) (the
    * classic KMV estimator — the kth value is the threshold, not an
    * entry), exact when the sketch never saturated.
    */
  def kmvEstimate(sketch: DataFrame, k: Int,
                  estName: String = "kmv_est"): DataFrame =
    kmvScalar(sketch, k).select(
      kmvEst(when(col("__n") < k, col("__n")).otherwise(col("__n") - 1),
        col("__theta")).as(estName))

  /** θ-sketch set algebra over two sketches built with the same k:
    * one row per metric — `union`, `intersect`, `diff_ab` (A∖B) —
    * each estimated as |entries below θ| · D/θ with θ = min(θ_A, θ_B).
    * Sketch-sized joins only (the θ scalar broadcasts; entries are
    * ≤ k rows per side).
    */
  def kmvSetOps(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val theta = broadcast(
      kmvScalar(a, k).select(col("__theta").as("__ta"))
        .crossJoin(broadcast(kmvScalar(b, k).select(col("__theta").as("__tb"))))
        .select(least(col("__ta"), col("__tb")).as("__theta")))
    def below(s: DataFrame) = s.crossJoin(theta)
      .where(col("__h") < col("__theta")).select("__h")
    val (aB, bB) = (below(a), below(b))
    def est(entries: DataFrame, metric: String) = entries
      .agg(count(lit(1)).as("__c")).crossJoin(theta)
      .select(lit(metric).as("metric"),
        kmvEst(col("__c"), col("__theta")).as("est"))
    est(aB.unionByName(bB).distinct(), "union")
      .unionByName(est(aB.join(bB, Seq("__h"), "left_semi"), "intersect"))
      .unionByName(est(aB.join(bB, Seq("__h"), "left_anti"), "diff_ab"))
  }
}
