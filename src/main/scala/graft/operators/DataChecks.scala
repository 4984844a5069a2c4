package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation over a corpus — the contract
  * gate a 100 TB ingest runs before anything downstream consumes a
  * batch (the published "unit tests for data" pattern: Schelter et al.,
  * VLDB 2018, and its open implementations).
  *
  * Design for scale: ALL declared checks evaluate in ONE aggregation
  * pass over the input — metrics are ordinary aggregate expressions
  * collected into a single-row frame, and the per-check report rows are
  * `inline`d from that row without a second scan or a driver collect.
  * `Uniqueness` uses `count_distinct`, which Catalyst plans as the
  * standard expand + two-level aggregate; it shuffles grouped values,
  * never rows. A failed check therefore costs exactly one corpus scan
  * to discover, and the report is a DataFrame a pipeline can join,
  * store, or alert on.
  *
  * Ratios follow the repo-wide oracle discipline: DECIMAL(28,6) sums,
  * double division, `round(_, 6)`.
  */
object DataChecks {

  sealed trait Check {
    /** Stable report identifier. */
    def name: String
    def column: String
  }
  /** Fraction of non-NULL values ≥ `atLeast`. */
  final case class Completeness(column: String, atLeast: Double) extends Check {
    val name = "completeness"
  }
  /** Fraction of distinct values ≥ `atLeast` (1.0 = a key). */
  final case class Uniqueness(column: String, atLeast: Double) extends Check {
    val name = "uniqueness"
  }
  /** min(column) ≥ lo and max(column) ≤ hi. */
  final case class ValueRange(column: String, lo: Double, hi: Double) extends Check {
    val name = "value_range"
  }
  /** Mean of column within [lo, hi]. */
  final case class MeanBetween(column: String, lo: Double, hi: Double) extends Check {
    val name = "mean_between"
  }
  /** Fraction of non-NULL values fully matching `regex` ≥ `atLeast`. */
  final case class PatternRate(column: String, regex: String, atLeast: Double)
      extends Check {
    val name = "pattern_rate"
  }
  /** Row count ≥ n — the empty-batch guard. */
  final case class SizeAtLeast(n: Long) extends Check {
    val name = "size_at_least"; val column = "*"
  }

  /** Evaluate `checks` in one aggregation pass; returns one report row
    * per check: (check, col_name, metric, threshold_lo, threshold_hi,
    * passed).
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    val total = count(lit(1)).cast("double")
    // metric expression per check, evaluated in the same .agg()
    val metrics: Seq[Column] = checks.zipWithIndex.map { case (c, i) =>
      val m = c match {
        case Completeness(colName, _) =>
          round(count(col(colName)).cast("double") / total, 6)
        case Uniqueness(colName, _) =>
          round(count_distinct(col(colName)).cast("double") / total, 6)
        case ValueRange(colName, _, _) =>
          // report the boundary nearer to violation: min if it
          // undershoots, else max
          min(col(colName)).cast("double")
        case MeanBetween(colName, _, _) =>
          round(sum(col(colName).cast("decimal(28,6)")).cast("double") / total, 6)
        case PatternRate(colName, regex, _) =>
          round(sum(when(col(colName).rlike(regex), 1L).otherwise(0L))
            .cast("double") / count(col(colName)).cast("double"), 6)
        case SizeAtLeast(_) => count(lit(1)).cast("double")
      }
      m.as(s"m$i")
    } ++ checks.zipWithIndex.collect { case (ValueRange(colName, _, _), i) =>
      max(col(colName)).cast("double").as(s"mx$i")
    }
    val agg = df.agg(metrics.head, metrics.tail: _*)
    // one struct per check from the single metrics row, then inline —
    // the report never leaves the plan
    val reports = checks.zipWithIndex.map { case (c, i) =>
      val metric = col(s"m$i")
      val (lo, hi, passed) = c match {
        case Completeness(_, t)   => (t, 1.0, metric >= t)
        case Uniqueness(_, t)     => (t, 1.0, metric >= t)
        case ValueRange(_, l, h)  => (l, h, metric >= l && col(s"mx$i") <= h)
        case MeanBetween(_, l, h) => (l, h, metric >= l && metric <= h)
        case PatternRate(_, _, t) => (t, 1.0, metric >= t)
        case SizeAtLeast(n)       => (n.toDouble, Double.MaxValue, metric >= n)
      }
      struct(lit(c.name).as("check"), lit(c.column).as("col_name"),
        metric.as("metric"), lit(lo).as("threshold_lo"),
        lit(if (hi == Double.MaxValue) null else hi)
          .cast("double").as("threshold_hi"),
        passed.as("passed"))
    }
    agg.select(inline(array(reports: _*)))
  }

  /** Population Stability Index between two slices of one relation over
    * a shared bucketing expression — the standard drift alarm between a
    * reference corpus and an arriving batch (|PSI| < 0.1 stable, > 0.25
    * action). Laplace-smoothed with +1 per bucket over the UNION of
    * observed buckets so empty cells stay finite and the whole
    * computation is integer counts → exact decimal shares → the
    * repo-wide rounded-ln discipline (replays in the oracle).
    *
    * Scale: two grouped counts (bucket-cardinality shuffles) + a
    * bucket-sized join; rows never move unaggregated.
    */
  def psiDrift(a: DataFrame, b: DataFrame, bucket: Column): DataFrame = {
    val ca = a.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(bucket.as("bucket")).agg(count(lit(1)).as("n_b"))
    val joined = ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val k = count(lit(1)).over(org.apache.spark.sql.expressions.Window
      .partitionBy())
    // bucket count k and totals are bucket-cardinality-sized; the
    // unpartitioned window runs over the aggregated frame (|buckets|
    // rows), not the corpus
    val withTotals = joined
      .withColumn("k", k)
      .withColumn("t_a", sum(col("n_a")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("t_b", sum(col("n_b")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    withTotals
      .withColumn("p_a",
        round((col("n_a") + 1).cast("double") / (col("t_a") + col("k")), 6))
      .withColumn("p_b",
        round((col("n_b") + 1).cast("double") / (col("t_b") + col("k")), 6))
      .withColumn("term",
        round((col("p_a") - col("p_b")) * round(log(col("p_a") / col("p_b")), 6), 6))
      .select("bucket", "n_a", "n_b", "p_a", "p_b", "term")
  }

  /** Headline PSI: sum of per-bucket terms (DECIMAL-summed). */
  def psi(a: DataFrame, b: DataFrame, bucket: Column): DataFrame =
    psiDrift(a, b, bucket)
      .agg(round(sum(col("term").cast("decimal(28,6)")).cast("double"), 6)
        .as("psi"))

  /** Robust per-group outlier report: median + MAD (median absolute
    * deviation) with the nearest-rank lower-median convention (the
    * [[CorpusStats.qualityPercentiles]] discipline — exact,
    * interpolation-free, so the whole report replays in the oracle).
    * A row is an outlier when |x − med| > k·MAD — the robust z-score
    * that a corpus's heavy-tailed length/quality distributions need
    * (mean/stddev break under the very outliers being hunted).
    *
    * Returns one row per group: (group, n, med, mad, n_outliers).
    * Per-group windows sort each group on one reducer — exact
    * per-group order statistics are inherently group-sorted; groups
    * here are sources/languages (dozens), each window a partition.
    */
  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
                  valueCol: String, k: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(col("__v"), col(idCol))
    val wg = Window.partitionBy(groupCol)
    val base = df.select(col(groupCol), col(idCol),
        col(valueCol).cast("double").as("__v"))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wg))
      .localCheckpoint(eager = false) // feeds median, deviations, count
    val med = base.groupBy(groupCol).agg(
      max(when(col("__rk") === ceil(col("__n") * 0.5), col("__v"))).as("med"))
    val dev = base.join(broadcast(med), groupCol)
      .withColumn("__d", abs(col("__v") - col("med")))
    val w2 = Window.partitionBy(groupCol).orderBy(col("__d"), col(idCol))
    val mad = dev.withColumn("__rk2", row_number().over(w2).cast("long"))
      .groupBy(groupCol).agg(
        max(when(col("__rk2") === ceil(col("__n") * 0.5), col("__d"))).as("mad"))
    dev.join(broadcast(mad), groupCol)
      .groupBy(groupCol)
      .agg(max(col("__n")).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("__d") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Snapshot diff between two corpus versions: per-id added /
    * removed / changed / unchanged by content fingerprint — the audit
    * a versioned corpus release publishes next to its corpus card (and
    * the input to incremental re-processing: only `added`+`changed`
    * re-enter the pipeline).
    *
    * Scale: one hash-join on id; only (id, fingerprint) shuffles —
    * document bodies stay in their scan.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val fa = a.select(col(idCol).as("id"),
      TextOps.fingerprint(col(textCol)).as("fp_a"))
    val fb = b.select(col(idCol).as("id"),
      TextOps.fingerprint(col(textCol)).as("fp_b"))
    fa.join(fb, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") === col("fp_b"), "unchanged")
          .otherwise("changed"))
  }

  /** Exact ROC-AUC of a score against a boolean label — the standard
    * acceptance metric for the trained quality filter
    * ([[LinearModel]]-style classifiers gate what enters the corpus;
    * before trusting one at 100 TB you measure its AUC on a labeled
    * slice). Computed as the tie-corrected Mann-Whitney U statistic:
    *
    *   AUC = (U − nPos·(nPos+1)) / (2·nPos·nNeg),
    *   U = Σ_scores nPos_s · (2·c_s + n_s + 1)
    *
    * where c_s counts rows with strictly smaller score and the
    * (2c+n+1) term is twice the average rank of the tie group — the
    * whole statistic stays INTEGER until one final division, so it
    * replays exactly in any engine.
    *
    * Distributed shape: one aggregation collapses the relation to
    * DISTINCT scores (partial-aggregated — score cardinality, not row
    * count, hits the shuffle), then the strictly-smaller cumulative
    * count comes from [[graft.core.SkewOps.prefixSum]] — a
    * range-partitioned stitched prefix, so there is no SinglePartition
    * window even when a continuous score keeps the distinct relation
    * large — and a one-row total.
    *
    * @return one row (n_pos, n_neg, auc); auc NULL when either class
    *         is empty
    */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df.groupBy(col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__np"))
    val ranked = graft.core.SkewOps.prefixSum(
      byScore, Seq(col("__s")), "__n", outCol = "__c")
    // U accumulates in DECIMAL(38,0): per-term np·(2c+n+1) ~ nPos·2n
    // overflows a long at multi-billion rows — the statistic must stay
    // exact INTEGER until the one final division, which runs through
    // Round6.decRatio6 (exact half-away — also kills the round(double)
    // half-ulp knife edge of the quotient).
    ranked.agg(
        sum(col("__np")).as("n_pos"),
        sum(col("__n") - col("__np")).as("n_neg"),
        sum(col("__np").cast("decimal(38,0)") *
          (lit(2L).cast("decimal(38,0)") * col("__c") + col("__n") + lit(1L)))
          .as("__u"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null).cast("double"))
          .otherwise(graft.core.Round6.decRatio6(
            col("__u") - (col("n_pos").cast("decimal(38,0)") *
              (col("n_pos") + lit(1L))),
            lit(2L).cast("decimal(38,0)") * col("n_pos") * col("n_neg")))
          .as("auc"))
  }

  /** Exact precision–recall curve of a score against a boolean label
    * — the operating-point companion to [[rocAuc]] (AUC ranks the
    * scorer; the PR curve is how you PICK the production threshold
    * for a quality/content gate, where the positive class is rare and
    * ROC flatters). One point per DISTINCT score s, counting the
    * "predict positive when score ≥ s" confusion:
    *
    *   precision(s) = TP/(TP+FP), recall(s) = TP/P
    *
    * all INTEGER until the two final exact half-away divisions
    * ([[graft.core.Round6]]) — engine-portable by construction.
    *
    * Distributed shape: one aggregation collapses to distinct scores
    * (score cardinality hits the shuffle, not rows), then descending
    * cumulative TP/FP via the range-partitioned stitched
    * [[graft.core.SkewOps.prefixSum]] — no SinglePartition window —
    * and a one-row positives total broadcast back.
    *
    * @return (threshold, tp, fp, precision, recall), one row per
    *         distinct score; recall NULL when there are no positives
    */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df.groupBy(col(scoreCol).as("threshold"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__np"))
    val withTp = graft.core.SkewOps.prefixSum(
      byScore, Seq(col("threshold").desc), "__np", outCol = "__ptp")
    val withN = graft.core.SkewOps.prefixSum(
      withTp, Seq(col("threshold").desc), "__n", outCol = "__pn")
    val tot = byScore.agg(sum(col("__np")).as("__p"))
    withN.crossJoin(broadcast(tot))
      .withColumn("tp", col("__ptp") + col("__np"))
      .withColumn("__cum", col("__pn") + col("__n"))
      .select(col("threshold"), col("tp"), (col("__cum") - col("tp")).as("fp"),
        graft.core.Round6.intRatio6(col("tp"), col("__cum")).as("precision"),
        when(col("__p") === 0, lit(null).cast("double"))
          .otherwise(graft.core.Round6.intRatio6(col("tp"), col("__p")))
          .as("recall"))
  }

  /** Exact per-group LOWER WEIGHTED MEDIAN: the smallest value whose
    * cumulative weight reaches half the group total — the robust
    * center when observations carry unequal mass (a corpus median doc
    * length weighted by token count; a sensor median weighted by
    * validity duration). Pure integer decision: the cumulative runs
    * in a RANGE frame (ties share one cumulative value, so the
    * result is independent of intra-tie row order — a ROWS frame
    * would be engine-dependent), and `2·cum ≥ W` needs no division.
    *
    * One shuffle on the group key; the window partitions per group.
    *
    * @return (groupCol, w_total, w_median)
    */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cumW = Window.partitionBy(groupCol).orderBy(col("__v"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(groupCol), col(valueCol).cast("long").as("__v"),
        col(weightCol).cast("long").as("__w"))
      .withColumn("__cum", sum(col("__w")).over(cumW))
      .withColumn("__tot", sum(col("__w")).over(Window.partitionBy(groupCol)))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(groupCol)
      .agg(max(col("__tot")).as("w_total"), min(col("__v")).as("w_median"))
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    * 2007 — public literature): for every quasi-identifier
    * combination, the group size (re-identification risk: a group
    * smaller than k pins an individual to ≤ k−1 others) and the
    * number of distinct sensitive values (attribute disclosure: a
    * group with < l distinct sensitive values leaks the attribute
    * even when k holds). The release gate next to
    * [[graft.operators.TextOps]]' PII redaction: redaction scrubs
    * direct identifiers, this audits the joint-column fingerprint
    * that remains.
    *
    * One shuffle on the quasi key; the sensitive distinct count is
    * exact (swap in the HLL sketch at 100 TB — same contract).
    *
    * @return (quasi..., n, n_sensitive, k_ok, l_ok)
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 1 && l >= 1)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .select(quasiCols.map(col) ++ Seq(col("n"), col("n_sensitive"),
        (col("n") >= k).as("k_ok"), (col("n_sensitive") >= l).as("l_ok")): _*)
  }

  /** Exact Spearman rank correlation between two columns — the
    * monotone-association check next to [[rocAuc]] (is the quality
    * score even ordinally consistent with length/compressibility
    * before anything regresses on it?). Ties break on `idCol`, a
    * deterministic total order that makes both rank vectors
    * PERMUTATIONS of 1..n — the classic ρ = 1 − 6·Σd² / (n(n²−1))
    * identity is then pure integer, and the one division runs exact
    * half-away ([[graft.core.Round6.decRatio6]]): no float enters
    * before the final 6-decimal value, so the statistic is
    * engine-portable by construction.
    *
    * Scale: both ranks come from the range-partitioned stitched
    * [[graft.core.SkewOps.globalRank]] (no SinglePartition window);
    * Σd² accumulates in DECIMAL(38,0), exact past 10¹² rows.
    *
    * @return one row (n, rho); rho NULL when n < 2
    */
  def spearman(df: DataFrame, idCol: String, colA: String,
               colB: String): DataFrame = {
    // both rank passes derive from this projection — materialize it
    // once or an expensive upstream (a regex quality scan) runs twice
    val base = df.select(col(idCol).as("__id"),
      col(colA).cast("double").as("__a"), col(colB).cast("double").as("__b"))
      .localCheckpoint(eager = false)
    val ra = graft.core.SkewOps.globalRank(base.select("__id", "__a"),
      Seq(col("__a"), col("__id")), "rank_a")
    val rb = graft.core.SkewOps.globalRank(base.select("__id", "__b"),
      Seq(col("__b"), col("__id")), "rank_b")
    val nDec = col("n").cast("decimal(38,0)")
    ra.join(rb, "__id")
      .select(((col("rank_a") - col("rank_b")).cast("decimal(38,0)") *
        (col("rank_a") - col("rank_b")).cast("decimal(38,0)")).as("__d2"))
      .agg(count(lit(1)).as("n"), sum(col("__d2")).as("__s"))
      .select(col("n"),
        when(col("n") < 2, lit(null).cast("double"))
          .otherwise(graft.core.Round6.decRatio6(
            nDec * (nDec * nDec - 1) - lit(6L) * col("__s"),
            nDec * (nDec * nDec - 1))).as("rho"))
  }

  /** Per-group winsorization — clamp a numeric column to its group's
    * exact nearest-rank [pLow, pHigh] percentiles (the heavy-tail-safe
    * CLEANUP next to [[madOutliers]]' detection: a corrupt length or
    * quality value stops distorting downstream means without dropping
    * the row). Rank windows partition per group (the percentile-gate
    * precedent).
    *
    * @return (groupCol, idCol, valueCol, lo, hi, v_wins)
    */
  def winsorize(df: DataFrame, groupCol: String, idCol: String,
                valueCol: String, pLow: Double = 0.05,
                pHigh: Double = 0.95): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(col("__v"), col(idCol))
    val wg = Window.partitionBy(groupCol)
    val ranked = df
      .select(col(groupCol), col(idCol), col(valueCol).cast("double").as("__v"))
      .withColumn("__rk", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wg))
    // nearest-rank clamped to >= 1: ceil(n·0) = 0 matches NO
    // row_number, which would silently EMPTY the inner join for
    // pLow = 0 instead of clamping nothing (rank 1 = group minimum).
    def pick(q: Double, out: String) =
      ranked.filter(col("__rk") ===
          greatest(lit(1L), ceil(col("__n") * q).cast("long")))
        .select(col(groupCol), col("__v").as(out))
    ranked.join(pick(pLow, "lo"), groupCol).join(pick(pHigh, "hi"), groupCol)
      .select(col(groupCol), col(idCol), col("__v").as(valueCol),
        col("lo"), col("hi"),
        least(greatest(col("__v"), col("lo")), col("hi")).as("v_wins"))
  }

  /** ANALYZE-style column statistics in one scan: per numeric column,
    * min / max / null count / exact distinct count — the stats a
    * query planner (and a file-skipping layout) feeds on. At gate
    * scale the distinct counts are exact (they oracle-verify); at
    * 100 TB swap `count_distinct` for the HLL sketch
    * ([[Sketches.hllDistinct]]) — same output contract, mergeable
    * per-file states.
    *
    * @return (col_name, min_v, max_v, n_nulls, n_distinct), one row
    *         per requested column
    */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap { c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
      count_distinct(col(c)).as(s"__nd_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"))): _*)).as("s"))
      .select("s.*")
      .orderBy("col_name")
  }

  /** Calibration (reliability) table for a score against a boolean
    * label — [[rocAuc]]'s companion: AUC says the classifier RANKS
    * well; calibration says its scores MEAN what they claim (a quality
    * filter thresholded at "0.8" had better pass ~80%-good documents).
    * Scores bin into `bins` equal-width buckets; each reports its
    * count, DECIMAL-exact mean score, and positive fraction.
    *
    * One aggregation scan — bin index is a per-row expression, the
    * shuffle carries `bins` rows.
    *
    * @return (bin, n, mean_score, frac_pos) sorted by bin
    */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int = 10): DataFrame = {
    require(bins >= 1)
    val bin = least(floor(col(scoreCol) * bins).cast("int"), lit(bins - 1))
    df.select(bin.as("bin"), col(scoreCol).as("__s"), col(labelCol).as("__l"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        graft.core.Round6.decAvg6(sum(col("__s").cast("decimal(28,6)")),
          count(lit(1))).as("mean_score"),
        graft.core.Round6.intRatio6(sum(when(col("__l"), 1L).otherwise(0L)),
          count(lit(1))).as("frac_pos"))
      .orderBy("bin")
  }

}
