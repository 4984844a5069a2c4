package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regularization operators for irregular sensor series — the two
  * reports every RWS-style observation store needs next to pack_ranges
  * (cf. /root/reference/database/01_init_db.sql:121-202's validity
  * model): resampling onto a fixed grid, and an explicit inventory of
  * the gaps the 30-minute staleness rule opens.
  */
object SeriesOps {

  /** Downsample an irregular series onto a fixed time grid with
    * last-observation-carried-forward: one grid row per (key, grid
    * tick), carrying the latest observation at-or-before the tick —
    * nulled once the observation is older than `maxAgeSeconds`
    * (the same "stale data no longer represents reality" rule as
    * pack_ranges' max-gap truncation, reference
    * database/01_init_db.sql:146-156).
    *
    * Composition, not new machinery: the grid is built per key with
    * `sequence`, and the carry-forward IS [[TimeJoins.asofJoin]] — one
    * shuffle on the key, no range join. Output: keys, tsCol (grid
    * tick), valueCol (LOCF value or null), `obs_ts` (matched
    * observation time or null).
    */
  def resampleLocf(obs: DataFrame, keys: Seq[String], tsCol: String,
                   valueCol: String, start: Timestamp, end: Timestamp,
                   stepSeconds: Long, maxAgeSeconds: Long): DataFrame = {
    require(stepSeconds > 0 && maxAgeSeconds > 0)
    val grid = obs.select(keys.map(col): _*).distinct()
      .withColumn(tsCol, explode(sequence(lit(start), lit(end),
        expr(s"INTERVAL $stepSeconds SECONDS"))))
    val right = obs.select(
      keys.map(col) :+ col(tsCol) :+ col(tsCol).as("obs_ts") :+ col(valueCol): _*)
    val fresh = unix_timestamp(col(tsCol)) - unix_timestamp(col("obs_ts")) <=
      maxAgeSeconds
    TimeJoins.asofJoin(grid, right, keys, tsCol)
      .select(keys.map(col) :+ col(tsCol) :+
        when(fresh, col(valueCol)).as(valueCol) :+
        when(fresh, col("obs_ts")).as("obs_ts"): _*)
  }

  /** Trailing-window rolling statistics per observation: count, sum,
    * mean, min, max over the `windowSeconds` of history ending at (and
    * including) each reading — the smoothing/trend layer every sensor
    * dashboard and feature pipeline puts above a raw series. One
    * shuffle on the key; the window is a RANGE frame over epoch
    * seconds, so irregular cadence needs no grid.
    *
    * Cross-engine determinism: the sum accumulates in DECIMAL(38,6)
    * (exact, order-independent) and casts back to double; the mean is
    * ONE IEEE division of that exact sum by the exact count. min/max
    * are order-independent by nature. The frame orders on WHOLE epoch
    * seconds (`unix_timestamp` truncates) — sub-second readings in the
    * same second are frame peers, which RANGE includes atomically, so
    * intra-second ordering can't change any result.
    */
  def rollingStats(obs: DataFrame, keys: Seq[String], tsCol: String,
                   valueCol: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(unix_timestamp(col(tsCol)))
      .rangeBetween(-windowSeconds, 0)
    val decSum = sum(col(valueCol).cast("decimal(38,6)")).over(w)
    obs.select(keys.map(col) :+ col(tsCol) :+ col(valueCol): _*)
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("roll_sum", decSum.cast("double"))
      .withColumn("roll_mean", decSum.cast("double") / col("roll_n"))
      .withColumn("roll_min", min(col(valueCol)).over(w))
      .withColumn("roll_max", max(col(valueCol)).over(w))
  }

  /** Z-score anomaly flags against a trailing window, in EXACT integer
    * arithmetic: reading x is anomalous when |x − mean| > k·stddev over
    * the `windowSeconds` ending at x (x itself included — a self-damped
    * sentinel that still trips on genuine spikes).
    *
    * No float in the decision: values lift to fixed point
    * (y = round(x·fpScale); sensor feeds have fixed precision, so the
    * lift is exact), and the test multiplies through by n² and the
    * k-denominator — `(x−mean)² > k²·var` becomes
    * `kDen²·(n·y − S)² > kNum²·(n·Q − S²)`, S = Σy, Q = Σy²
    * (population variance; both sides carry the same n² factor) —
    * all BIGINT, no division, no sqrt. That keeps the flag
    * bit-reproducible across engines and runs (an approximate flag that
    * flips with summation order is useless as a data-quality gate).
    * Magnitude guard: |y| ≤ ~10⁶ and window rows ≤ ~10⁴ keep every term
    * under 2⁶³; larger regimes should scale fpScale down.
    *
    * @param k sigma threshold as a rational (kNum, kDen), e.g. (3, 1)
    */
  def rollingAnomalies(obs: DataFrame, keys: Seq[String], tsCol: String,
                       valueCol: String, windowSeconds: Long,
                       k: (Int, Int) = (3, 1), fpScale: Int = 100): DataFrame = {
    require(windowSeconds > 0 && k._1 > 0 && k._2 > 0 && fpScale > 0)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(unix_timestamp(col(tsCol)))
      .rangeBetween(-windowSeconds, 0)
    val y = round(col(valueCol) * fpScale).cast("long")
    val withSums = obs
      .select(keys.map(col) :+ col(tsCol) :+ col(valueCol): _*)
      .withColumn("__y", y)
      .withColumn("roll_n", count(lit(1)).over(w))
      .withColumn("__s", sum(col("__y")).over(w))
      .withColumn("__q", sum(col("__y") * col("__y")).over(w))
    val dev = col("roll_n") * col("__y") - col("__s")
    val varN2 = col("roll_n") * col("__q") - col("__s") * col("__s")
    withSums
      .withColumn("is_anomaly",
        dev * dev * lit(k._2.toLong * k._2) > lit(k._1.toLong * k._1) * varN2)
      .drop("__y", "__s", "__q")
  }

  /** Exponentially-weighted moving average over the last `depth`
    * observations per key — the standard low-lag smoother next to
    * [[rollingStats]]' uniform window (road-weather trend displays and
    * alerting damp sensor jitter with exactly this).
    *
    * A FIXED-depth lag chain rather than the textbook recursive form:
    * the recursion s_t = α·x_t + (1−α)·s_{t−1} is a sequential scan
    * (one reducer per key, unbounded history); truncating at `depth`
    * lags makes it one window of bounded frame per key — and with
    * (1−α)^depth ≤ 6% for the defaults, the truncation is below sensor
    * noise. Weights renormalize over the PRESENT lags so the first
    * readings of a series average over what exists instead of decaying
    * toward zero.
    *
    * Determinism: `alpha` is read as its DECIMAL rendering p/q (0.1 →
    * 1/10, 0.25 → 1/4 — any alpha with a finite decimal form, which
    * is every alpha anyone writes): the weight ladder α(1−α)^j then
    * clears to INTEGERS p·(q−p)^j·q^(d−1−j) over the common
    * denominator q^depth, values lift to exact micro units (inputs
    * beyond 6-decimal precision quantize at 1e-6), and the weighted
    * average is one exact integer half-away division
    * ([[graft.core.Round6]]) — no IEEE fold anywhere, so no
    * cross-engine half-ulp knife edge (an earlier double-path
    * `round(num/den, 6)` was the exact class Round6 exists to kill).
    * An earlier draft `require`d a dyadic alpha — which rejected
    * alpha = 0.1, the most common EWMA parameter in the wild; the
    * rational ladder has no such restriction.
    *
    * Bound: every weight and the weight total must fit a long
    * (checked — binds around q^depth ≈ 10¹⁸, e.g. alpha with 3
    * decimals at depth 6); micro·weight sums run ANSI-checked, so an
    * extreme value×depth combination fails loudly, never silently.
    *
    * Requires (keys, tsCol) to be a total order (true for keyed series
    * that went through a per-timestamp groupBy).
    *
    * @return input columns + `ewma`
    */
  def ewmaLagged(obs: DataFrame, keys: Seq[String], tsCol: String,
                 valueCol: String, alpha: Double, depth: Int): DataFrame = {
    require(depth >= 1 && alpha > 0 && alpha <= 1)
    // alpha's shortest decimal rendering as p/q in lowest terms;
    // weights W_j = p·(q−p)^j·q^(d−1−j)
    val bd = java.math.BigDecimal.valueOf(alpha).stripTrailingZeros
    val scale = math.max(bd.scale, 0)
    val p0 = BigInt(bd.unscaledValue) * BigInt(10).pow(scale - bd.scale)
    val q0 = BigInt(10).pow(scale)
    val g = p0.gcd(q0)
    val (p, q) = (p0 / g, q0 / g)
    val weights: Seq[Long] = (0 until depth).map { j =>
      val w = p * (q - p).pow(j) * q.pow(depth - 1 - j)
      require(w.isValidLong,
        s"integer EWMA weight overflows a long (alpha=$alpha depth=$depth)")
      w.toLong
    }
    require(weights.map(BigInt(_)).sum.isValidLong,
      s"EWMA weight total overflows a long (alpha=$alpha depth=$depth)")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val lags = (0 until depth).map { j =>
      val v = if (j == 0) col(valueCol) else lag(col(valueCol), j).over(w)
      (v, weights(j))
    }
    val num = lags.map { case (v, wt) =>
      when(v.isNotNull, round(v * lit(1000000.0)).cast("long") * lit(wt))
        .otherwise(lit(0L)) }.reduceLeft(_ + _)
    val den = lags.map { case (v, wt) =>
      when(v.isNotNull, lit(wt)).otherwise(lit(0L)) }.reduceLeft(_ + _)
    obs.select(keys.map(col) :+ col(tsCol) :+ col(valueCol): _*)
      .withColumn("ewma", graft.core.Round6.microRatio6(num, den))
  }

  /** Time-weighted average over IRREGULAR samples — trapezoidal
    * integration per key: twa = Σ (v_i + v_{i+1})·Δt_i / (2·span).
    * The statistic a plain AVG gets wrong on event-driven sensors
    * (a value that held for 6 h must outweigh one that held for a
    * minute — LOTJU-style road-weather feeds emit on change, so
    * sampling density correlates with weather activity and an
    * unweighted mean is biased toward storms).
    *
    * Exactness: values lift to centi units (the 2-decimal sensor
    * contract), timestamps to epoch-µs longs; the trapezoid sum runs
    * in DECIMAL(38,0) and ONE exact half-away division
    * ([[graft.core.Round6.decRatio6]]) lands the 6-decimal value —
    * no float anywhere, full cross-engine oracle. One window + one
    * groupBy per key; keys with a single observation drop (no span).
    *
    * @return (keys..., t_first, t_last, n_obs, twa)
    */
  def timeWeightedAvg(obs: DataFrame, keys: Seq[String], tsCol: String,
                      valueCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val vc = round(col(valueCol) * 100).cast("long")
    val t = unix_micros(col(tsCol))
    obs.select(keys.map(col) :+ col(tsCol) :+ col(valueCol): _*)
      .withColumn("__vc", vc).withColumn("__t", t)
      .withColumn("__vn", lead(col("__vc"), 1).over(w))
      .withColumn("__tn", lead(col("__t"), 1).over(w))
      .filter(col("__tn").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        min(col(tsCol)).as("t_first"), max(col("__tn")).as("__tl"),
        (count(lit(1)) + 1).as("n_obs"),
        // the PER-TERM product must already be decimal: centi-values
        // near 10⁹ times a day-scale µs gap passes a long
        sum((col("__vc") + col("__vn")).cast("decimal(38,0)") *
          (col("__tn") - col("__t"))).as("__num"),
        min(col("__t")).as("__t0"))
      .select(keys.map(col) :+ col("t_first") :+
        timestamp_micros(col("__tl")).as("t_last") :+ col("n_obs") :+
        graft.core.Round6.decRatio6(col("__num"),
          (col("__tl") - col("__t0")).cast("decimal(38,0)") * 200)
          .as("twa"): _*)
  }

  /** Mann–Kendall trend statistic per key, bounded lag (the
    * non-parametric monotone-trend test road-weather QA runs before
    * trusting a sensor's drift — Mann 1945 / Kendall, public
    * literature): S = Σ sign(x_j − x_i) over pairs with
    * 0 < j − i ≤ maxLag. The full test's O(n²) pair set becomes
    * maxLag lag probes per row — linear, windowed, shuffle-once —
    * and the bounded variant keeps the statistic local in time
    * (a season-scale lag bound is standard practice for long series).
    *
    * Exactness: sign() is pure COMPARISON (no float arithmetic
    * anywhere), S and the pair count are integers, and the trend
    * ratio tau = S / n_pairs divides once exactly
    * ([[graft.core.Round6]]) — engine-portable by construction.
    *
    * @return (keys..., n_obs, n_pairs, s, tau); keys with < 2 obs drop
    */
  def mannKendall(obs: DataFrame, keys: Seq[String], tsCol: String,
                  valueCol: String, maxLag: Int = 12): DataFrame = {
    require(maxLag >= 1)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val terms = (1 to maxLag).map { l =>
      val prev = lag(col(valueCol), l).over(w)
      (when(prev.isNull, 0L)
        .when(col(valueCol) > prev, 1L)
        .when(col(valueCol) < prev, -1L)
        .otherwise(0L),
        when(prev.isNull, 0L).otherwise(1L))
    }
    obs.select(keys.map(col) :+ col(tsCol) :+ col(valueCol): _*)
      .withColumn("__s", terms.map(_._1).reduceLeft(_ + _))
      .withColumn("__p", terms.map(_._2).reduceLeft(_ + _))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_obs"), sum("__p").as("n_pairs"),
        sum("__s").as("s"))
      .filter(col("n_pairs") > 0)
      .select(keys.map(col) :+ col("n_obs") :+ col("n_pairs") :+ col("s") :+
        graft.core.Round6.intRatio6(col("s"), col("n_pairs")).as("tau"): _*)
  }

  /** Data-gap inventory: for each key, every pair of consecutive
    * observations more than `minGapSeconds` apart — the explicit list
    * of the no-data windows that pack_ranges accounts for implicitly
    * (nodata = tottime − valid − notvalid). One shuffle on the key.
    *
    * @return keys, gap_start, gap_end, gap_s
    */
  def gapReport(obs: DataFrame, keys: Seq[String], tsCol: String,
                minGapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    obs.select((keys :+ tsCol).map(col): _*)
      .withColumn("__next", lead(col(tsCol), 1).over(w))
      .filter(col("__next").isNotNull &&
        unix_timestamp(col("__next")) - unix_timestamp(col(tsCol)) > minGapSeconds)
      .select(keys.map(col) :+ col(tsCol).as("gap_start") :+
        col("__next").as("gap_end") :+
        (unix_timestamp(col("__next")) - unix_timestamp(col(tsCol))).as("gap_s"): _*)
  }
}
