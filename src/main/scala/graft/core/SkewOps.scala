package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation layouts.
  *
  * Algebraic aggregates (sum/count/min/max) are already two-phase in
  * Spark (map-side partial aggregation), so hot keys don't need
  * salting there. The aggregates that DO collapse a hot key onto one
  * reducer are the holistic ones — exact distinct counts and
  * collect-style aggregation — because every value of the key must
  * meet. These helpers restructure them so the heavy phase shuffles on
  * (key, value) — spread across reducers by the value — and only
  * per-key PARTIALS meet at the end.
  */
object SkewOps {

  /** Exact distinct count per key without a hot-key reducer:
    * dedup on (keys, value) first — that shuffle spreads a hot key
    * over all reducers by value hash — then count per key (algebraic,
    * map-side combined). Equivalent to
    * `groupBy(keys).agg(countDistinct(value))`, which funnels every
    * distinct value of a key through one reducer.
    */
  def distinctCountByKey(df: DataFrame, keys: Seq[String],
                         valueCol: String): DataFrame =
    df.select((keys :+ valueCol).map(col): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(s"n_distinct_$valueCol"))

  /** Exact top-k rows per key without a hot-key reducer. A single
    * `row_number` window sorts a hot key's ENTIRE row set on one
    * reducer; instead: salt each row by a hash of the ordering columns,
    * take a local top-k within every (key, salt) partition — the hot
    * key's rows spread over `salts` reducers — then rank the surviving
    * ≤ k·salts rows per key. The global top-k of a key is contained in
    * the union of its salted top-ks, so the result is exactly the
    * single-window answer, including the tie-break.
    *
    * @param orderCols ordering (descending significance first) — must be
    *   a total order over rows of a key for a deterministic result, so
    *   include a tie-break column
    *
    * Output adds a `rnk` column (1..k per key) — `rnk` is reserved; the
    * input must not already have it. The internal local-rank column is
    * generated collision-free against the input schema.
    */
  def topKByKey(df: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                k: Int, salts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.contains("rnk"),
      "topKByKey emits a 'rnk' column; rename the input's 'rnk' first")
    // any deterministic row→salt function preserves exactness (the
    // global top-k is in the union of the salted top-ks for EVERY
    // partition of the rows); hash the non-key columns to spread. If the
    // keys cover every column, all rows of a key are identical anyway —
    // a key-hash salt (constant per key) is still a valid partition.
    val nonKey = df.columns.filterNot(keys.contains)
    val saltSrc: Seq[String] = if (nonKey.nonEmpty) nonKey.toSeq else keys
    val salt = pmod(hash(saltSrc.map(col): _*), lit(salts))
    val lrn = Iterator.from(0).map(i => s"__lrn$i")
      .find(n => !df.columns.contains(n)).get
    val wLocal = Window.partitionBy((keys.map(col) :+ salt): _*).orderBy(orderCols: _*)
    val local = df.withColumn(lrn, row_number().over(wLocal))
      .filter(col(lrn) <= k).drop(lrn)
    val wFinal = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    local.withColumn("rnk", row_number().over(wFinal))
      .filter(col("rnk") <= k)
  }

  /** Global rank (1-based, dense total order) by `orderCols` WITHOUT a
    * single-task global window — `row_number().over(Window.orderBy(…))`
    * funnels the whole relation through one reducer, the classic
    * total-ordering trap. Instead: range-repartition on the order
    * columns (boundaries are sampled, but the OUTPUT rank depends only
    * on the total order, so it is deterministic for a unique ordering),
    * rank within each range partition, then add the broadcast
    * cumulative offset of the partitions before it — the per-partition
    * row counts are the only thing that meets the driver (bounded by
    * the partition count). `orderCols` must be a total order (break
    * ties with a unique id) or ranks within a tie are
    * partition-placement-dependent.
    */
  def globalRank(df: DataFrame, orderCols: Seq[Column],
                 rankCol: String = "rank"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parted = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      // MUST materialize: the sizes pass below and the final ranked
      // output are two jobs, and an unpersisted repartitionByRange
      // re-samples its range boundaries per execution (RangePartitioner
      // seeds from the rdd id; AQE may also re-coalesce) — offsets
      // computed against one layout would then be applied to another,
      // duplicating/skipping ranks
      .localCheckpoint(eager = false)
    // one pass for the partition sizes (bounded collect: #partitions
    // rows), turned into exclusive prefix offsets
    val sizes = parted.groupBy("__pid").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = sizes.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) =>
      (pid, acc + n)
    }.init.map { case (_, off) => off }
    val offsetOf = {
      val byPid = sizes.map(_._1).zip(offsets).toMap
      udf { (pid: Int) => byPid.getOrElse(pid, 0L) }
    }
    val w = Window.partitionBy("__pid").orderBy(orderCols: _*)
    parted
      .withColumn(rankCol, offsetOf(col("__pid")) + row_number().over(w))
      .drop("__pid")
  }

  /** EXCLUSIVE global prefix sum of `valueCol` in `orderCols` order —
    * [[globalRank]]'s sibling for running totals (cumulative
    * distributions, Mann-Whitney rank sums, token offsets over
    * non-integer keys): range-partition on the order, local exclusive
    * prefix inside each partition, per-partition totals (a bounded
    * collect) broadcast back as offsets. No SinglePartition window
    * anywhere; `orderCols` must be a total order for a deterministic
    * result. `valueCol` must be integral (long sums).
    */
  def prefixSum(df: DataFrame, orderCols: Seq[Column], valueCol: String,
                outCol: String = "prefix"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parted = df.repartitionByRange(orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false) // the globalRank re-sample hazard
    val sums = parted.groupBy("__pid")
      .agg(sum(col(valueCol).cast("long")).as("__s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = sums.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) =>
      (pid, acc + s)
    }.init.map { case (_, off) => off }
    val offsetOf = {
      val byPid = sums.map(_._1).zip(offsets).toMap
      udf { (pid: Int) => byPid.getOrElse(pid, 0L) }
    }
    val w = Window.partitionBy("__pid").orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn(outCol,
        offsetOf(col("__pid")) +
          coalesce(sum(col(valueCol).cast("long")).over(w), lit(0L)))
      .drop("__pid")
  }
}
