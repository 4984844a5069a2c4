package graft.core

import org.apache.spark.sql.DataFrame
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
}
