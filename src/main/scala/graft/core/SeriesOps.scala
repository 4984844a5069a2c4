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
