package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Sketches

/** Live cardinality profiling: the streaming face of
  * [[graft.operators.Sketches.hllDistinct]]. HLL registers are
  * max-mergeable, so each group's whole history compresses to one
  * 512-byte register array in `mapGroupsWithState` state — O(groups)
  * memory forever, the property that makes a sketch the right shape
  * for an unbounded stream (an exact `approx_count_distinct` twin
  * exists in Spark, but its digest neither replays in an oracle nor
  * merges with the batch sketch's registers).
  *
  * The hash is the SAME md5-derived 60-bit integer as the batch
  * operator (JVM MessageDigest replays Spark's `md5()` hex exactly, the
  * [[Sketches.bloomMightContain]] precedent), so a register array built
  * here MERGES with batch-built registers and the emitted estimate over
  * identical data is bit-identical to the batch query's — pinned by the
  * parity spec.
  *
  * Emits the group's current estimate every micro-batch it receives
  * data (Update-mode semantics).
  */
object StreamingSketches {

  final case class Estimate(group: String, hll_est: Double)

  /** rho (0 = register empty) per register, from the batch operator's
    * exact integer formulation.
    */
  private[streaming] def bucketRho(value: String): (Int, Int) = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    val hex = digest.digest(value.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16)
    val w = 60 - Sketches.HllP
    val bucket = (h >>> w).toInt
    val rem = h & ((1L << w) - 1)
    val rho = if (rem == 0) w + 1 else w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
    (bucket, rho)
  }

  /** Estimate from a register array (0 = empty), identical arithmetic
    * to the batch aggregation: exact integer register sum, one shared
    * double division.
    */
  private[streaming] def estimate(regs: Array[Int]): Double = {
    val z = 60 - Sketches.HllP + 1
    var intsum = 0L
    var i = 0
    while (i < regs.length) {
      intsum += (if (regs(i) == 0) 1L << z else 1L << (z - regs(i)))
      i += 1
    }
    Sketches.HllNumerator / intsum.toDouble
  }

  /** @param df streaming (group string, value string); NULL values are
    *   filtered like the batch operator (a NULL adds nothing to a
    *   distinct count)
    */
  def hllDistinctStream(df: DataFrame): Dataset[Estimate] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("group").cast("string"), col("value").cast("string"))
      .where(col("value").isNotNull)
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Int], Estimate](GroupStateTimeout.NoTimeout()) {
        case (group, rows, gs: GroupState[Array[Int]]) =>
          val regs = gs.getOption.getOrElse(new Array[Int](Sketches.HllM))
          for ((_, v) <- rows) {
            val (b, r) = bucketRho(v)
            if (r > regs(b)) regs(b) = r
          }
          gs.update(regs)
          Estimate(group, estimate(regs))
      }
  }
}
