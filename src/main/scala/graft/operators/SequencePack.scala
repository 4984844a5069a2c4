package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data layout: concatenate documents
  * in a deterministic id order into one token stream and cut it every
  * `capacity` tokens. Each document's assignment is derived from the
  * running token count before it — `seq_id = prev div capacity`,
  * `seq_offset = prev mod capacity` — so downstream writers can
  * materialize fixed-length training sequences without ever forming the
  * concatenated stream (documents crossing a cut simply span
  * consecutive seq_ids).
  *
  * The running sum is a global prefix scan — the textbook single-key
  * window bottleneck. Same cure as the pack/condition kernels
  * ([[graft.core.PackRanges.packKeyedChunked]]): local prefix sums
  * inside id-range chunks in parallel, chunk totals (thousands of times
  * smaller) prefix-summed on one bounded partition, broadcast back.
  */
object SequencePack {

  /** @param docs     input relation; one row per document
    * @param idCol    dense-ish orderable id — defines the concatenation
    *                 order and the chunk ranges
    * @param nTokens  token count expression (e.g.
    *                 [[TextOps.tokenCount]] of the text column)
    * @param capacity tokens per training sequence
    * @param chunkWidth id-range width per scan chunk (scale knob: one
    *                 chunk ≈ one task)
    * @return (idCol, n_tokens, seq_id, seq_offset)
    */
  def assignments(docs: DataFrame, idCol: String, nTokens: Column,
                  capacity: Int, chunkWidth: Long = 1L << 16): DataFrame = {
    require(capacity > 0)
    val base = docs.select(col(idCol), nTokens.cast("long").as("n_tokens"))
      .withColumn("chunk", floor(col(idCol) / lit(chunkWidth)))
    // local prefix (tokens before this doc, within its chunk)
    val wc = Window.partitionBy("chunk").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("local_prev",
      coalesce(sum(col("n_tokens")).over(wc), lit(0L)))
    // chunk prefix totals: #chunks rows — bounded single partition by
    // construction (pmod keeps the spec non-foldable, cf. ConditionEval)
    val ws = Window.partitionBy(pmod(col("chunk"), lit(1))).orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = base.groupBy("chunk").agg(sum("n_tokens").as("chunk_tokens"))
      .withColumn("chunk_prev", coalesce(sum(col("chunk_tokens")).over(ws), lit(0L)))
      .select("chunk", "chunk_prev")
    local.join(broadcast(prefixes), Seq("chunk"))
      .withColumn("prev", col("chunk_prev") + col("local_prev"))
      .select(col(idCol), col("n_tokens"),
        expr(s"prev div $capacity").as("seq_id"),
        pmod(col("prev"), lit(capacity.toLong)).as("seq_offset"))
  }
}
