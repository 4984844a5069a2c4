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

  /** Context-window chunking: cut each document into token windows of
    * at most `maxTokens`, consecutive windows sharing `overlap` tokens
    * (the standard retrieval/embedding prep step; overlap preserves
    * context across cuts). Chunk starts advance by
    * `stride = maxTokens - overlap`; the LAST chunk is the first one
    * whose window reaches the document's end, so no chunk is ever fully
    * contained in its predecessor and every token appears in >= 1
    * chunk. Documents with no tokens produce no chunks.
    *
    * Scale: per-row arithmetic only (token array -> <= n/stride slices)
    * with no shuffle at all — the explode multiplies row count by
    * ~n/stride but each output row is a bounded window of its input
    * row. Emits (idCol, chunk_id, n_chunk_tokens, chunk_text).
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    require(overlap >= 0 && overlap < maxTokens,
      "overlap must be in [0, maxTokens)")
    val stride = maxTokens - overlap
    val toks = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
    // keep start i*stride while i*stride < n - overlap (and always i=0):
    // the first window reaching the end terminates the sequence
    val nChunks = greatest(lit(1L),
      ceil((col("__n") - lit(overlap)).cast("double") / stride))
    toks
      .select(col(idCol), posexplode(transform(
        sequence(lit(0L), nChunks - 1),
        i => slice(col("__toks"), i * stride + 1, lit(maxTokens))))
        .as(Seq("chunk_id", "__chunk")))
      .select(col(idCol), col("chunk_id"),
        size(col("__chunk")).as("n_chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /** Length-bucketed batching: order documents by descending token
    * count (ties by id), cut every `batchSize` documents, and report
    * each batch's padding efficiency — batching similar lengths
    * together is how a training/inference loader keeps pad_frac (the
    * fraction of a padded batch that is padding) near zero, vs the
    * ~50% a shuffled loader wastes on mixed lengths.
    *
    * The global descending-length rank uses
    * [[graft.core.SkewOps.globalRank]] — range partition + broadcast
    * offsets, NO single-reducer total-order window (the plan-asserted
    * q_doc_shuffle discipline), so the ordering scales with executors.
    *
    * @return per batch: (batch_id, n_docs, max_len, sum_len, pad_frac)
    *         with pad_frac = round6(1 − sum/(n·max))
    */
  def lengthBatches(docs: DataFrame, idCol: String, nTokens: Column,
                    batchSize: Int): DataFrame = {
    require(batchSize > 0)
    val ranked = graft.core.SkewOps.globalRank(
      docs.select(col(idCol), nTokens.cast("long").as("__len")),
      Seq(col("__len").desc, col(idCol)), rankCol = "__rk")
    ranked
      .withColumn("batch_id", floor((col("__rk") - 1) / lit(batchSize)).cast("long"))
      .groupBy("batch_id")
      .agg(count(lit(1)).as("n_docs"),
        max(col("__len")).as("max_len"),
        sum(col("__len")).as("sum_len"))
      .select(col("batch_id"), col("n_docs"), col("max_len"), col("sum_len"),
        round(lit(1.0) - col("sum_len") /
          (col("n_docs") * col("max_len")).cast("double"), 6).as("pad_frac"))
  }

  /** Next-event-prediction training windows from a keyed event log:
    * per key, order by (ts, tiebreak) and slide a window of
    * `contextLen` events predicting the one after it — the sequence-
    * construction step behind behavioral/recommendation models (and
    * the event-log analogue of [[chunkDocuments]] for text).
    *
    * Emits (key, pos, context, target): `pos` is the 1-based index of
    * the window's first event, `context` the space-joined event
    * window, `target` the following event. Only COMPLETE windows emit.
    *
    * Scale: one shuffle (partition by key), per-key windows bounded by
    * that key's history — `lead()` chains, no self-join, no explode.
    * Deterministic under the (ts, tiebreak) total order.
    */
  def eventWindows(events: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, eventCol: String,
                   contextLen: Int = 3): DataFrame = {
    require(contextLen >= 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val leads = (1 to contextLen).map(k =>
      lead(col(eventCol), k - 1).over(w).as(s"__e$k"))
    val target = lead(col(eventCol), contextLen).over(w).as("__tgt")
    events
      .select((col(keyCol) +: col(tsCol) +: col(tieCol) +: leads :+ target): _*)
      .withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("__tgt").isNotNull) // complete windows only
      .select(col(keyCol), col("pos"),
        concat_ws(" ", (1 to contextLen).map(k => col(s"__e$k")): _*)
          .as("context"),
        col("__tgt").as("target"))
  }
}
