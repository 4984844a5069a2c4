package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.CmpOp

/** The analytic kernel: run-length compression of sensor readings into
  * maximal time ranges of constant truth value
  * (reference `pack_ranges`, database/01_init_db.sql:121-202).
  *
  * Semantics replicated exactly:
  *   1. each reading is valid `[tfrom, next tfrom)` — the last reading per
  *      key is dropped (`tuntil IS NULL`, database/01_init_db.sql:156);
  *   2. a validity longer than `maxMinutes` is truncated to `maxMinutes`
  *      (stale data stops representing reality; the remainder becomes an
  *      uncovered gap, database/01_init_db.sql:146-156);
  *   3. NULL comparison results are 3VL-encoded as -1 so they participate
  *      in run detection (database/01_init_db.sql:157-160);
  *   4. adjacent ranges with equal truth value merge into islands — keyed
  *      on value change ONLY, so a truncation gap inside an equal-valued
  *      run is absorbed by the island (database/01_init_db.sql:161-199:
  *      `total_range` spans lower(first)..upper(last) of the run).
  *
  * Spark-first restructuring (SURVEY.md §7.4 point 6): where the reference
  * calls pack_ranges once per block (one Postgres query each), we tag the
  * observation scan with a broadcast block-key table and compute ALL
  * blocks in ONE windowed pass, partitioned by block id. At 100 TB this
  * is the difference between k full scans and one.
  */
object PackRanges {

  /** One block to pack: equality key into the obs table + a predicate
    * over `seval` (reference: p_statid, p_seid, p_operator, p_seval).
    */
  final case class KeyedBlock(blockId: Int, statid: Long, seid: Long, pred: Column)

  /** Build the predicate Column for a comparison op (reference splices
    * text into SQL, database/01_init_db.sql:138; we build typed Columns).
    */
  def predicate(seval: Column, op: CmpOp, values: Seq[Double]): Column = op match {
    case CmpOp.Eq => seval === values.head
    case CmpOp.Ne => seval =!= values.head
    case CmpOp.Gt => seval > values.head
    case CmpOp.Lt => seval < values.head
    case CmpOp.Ge => seval >= values.head
    case CmpOp.Le => seval <= values.head
    case CmpOp.In => seval.isin(values: _*)
  }

  /** OR-of-equalities over the block keys. The broadcast tagging join
    * selects the same rows, but a JOIN cannot sink below whatever
    * produced `obs` — when obs is an aggregated view (the usual case:
    * ingestion E5 groups by (tfrom, statid, seid)), the full relation
    * would aggregate first and the key restriction would apply after.
    * This predicate references grouping columns only, so Catalyst pushes
    * it through the Aggregate to the scan side: a collection touching
    * k of the corpus's key pairs shuffles k's readings, not everything.
    */
  private def keyFilter(blocks: Seq[KeyedBlock]): Column =
    blocks.map(b => col("statid") === b.statid && col("seid") === b.seid)
      .reduceOption(_ || _)
      .getOrElse(lit(false)) // no blocks → empty result, not a crash

  /** Per-block predicate dispatch keyed on the (already tagged)
    * `block_id` column.
    */
  private def blockPred(preds: Seq[(Int, Column)]): Column =
    preds.foldLeft(lit(null).cast("boolean")) { case (acc, (id, p)) =>
      when(col("block_id") === id, p).otherwise(acc)
    }

  /** Shared tagging prologue of both pack variants: pushable key
    * pre-filter, broadcast of the (tiny) block-key table — rows matching
    * several blocks duplicate per block; the reference would scan once
    * per block — and the per-block `istrue` evaluation.
    */
  private[graft] def tagKeyed(obs: DataFrame, blocks: Seq[KeyedBlock]): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    val keys = blocks.map(b => (b.blockId, b.statid, b.seid))
      .toDF("block_id", "statid", "seid")
    obs.filter(keyFilter(blocks))
      .join(broadcast(keys), Seq("statid", "seid"))
      .withColumn("istrue", blockPred(blocks.map(b => b.blockId -> b.pred)))
  }

  /** Pack all blocks in one pass over `obs(tfrom, statid, seid, seval)`.
    *
    * @return `(block_id, vfrom, vuntil, istrue)` — maximal constant-value
    *         ranges per block; `istrue` nullable (3VL).
    */
  def packKeyed(obs: DataFrame, blocks: Seq[KeyedBlock], maxMinutes: Int): DataFrame =
    pack(tagKeyed(obs, blocks), maxMinutes)

  /** Generic-tagging variant: each spec carries an arbitrary row filter
    * (used where block keys are not simple equalities). Explodes one row
    * per matching spec — use [[packKeyed]] on large scans.
    */
  final case class TaggedBlock(blockId: Int, filter: Column, pred: Column)
  def packTagged(obs: DataFrame, blocks: Seq[TaggedBlock], maxMinutes: Int): DataFrame = {
    val tagged = obs
      .withColumn("block_id", explode(array(
        blocks.map(b => when(b.filter, lit(b.blockId))): _*)))
      .filter(col("block_id").isNotNull)
    pack(tagged.withColumn("istrue",
      blockPred(blocks.map(b => b.blockId -> b.pred))), maxMinutes)
  }

  /** Skew-resistant variant for very hot keys: a single block's series
    * at 100 TB can hold billions of readings — one window partition per
    * block (the [[packKeyed]] layout, and what the reference's global
    * ORDER BY does) would bottleneck on that key. Here readings are
    * packed WITHIN (block, time-chunk) partitions in parallel, then the
    * partial islands (run-length compressed, orders of magnitude
    * smaller) are stitched across chunk borders by one cheap second
    * pass. Provably equivalent to [[packKeyed]]:
    *   - each chunk-local lead equals the global lead, except the last
    *     reading per chunk, whose lead is supplied by joining the next
    *     non-empty chunk's min(tfrom);
    *   - value-keyed island merging is associative over ordered runs, so
    *     merging partial islands re-creates the global islands.
    * (Equivalence is property-tested against packKeyed.)
    */
  def packKeyedChunked(obs: DataFrame, blocks: Seq[KeyedBlock], maxMinutes: Int,
                       chunkHours: Int = 24): DataFrame = {
    val chunkSec = chunkHours * 3600L
    val withChunk = tagKeyed(obs, blocks)
      .withColumn("chunk", (unix_timestamp(col("tfrom")) / chunkSec).cast("long"))

    // lead within (block, chunk); last row per chunk borrows the next
    // non-empty chunk's first timestamp
    val wc = Window.partitionBy("block_id", "chunk").orderBy("tfrom")
    val chunkMins = withChunk.groupBy("block_id", "chunk")
      .agg(min("tfrom").as("chunk_min"))
    val wNext = Window.partitionBy("block_id").orderBy("chunk")
    val nextMins = chunkMins
      .withColumn("next_min", lead(col("chunk_min"), 1).over(wNext))
      .select("block_id", "chunk", "next_min")

    val ranges = withChunk
      .withColumn("lead_local", lead(col("tfrom"), 1).over(wc))
      // borders are one row per (block, chunk) — broadcast keeps the
      // reading stream on its existing (block, chunk) partitioning
      // instead of re-shuffling it into a sort-merge join
      .join(broadcast(nextMins), Seq("block_id", "chunk"))
      .withColumn("tuntil_raw", coalesce(col("lead_local"), col("next_min")))
      .filter(col("tuntil_raw").isNotNull)
      .withColumn("tuntil",
        least(col("tuntil_raw"),
          col("tfrom") + expr(s"INTERVAL '$maxMinutes' MINUTE")))
      .withColumn("enc", coalesce(col("istrue").cast("int"), lit(-1)))

    // partial islands within each chunk (parallel across chunks)
    val partial = ranges
      .withColumn("chg",
        when(col("enc") === lag(col("enc"), 1).over(wc), lit(0)).otherwise(lit(1)))
      .withColumn("grp",
        sum(col("chg")).over(wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("block_id"), col("chunk"), col("grp"))
      .agg(min(col("tfrom")).as("vfrom"), max(col("tuntil")).as("vuntil"),
        first(col("enc")).as("enc"))

    // stitch: value-keyed merge over the (small) partial-island stream
    val wb = Window.partitionBy("block_id").orderBy("vfrom")
    partial
      .withColumn("chg",
        when(col("enc") === lag(col("enc"), 1).over(wb), lit(0)).otherwise(lit(1)))
      .withColumn("grp2",
        sum(col("chg")).over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("block_id"), col("grp2"))
      .agg(min(col("vfrom")).as("vfrom"), max(col("vuntil")).as("vuntil"),
        first(col("enc")).as("enc"))
      .select(col("block_id"), col("vfrom"), col("vuntil"),
        when(col("enc") === 1, lit(true))
          .when(col("enc") === 0, lit(false))
          .otherwise(lit(null).cast("boolean")).as("istrue"))
  }

  /** Core pack over a pre-tagged frame with columns
    * `(block_id, tfrom, istrue)`; one shuffle on block_id, two window
    * passes sharing the same sort, one partial-aggregated groupBy.
    */
  def pack(tagged: DataFrame, maxMinutes: Int): DataFrame = {
    val w = Window.partitionBy("block_id").orderBy("tfrom")

    val ranges = tagged
      // R4: validity interval = [tfrom, lead(tfrom)); last reading dropped
      .withColumn("tuntil_raw", lead(col("tfrom"), 1).over(w))
      .filter(col("tuntil_raw").isNotNull)
      // R5: cap at maxMinutes
      .withColumn("tuntil",
        least(col("tuntil_raw"),
          col("tfrom") + expr(s"INTERVAL '$maxMinutes' MINUTE")))
      // R6: 3VL encode so NULL forms its own runs
      .withColumn("enc", coalesce(col("istrue").cast("int"), lit(-1)))

    // R7: islands on value change only (gaps do NOT break runs — matches
    // the reference, which stitches lower(first)..upper(last) of each run)
    val islands = ranges
      .withColumn("chg",
        when(col("enc") === lag(col("enc"), 1).over(w), lit(0)).otherwise(lit(1)))
      .withColumn("grp",
        sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    islands
      .groupBy(col("block_id"), col("grp"))
      .agg(
        min(col("tfrom")).as("vfrom"),
        max(col("tuntil")).as("vuntil"),
        first(col("enc")).as("enc"))
      .select(
        col("block_id"), col("vfrom"), col("vuntil"),
        when(col("enc") === 1, lit(true))
          .when(col("enc") === 0, lit(false))
          .otherwise(lit(null).cast("boolean")).as("istrue"))
  }
}
