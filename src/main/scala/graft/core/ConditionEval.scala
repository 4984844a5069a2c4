package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Expr

/** Condition evaluation: refine block ranges to the most granular
  * boundary grid, resolve each block's truth value on every grid range,
  * and evaluate the master boolean expression under SQL 3VL
  * (reference tsa/condition.py:355-391, SURVEY.md §2.3 R10-R15).
  *
  * The reference LEFT-JOINs every block relation to the master ranges on
  * range overlap (`&&`) — an O(n·m) nested-loop theta join per block in
  * Spark. We use the equivalent forward-fill formulation (SURVEY.md §7.3):
  * because master ranges are the atomic refinement of ALL block
  * boundaries, block k covers master range [t_i, t_{i+1}) iff the last
  * open/close event of block k at or before t_i is an "open". That turns
  * the N-way range join into one pivot + one window over the boundary
  * grid — O(B·k) rows, one sort, no quadratic blow-up.
  */
object ConditionEval {

  /** Evaluate one condition.
    *
    * @param blockRanges `(alias, vfrom, vuntil, istrue)` — the union of
    *   all block range sets of this condition (primary from
    *   [[PackRanges]], secondary from the result catalog)
    * @param aliases block aliases in condition order (pivot columns)
    * @param masterExpr boolean AST over the aliases
    * @return `(vfrom, vuntil, vdiff_s, <alias...>, master)` sorted by vfrom
    */
  def evalCondition(blockRanges: DataFrame, aliases: Seq[String],
                    masterExpr: Expr): DataFrame = {
    require(aliases.nonEmpty)

    // Single-block shortcut (tsa/condition.py:355-363; the reference's
    // Py3-broken `blocks.keys()[0]` — we implement the documented intent,
    // SURVEY.md §7.4 point 3). Unlike the reference, the master column
    // still evaluates the expression: for `not <block>` the reference's
    // shortcut silently drops the NOT (master := block); we apply it.
    if (aliases.size == 1) {
      val a = aliases.head
      return blockRanges
        .select(
          col("vfrom"), col("vuntil"),
          (unix_timestamp(col("vuntil")) - unix_timestamp(col("vfrom"))).as("vdiff_s"),
          col("istrue").as(a))
        .withColumn("master", compile(masterExpr))
        .orderBy("vfrom")
    }

    // R10: boundary events. Every range contributes an "open" at vfrom
    // (priority 1, carrying the 3VL-encoded value) and a "close" at
    // vuntil (priority 0). At an equal timestamp an open shadows a close
    // (adjacent ranges), resolved by max(struct(prio, v)).
    val opens = blockRanges.select(
      col("vfrom").as("vt"), col("alias"),
      struct(lit(1).as("prio"),
        coalesce(col("istrue").cast("int"), lit(-1)).as("v")).as("ev"))
    val closes = blockRanges.select(
      col("vuntil").as("vt"), col("alias"),
      struct(lit(0).as("prio"), lit(null).cast("int").as("v")).as("ev"))
    val events = opens.union(closes)

    // Pivot to one column per block alias; grid rows are the distinct
    // boundary timestamps (the reference's UNION-dedup, R10).
    val grid = events.groupBy("vt").pivot("alias", aliases).agg(max(col("ev")))

    // One global sort per condition — same as the reference's
    // ORDER BY vt window (tsa/condition.py:374-380). For many-condition
    // batches the Engine runs conditions as independent jobs.
    val w = Window.orderBy("vt")
    val fill = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    var df = grid
    for (a <- aliases)
      df = df.withColumn(s"__f_$a", last(col(a), ignoreNulls = true).over(fill))

    // R11: consecutive boundary pairs; drop the trailing open range.
    df = df
      .withColumn("vuntil", lead(col("vt"), 1).over(w))
      .filter(col("vuntil").isNotNull)

    // R12 equivalent: block value on [vt, vuntil) = value of the covering
    // range if the last event was an open, else NULL (no covering range).
    val blockCols = aliases.map { a =>
      val f = col(s"__f_$a")
      when(f.isNotNull && f("prio") === 1,
        when(f("v") === 1, lit(true)).when(f("v") === 0, lit(false))
          .otherwise(lit(null).cast("boolean")))
        .otherwise(lit(null).cast("boolean")).as(a)
    }

    df.select(
        (col("vt").as("vfrom") +: col("vuntil") +:
          (unix_timestamp(col("vuntil")) - unix_timestamp(col("vt"))).as("vdiff_s") +:
          blockCols): _*)
      // R13: master under native 3VL — do NOT coalesce block booleans
      .withColumn("master", compile(masterExpr))
      .orderBy("vfrom")
  }

  /** Compile the boolean AST to a Column (reference builds a SQL string,
    * tsa/condition.py:271-285). Spark's And/Or/Not are SQL-3VL, matching
    * Postgres exactly (SURVEY.md §1.3).
    */
  def compile(e: Expr): Column = e match {
    case Expr.Ref(a) => col(a)
    case Expr.And(l, r) => compile(l) && compile(r)
    case Expr.Or(l, r) => compile(l) || compile(r)
    case Expr.Not(x) => !compile(x)
  }

  /** Summary aggregation (reference tsa/condition.py:435-446, A2-A5):
    * one distributed agg — `tottime` spans fetched data (not the request
    * range); `nodata` absorbs NULL-master ranges AND uncovered gaps.
    */
  def summarize(cond: DataFrame): DataFrame =
    cond.agg(
      min(col("vfrom")).as("data_from"),
      max(col("vuntil")).as("data_until"),
      coalesce(sum(when(col("master") === true, col("vdiff_s"))), lit(0L)).as("valid_s"),
      coalesce(sum(when(col("master") === false, col("vdiff_s"))), lit(0L)).as("notvalid_s"),
      count(lit(1)).as("n_rows"))
      .withColumn("tottime_s",
        coalesce(unix_timestamp(col("data_until")) - unix_timestamp(col("data_from")), lit(0L)))
      .withColumn("nodata_s", col("tottime_s") - col("valid_s") - col("notvalid_s"))
      .withColumn("percent_valid",
        when(col("tottime_s") === 0, 0.0).otherwise(col("valid_s") / col("tottime_s")))
      .withColumn("percent_notvalid",
        when(col("tottime_s") === 0, 0.0).otherwise(col("notvalid_s") / col("tottime_s")))
      .withColumn("percent_nodata",
        when(col("tottime_s") === 0, 0.0).otherwise(col("nodata_s") / col("tottime_s")))
}
