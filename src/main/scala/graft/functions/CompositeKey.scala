package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

/** Composite-key ENCODING for the snapshot store: pack two
  * non-negative longs into one, ORDER-PRESERVINGLY —
  * `pack(hi, lo) = hi · 2^loBits + lo` sorts exactly like the tuple
  * `(hi, lo)`, so a store keyed by `pack(statid, tfrom)` gets the
  * composite-key access patterns from the single-long machinery:
  *
  *   - "station s, time in [t0, t1]" is the CONTIGUOUS key range
  *     `[pack(s, t0), pack(s, t1)]` — `scanKeyRange`/`deleteRange`
  *     prune/drop files exactly as for a native composite key;
  *   - "all of station s" is `[pack(s, 0), pack(s, 2^loBits − 1)]` —
  *     a whole-station erasure stays manifest-only where files are
  *     station-pure;
  *   - per-file (minKey, maxKey) envelopes ARE tuple envelopes, and
  *     range-partitioning by the packed key clusters (hi, lo)
  *     lexicographically — tight per-file station/time ranges.
  *
  * Cross-dimension predicates that are NOT a prefix range ("any
  * station, time in [t0, t1]") don't map to one key interval —
  * declare the natural columns in `statsCols` and use `scanRanges`
  * (zone-map conjunction), or the Z-order layout (`compactZorder`)
  * when both dimensions need locality. This is the documented
  * key-encoding recipe; the arithmetic replays in any engine
  * (`hi * 2^loBits + lo`), so packed keys carry full relational
  * oracles.
  *
  * Bounds are VALIDATED (ANSI-mode `raise_error`), not masked: a
  * negative part or an `lo ≥ 2^loBits` would silently interleave
  * into a neighboring `hi`'s range and corrupt every range scan —
  * refuse loudly at write time, the snapshot-store key discipline.
  */
object CompositeKey {

  private def bounds(loBits: Int): (Long, Long) = {
    require(loBits >= 1 && loBits <= 62,
      s"loBits must be in [1, 62], got $loBits")
    (1L << loBits, Long.MaxValue >> loBits) // (lo exclusive max, hi inclusive max via <)
  }

  /** `hi * 2^loBits + lo`, refusing out-of-range parts. `hi` may use
    * the remaining `63 − loBits` bits (the result stays a
    * non-negative long).
    */
  def pack(hi: Column, lo: Column, loBits: Int): Column = {
    val (loMax, hiMax) = bounds(loBits)
    when(hi.isNull || lo.isNull, lit(null).cast("long"))
      .when(hi < 0L || hi > hiMax || lo < 0L || lo >= loMax,
        raise_error(concat(
          lit(s"composite key part out of range (loBits=$loBits, " +
            s"hi in [0, $hiMax], lo in [0, ${loMax - 1}]): hi="),
          hi.cast("string"), lit(", lo="), lo.cast("string"))).cast("long"))
      .otherwise(hi.cast("long") * loMax + lo.cast("long"))
  }

  /** The high part of a packed key (`k div 2^loBits` — catalyst
    * `IntegralDivide`, exact over the full long range; a double
    * division would go inexact past 2^53).
    */
  def hi(key: Column, loBits: Int): Column = {
    val (loMax, _) = bounds(loBits)
    ColumnShim.column(new IntegralDivide(
      ColumnShim.expression(key), ColumnShim.expression(lit(loMax))))
  }

  /** The low part of a packed key (`k mod 2^loBits`). */
  def lo(key: Column, loBits: Int): Column = {
    val (loMax, _) = bounds(loBits)
    pmod(key, lit(loMax)).cast("long")
  }

  /** The packed-key range of "hi = h, lo in [lo0, lo1]" — the
    * contiguous interval a per-station time-range scan or erasure
    * feeds to `scanKeyRange`/`deleteRange`.
    */
  def range(h: Long, lo0: Long, lo1: Long, loBits: Int): (Long, Long) = {
    val (loMax, hiMax) = bounds(loBits)
    require(h >= 0 && h <= hiMax && lo0 >= 0 && lo1 < loMax && lo0 <= lo1,
      s"bad composite range: hi=$h lo=[$lo0, $lo1] loBits=$loBits")
    (h * loMax + lo0, h * loMax + lo1)
  }
}
