package graft.cli

import java.nio.file.{Files, Path}

/** Dependency-free SVG renderer for the condition timeline plot —
  * the reference's `broken_barh` figure (tsa/condition.py:448-554) as a
  * vector document instead of a matplotlib PNG: one half-height lane
  * per block (reference alpha 0.5, height 0.5), a full-height master
  * lane (height 0.8, opaque), the reference's exact lane colors
  * (true `#f03b20`, false `#2b83ba`, unknown `#bababa`), month
  * gridlines labeled `%m/%y`, the raw logic annotated above each lane,
  * and y-axis labels naming the aliases + `master`.
  *
  * The input is the engine's condition frame COLLECTED to rows — a
  * report figure is inherently driver-sized (the pack kernel run-length
  * compresses validity into at most thousands of ranges per condition;
  * a plot with more ranges than pixels is unreadable anyway), and
  * TsaBatch already collects the same frame for the summary sheet.
  */
object SvgTimeline {

  /** One validity range: epoch-second bounds + per-lane 3VL values
    * (block values in block order, then master last).
    */
  final case class Range(fromSec: Long, untilSec: Long, lanes: Seq[Option[Boolean]])

  /** Lane label + the logic annotation above it (reference annotates
    * `raw_logic` per block and `alias_condition` above master).
    */
  final case class Lane(label: String, annotation: String)

  private val ColorTrue = "#f03b20"
  private val ColorFalse = "#2b83ba"
  private val ColorNull = "#bababa"
  private val ColorGrid = "#e5e5e5"

  def write(path: Path, lanes: Seq[Lane], ranges: Seq[Range],
            width: Int = 1280, laneHeight: Int = 56): Unit =
    Files.writeString(path, render(lanes, ranges, width, laneHeight))

  def render(lanes: Seq[Lane], ranges: Seq[Range],
             width: Int = 1280, laneHeight: Int = 56): String = {
    require(lanes.nonEmpty, "at least the master lane is required")
    val sb = new StringBuilder
    val leftPad = 110  // y labels
    val topPad = 8
    val bottomPad = 28 // x labels
    val height = topPad + lanes.size * laneHeight + bottomPad
    val plotW = width - leftPad - 12
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height">"""
    sb ++= s"""<rect width="$width" height="$height" fill="white"/>"""

    if (ranges.nonEmpty) {
      val t0 = ranges.map(_.fromSec).min
      val t1 = ranges.map(_.untilSec).max
      val span = math.max(1L, t1 - t0)
      def x(t: Long): Double = leftPad + (t - t0).toDouble / span * plotW

      // month gridlines at UTC month starts, labeled %m/%y (reference
      // MonthLocator + DateFormatter('%m/%y')); skipped when the span
      // contains none (sub-month plots keep just the frame)
      var m = java.time.Instant.ofEpochSecond(t0).atZone(java.time.ZoneOffset.UTC)
        .toLocalDate.withDayOfMonth(1)
      while (m.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond < t1) {
        val ms = m.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
        if (ms >= t0) {
          val gx = f"${x(ms)}%.1f"
          sb ++= s"""<line x1="$gx" y1="$topPad" x2="$gx" y2="${height - bottomPad}" stroke="$ColorGrid"/>"""
          sb ++= s"""<text x="$gx" y="${height - 10}" font-size="12" text-anchor="middle" fill="#444">""" +
            f"${m.getMonthValue}%02d/${m.getYear % 100}%02d</text>"
        }
        m = m.plusMonths(1)
      }

      // lanes: blocks first (half-height, alpha .5), master last (0.8, opaque)
      for ((lane, li) <- lanes.zipWithIndex) {
        val isMaster = li == lanes.size - 1
        val hFrac = if (isMaster) 0.8 else 0.5
        val alpha = if (isMaster) 1.0 else 0.5
        val yTop = topPad + li * laneHeight + laneHeight * (1.0 - hFrac) / 2
        val h = laneHeight * hFrac
        for (r <- ranges) {
          val color = r.lanes(li) match {
            case Some(true) => ColorTrue
            case Some(false) => ColorFalse
            case None => ColorNull
          }
          val rx = x(r.fromSec)
          val rw = math.max(0.5, x(r.untilSec) - rx)
          sb ++= f"""<rect x="$rx%.1f" y="$yTop%.1f" width="$rw%.1f" height="$h%.1f" fill="$color" fill-opacity="$alpha%.1f"/>"""
        }
        sb ++= s"""<text x="6" y="${yTop + h / 2 + 4}" font-size="13" fill="#222">${esc(lane.label)}</text>"""
        sb ++= f"""<text x="${x(ranges.head.fromSec)}%.1f" y="${yTop - 3}%.1f" font-size="11" fill="#666">${esc(lane.annotation)}</text>"""
      }
    }
    sb ++= "</svg>"
    sb.toString
  }

  private def esc(s: String): String = Ooxml.esc(s)
}
