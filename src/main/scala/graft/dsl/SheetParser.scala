package graft.dsl

import graft.model._
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Sheet → CollectionSpec scan (reference
  * `CondCollection.from_xlsx_sheet`, tsa/cond_collection.py:467-517),
  * over the CSV rendering of the workbook (FIXTURES.md §1):
  *
  * {{{
  * row 1: "start","end"              headers, ignored
  * row 2: "1.2.2018","31.3.2018"     A2 = start, B2 = end, d.M.yyyy
  * row 3: "site","master_alias","condition"   headers, ignored
  * row 4+: site, master_alias, condition [, comment cols ignored]
  * }}}
  *
  * Dates widen to 00:00:00 / 23:59:59 (tsa/cond_collection.py:44-45).
  * Rows with any empty A:C cell are skipped with a recorded error
  * (tsa/cond_collection.py:504-513); duplicate (site, master_alias)
  * within a sheet is an error (tsa/cond_collection.py:82-87).
  */
object SheetParser {

  private val dateFmt = DateTimeFormatter.ofPattern("d.M.yyyy")

  /** Minimal RFC-4180 CSV line splitter (driver-side tiny input). */
  private[dsl] def splitCsvLine(line: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQuotes = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQuotes) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur += '"'; i += 1
        } else if (c == '"') inQuotes = false
        else cur += c
      } else c match {
        case '"' => inQuotes = true
        case ',' => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.result()
    out.result()
  }

  final case class ParsedSheet(
      spec: Option[CollectionSpec],
      sheetErrors: ErrorCollector,
      conditionErrors: Map[String, ErrorCollector])

  /** Parse one sheet's CSV content. `title` is the sheet name. */
  def parse(title: String, csv: String): ParsedSheet = {
    val errs = new ErrorCollector(s"COLLECTION <$title>")
    val condErrs = scala.collection.mutable.LinkedHashMap.empty[String, ErrorCollector]
    val lines = csv.split("\r?\n", -1).toVector

    if (lines.size < 2) {
      errs.add("Sheet has no date row")
      return ParsedSheet(None, errs, Map.empty)
    }

    val dateCells = splitCsvLine(lines(1))
    def parseDate(idx: Int, what: String): Option[java.time.LocalDate] = {
      val cell = dateCells.lift(idx).map(_.trim).getOrElse("")
      if (cell.isEmpty) { errs.add(s"Missing $what date"); None }
      else
        try Some(java.time.LocalDate.parse(cell, dateFmt))
        catch {
          case _: Exception =>
            errs.add(s"""Cannot parse $what date "$cell" (expected d.M.yyyy)"""); None
        }
    }
    val from = parseDate(0, "start")
    val until = parseDate(1, "end")
    (from, until) match {
      case (Some(f), Some(u)) if f.isAfter(u) =>
        errs.add("Start date is after end date")
        return ParsedSheet(None, errs, condErrs.toMap)
      case (Some(_), Some(_)) => ()
      case _ => return ParsedSheet(None, errs, condErrs.toMap)
    }

    val conditions = Vector.newBuilder[ConditionSpec]
    val seen = scala.collection.mutable.Set.empty[String]
    for ((line, i) <- lines.zipWithIndex.drop(3) if line.trim.nonEmpty) {
      val cells = splitCsvLine(line).map(_.trim)
      val site = cells.lift(0).getOrElse("")
      val alias = cells.lift(1).getOrElse("")
      val cond = cells.lift(2).getOrElse("")
      if (site.isEmpty || alias.isEmpty || cond.isEmpty) {
        errs.add(s"Row ${i + 1}: empty site, master_alias or condition cell, row skipped")
      } else {
        val ce = new ErrorCollector(s"CONDITION <${site}_$alias>")
        ConditionParser.parse(site, alias, cond, ce) match {
          case Some(spec) =>
            if (seen.contains(spec.idString)) {
              errs.add(s"""Duplicate condition identifier "${spec.idString}", row skipped""")
              // key the duplicate's diagnostics by row so they don't
              // overwrite the original condition's collector
              if (ce.nonEmpty) condErrs(s"${spec.idString} (row ${i + 1})") = ce
            } else {
              seen += spec.idString; conditions += spec
              if (ce.nonEmpty) condErrs(spec.idString) = ce
            }
          case None =>
            condErrs(s"${site}_$alias (row ${i + 1})") = ce
        }
      }
    }

    val spec = CollectionSpec(title,
      LocalDateTime.of(from.get, java.time.LocalTime.of(0, 0, 0)),
      LocalDateTime.of(until.get, java.time.LocalTime.of(23, 59, 59)),
      conditions.result())
    ParsedSheet(Some(spec), errs, condErrs.toMap)
  }
}
