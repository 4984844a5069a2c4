package graft.dsl

import java.nio.file.Path
import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.{Document, Element}
import scala.collection.mutable

/** Dependency-free `.xlsx` workbook INPUT — the inverse of the OOXML
  * writer (`cli/Xlsx.scala`), covering the reference's primary entry
  * point (`tsa/analysis_collection.py:71`, `openpyxl.load_workbook`).
  * A SpreadsheetML package is a ZIP of small XML parts (ECMA-376, a
  * public standard); the workbook protocol sheet is tiny and
  * driver-side, so a DOM parse is the right tool — no Spark involved.
  *
  * Supported surface (everything the protocol sheet can contain):
  *   - shared strings (incl. rich-text runs), inline strings,
  *     formula-cached strings (`t="str"`), booleans, errors;
  *   - numeric cells, with date-format detection through
  *     `styles.xml` (builtin date numFmtIds and custom codes) so a
  *     workbook whose A2/B2 are REAL Excel dates (serials) reads the
  *     same as one storing `d.M.yyyy` text — mirroring openpyxl,
  *     which hands the reference `datetime` objects for styled cells
  *     (`tsa/cond_collection.py:485-500` accepts both);
  *   - the `date1904` workbook flag and the 1900 leap-year phantom;
  *   - rows/cells without explicit `r` references (sequential fill).
  *
  * Output is the sheet-CSV rendering [[SheetParser.parse]] already
  * consumes (FIXTURES.md §1), so every downstream path — dry
  * validation, the engine, the report sinks — is shared with the CSV
  * input, and the reference's own `toimiva.xlsx` / `virheita.xlsx`
  * serve as direct fixtures.
  */
object WorkbookReader {

  /** All sheets of the workbook, in workbook order, as
    * (title, CSV rendering). Callers drop `info` sheets themselves
    * (the reference's `add_collections(drop=['info'])`,
    * tsa/analysis_collection.py:96-101).
    */
  def sheets(path: Path): Vector[(String, String)] = {
    val zip = new ZipFile(path.toFile)
    try {
      def partOpt(name: String): Option[Document] =
        Option(zip.getEntry(name)).map { e =>
          val in = zip.getInputStream(e)
          try newBuilder.parse(in) finally in.close()
        }
      def part(name: String): Document =
        partOpt(name).getOrElse(sys.error(s"$path: missing OOXML part $name"))

      val workbook = part("xl/workbook.xml")
      val date1904 = elems(workbook, "workbookPr")
        .exists(e => truthy(e.getAttribute("date1904")))
      val shared = partOpt("xl/sharedStrings.xml")
        .map(sharedStrings).getOrElse(Vector.empty)
      val dateStyles = partOpt("xl/styles.xml")
        .map(dateStyleIds).getOrElse(Set.empty)
      // rId → part path, resolved relative to xl/
      val rels = elems(part("xl/_rels/workbook.xml.rels"), "Relationship")
        .map { r =>
          val target = r.getAttribute("Target")
          val resolved =
            if (target.startsWith("/")) target.drop(1) else s"xl/$target"
          r.getAttribute("Id") -> resolved
        }.toMap

      elems(workbook, "sheet").toVector.map { s =>
        val rid = Option(s.getAttribute("r:id")).filter(_.nonEmpty)
          .orElse(attrByLocal(s, "id"))
          .getOrElse(sys.error(s"$path: sheet without relationship id"))
        val sheetPart = rels.getOrElse(rid,
          sys.error(s"$path: unresolved sheet relationship $rid"))
        s.getAttribute("name") ->
          renderCsv(part(sheetPart), shared, dateStyles, date1904)
      }
    } finally zip.close()
  }

  /** Sheets parsed straight through [[SheetParser]], `info` sheets
    * dropped — the one-call form of the reference's
    * `AnalysisCollection(input_xlsx)` + `add_collections()`.
    */
  def parse(path: Path): Vector[(String, SheetParser.ParsedSheet)] =
    sheets(path)
      .filterNot { case (title, _) => title.trim.toLowerCase == "info" }
      .map { case (title, csv) => title -> SheetParser.parse(title, csv) }

  // secure, namespace-unaware builder: these are untrusted input files,
  // so external entity resolution is off (XXE); the main SpreadsheetML
  // namespace is unprefixed in practice, and prefixed producers are
  // handled by local-name matching in `elems`
  private def newBuilder = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.setExpandEntityReferences(false)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder()
  }

  /** Descendant elements whose tag's local name is `local` (tolerates
    * an `x:`-style prefix on the main namespace).
    */
  private def elems(root: Document, local: String): Seq[Element] = {
    val all = root.getElementsByTagName("*")
    (0 until all.getLength).map(all.item(_).asInstanceOf[Element])
      .filter(e => e.getTagName == local || e.getTagName.endsWith(s":$local"))
  }
  private def childElems(e: Element, local: String): Seq[Element] = {
    val all = e.getChildNodes
    (0 until all.getLength).map(all.item)
      .collect { case el: Element
        if el.getTagName == local || el.getTagName.endsWith(s":$local") => el }
  }
  private def attrByLocal(e: Element, local: String): Option[String] = {
    val attrs = e.getAttributes
    (0 until attrs.getLength).map(attrs.item)
      .find(a => a.getNodeName == local || a.getNodeName.endsWith(s":$local"))
      .map(_.getNodeValue)
  }

  private def truthy(s: String): Boolean =
    s == "1" || s.equalsIgnoreCase("true")

  /** `<si>` entries: plain `<t>` or rich-text `<r><t>` runs, concatenated. */
  private def sharedStrings(doc: Document): Vector[String] =
    elems(doc, "si").toVector.map { si =>
      (childElems(si, "t") ++
        childElems(si, "r").flatMap(childElems(_, "t")))
        .map(_.getTextContent).mkString
    }

  /** Style indexes (cellXfs order) whose number format is a date/time
    * format: builtin ids 14-22, 27-36, 45-47 (ECMA-376 §18.8.30) or a
    * custom code containing date tokens once literals (quoted or
    * bracketed sections) are stripped.
    */
  private def dateStyleIds(doc: Document): Set[Int] = {
    val customDateFmts = elems(doc, "numFmt").flatMap { f =>
      val id = f.getAttribute("numFmtId")
      if (id.nonEmpty && isDateCode(f.getAttribute("formatCode"))) Some(id.toInt)
      else None
    }.toSet
    val builtinDate = ((14 to 22) ++ (27 to 36) ++ (45 to 47)).toSet
    val xfs = elems(doc, "cellXfs").headOption
      .map(childElems(_, "xf")).getOrElse(Seq.empty)
    xfs.zipWithIndex.collect { case (xf, i)
      if {
        val fmt = xf.getAttribute("numFmtId")
        fmt.nonEmpty && fmt.forall(_.isDigit) &&
          (builtinDate(fmt.toInt) || customDateFmts(fmt.toInt))
      } => i
    }.toSet
  }

  private[dsl] def isDateCode(code: String): Boolean = {
    // drop "..." literals, [..] sections (colors, elapsed [h]), \-escapes
    val bare = code
      .replaceAll("\"[^\"]*\"", "")
      .replaceAll("\\[[^\\]]*\\]", "")
      .replaceAll("\\\\.", "")
    bare.exists(c => "ymdhsYMDHS".indexOf(c) >= 0) &&
      // a pure-number code like "0.00" or General has none of those
      !bare.equalsIgnoreCase("general")
  }

  /** One worksheet part → the CSV protocol rendering. */
  private def renderCsv(doc: Document, shared: Vector[String],
                        dateStyles: Set[Int], date1904: Boolean): String = {
    // sparse grid: (row, col) → rendered text, 0-based
    val grid = mutable.Map.empty[(Int, Int), String]
    var maxRow = -1
    val colMax = mutable.Map.empty[Int, Int]
    var nextRow = 0
    for (rowEl <- elems(doc, "row")) {
      val r = Option(rowEl.getAttribute("r")).filter(_.nonEmpty)
        .map(_.toInt - 1).getOrElse(nextRow)
      nextRow = r + 1
      var nextCol = 0
      for (c <- childElems(rowEl, "c")) {
        val ref = c.getAttribute("r")
        val col =
          if (ref.nonEmpty) colIndex(ref.takeWhile(_.isLetter)) else nextCol
        nextCol = col + 1
        val text = cellText(c, shared, dateStyles, date1904)
        if (text.nonEmpty) {
          grid((r, col)) = text
          maxRow = math.max(maxRow, r)
          colMax(r) = math.max(colMax.getOrElse(r, -1), col)
        }
      }
    }
    val sb = new StringBuilder
    for (r <- 0 to maxRow) {
      sb ++= (0 to colMax.getOrElse(r, -1))
        .map(cIdx => csvCell(grid.getOrElse((r, cIdx), "")))
        .mkString(",")
      sb += '\n'
    }
    sb.toString
  }

  private def cellText(c: Element, shared: Vector[String],
                       dateStyles: Set[Int], date1904: Boolean): String = {
    def v: String = childElems(c, "v").headOption
      .map(_.getTextContent).getOrElse("")
    c.getAttribute("t") match {
      case "s" =>
        val idx = v.trim
        if (idx.nonEmpty && idx.forall(_.isDigit) && idx.toInt < shared.size)
          shared(idx.toInt)
        else ""
      case "inlineStr" =>
        childElems(c, "is").headOption.map { is =>
          (childElems(is, "t") ++
            childElems(is, "r").flatMap(childElems(_, "t")))
            .map(_.getTextContent).mkString
        }.getOrElse("")
      case "str" => v // formula's cached string result
      case "b" => if (v.trim == "1") "TRUE" else "FALSE"
      case "e" => v // error literal, e.g. #DIV/0! — surfaces in parse errors
      case _ => // "n" or absent: numeric
        val raw = v.trim
        if (raw.isEmpty) ""
        else {
          val style = c.getAttribute("s")
          val isDate = style.nonEmpty && style.forall(_.isDigit) &&
            dateStyles(style.toInt)
          if (isDate) serialToDate(raw.toDouble, date1904)
          else fmtNum(raw)
        }
    }
  }

  /** Excel serial day → `d.M.yyyy` (the protocol's date format —
    * SheetParser widens to 00:00:00/23:59:59, exactly as the reference
    * wipes the time of datetime cells, tsa/cond_collection.py:44-45).
    * 1900 system: epoch 1899-12-30 compensates the phantom 1900-02-29
    * for serials ≥ 61; serials ≤ 59 (before the phantom) are off by the
    * missing day, so they use 1899-12-31. 1904 system: epoch 1904-01-01.
    */
  private[dsl] def serialToDate(serial: Double, date1904: Boolean): String = {
    val days = math.floor(serial).toLong
    val epoch =
      if (date1904) java.time.LocalDate.of(1904, 1, 1)
      else if (days <= 59) java.time.LocalDate.of(1899, 12, 31)
      else java.time.LocalDate.of(1899, 12, 30)
    val d = epoch.plusDays(days)
    s"${d.getDayOfMonth}.${d.getMonthValue}.${d.getYear}"
  }

  /** Numbers render as openpyxl hands them to `str()`: integral values
    * without a decimal point (a numeric site id must not become "101.0").
    */
  private def fmtNum(raw: String): String = {
    val d = raw.toDouble
    if (d == math.floor(d) && math.abs(d) < 1e15 && !raw.contains("E") &&
      !raw.contains("e")) d.toLong.toString
    else raw
  }

  private[dsl] def colIndex(letters: String): Int =
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1

  private def csvCell(s: String): String = {
    // the sheet protocol is LINE-based (SheetParser splits on newlines
    // before unquoting), so a cell with embedded newlines — a wrapped
    // comment in the ignored D+ columns, say — must not break row
    // framing; openpyxl hands the reference the same logical row either
    // way, so flatten to spaces
    val flat = s.replace("\r\n", " ").replace('\n', ' ').replace('\r', ' ')
    if (flat.exists(c => c == ',' || c == '"'))
      "\"" + flat.replace("\"", "\"\"") + "\""
    else flat
  }
}
