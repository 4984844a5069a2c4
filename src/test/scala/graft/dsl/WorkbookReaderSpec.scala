package graft.dsl

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path, Paths}

/** The `.xlsx` INPUT path: the reference's own workbooks
  * (`example_data/toimiva.xlsx`, `virheita.xlsx` — the files its
  * `analysis_collection.py:71` loads with openpyxl) parsed directly,
  * plus a writer→reader round trip pinning date-serial handling.
  */
class WorkbookReaderSpec extends AnyFunSuite {

  private def ref(name: String): Path = {
    val p = Paths.get(s"/root/reference/example_data/$name")
    assume(Files.exists(p), s"reference example $name not present")
    p
  }

  test("toimiva.xlsx parses directly, identical model to its CSV rendering") {
    val parsed = WorkbookReader.parse(ref("toimiva.xlsx"))
    assert(parsed.map(_._1) == Vector("Toimiva_setti"))
    val sheet = parsed.head._2
    assert(sheet.sheetErrors.isEmpty, sheet.sheetErrors.shortStr)
    assert(sheet.conditionErrors.isEmpty)
    val spec = sheet.spec.get
    assert(spec.timeFrom == java.time.LocalDateTime.of(2018, 2, 1, 0, 0, 0))
    assert(spec.timeUntil == java.time.LocalDateTime.of(2018, 3, 31, 23, 59, 59))
    // the workbook and its CSV rendering must produce the SAME parsed
    // conditions — the two input paths share everything downstream
    val fromCsv =
      SheetParser.parse("toimiva", Files.readString(ref("toimiva.csv"))).spec.get
    assert(spec.conditions == fromCsv.conditions)
  }

  test("virheita.xlsx: both sheets surface the same errors as their CSVs") {
    val parsed = WorkbookReader.parse(ref("virheita.xlsx")).toMap
    assert(parsed.keySet == Set("Virheet_taulukossa", "Syntaksivirheet"))

    // table-structure sheet: missing start date kills the collection
    val taulukko = parsed("Virheet_taulukossa")
    assert(taulukko.spec.isEmpty)
    assert(taulukko.sheetErrors.nonEmpty)

    // syntax sheet: duplicate identifier at sheet level + per-condition
    // diagnostics, matching the CSV rendering's parse
    val syntaksi = parsed("Syntaksivirheet")
    val sheetMsgs = syntaksi.sheetErrors.messages.mkString(" | ")
    assert(sheetMsgs.contains("Duplicate condition identifier"))
    val fromCsv = SheetParser.parse("Syntaksivirheet",
      Files.readString(ref("virheita_Syntaksivirheet.csv")))
    assert(syntaksi.sheetErrors.messages == fromCsv.sheetErrors.messages)
    assert(syntaksi.conditionErrors.keySet == fromCsv.conditionErrors.keySet)
    assert(syntaksi.spec.map(_.conditions) == fromCsv.spec.map(_.conditions))
  }

  test("writer→reader round trip: strings, numbers, date serials") {
    val dir = Files.createTempDirectory("wb_roundtrip")
    val f = dir.resolve("rt.xlsx")
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2018-02-01T00:00:00Z"))
    graft.cli.Xlsx.write(f, Seq(
      "proto" -> Seq(
        Seq(graft.cli.Xlsx.Str("start", bold = true), graft.cli.Xlsx.Str("end")),
        Seq(graft.cli.Xlsx.Ts(ts),
          graft.cli.Xlsx.Ts(java.sql.Timestamp.from(
            java.time.Instant.parse("2018-03-31T00:00:00Z")))),
        Seq(graft.cli.Xlsx.Str("a,b\"c"), graft.cli.Xlsx.Num(101.0),
          graft.cli.Xlsx.Num(0.25), graft.cli.Xlsx.Pct(0.5)))))
    val out = WorkbookReader.sheets(f)
    assert(out.map(_._1) == Vector("proto"))
    val lines = out.head._2.stripLineEnd.split("\n").toVector
    assert(lines(0) == "start,end")
    // date-styled serials come back in the protocol's d.M.yyyy form —
    // a workbook with REAL Excel date cells reads like the reference's
    // string-dated one
    assert(lines(1) == "1.2.2018,31.3.2018")
    // quoted cell survives; integral numbers don't grow a ".0"; the
    // percent style (custom 0.00 %) is NOT mistaken for a date
    assert(lines(2) == "\"a,b\"\"c\",101,0.25,0.5")
  }

  test("embedded newlines in cells don't break the line-based protocol") {
    val dir = Files.createTempDirectory("wb_newline")
    val f = dir.resolve("nl.xlsx")
    def s(v: String) = graft.cli.Xlsx.Str(v)
    graft.cli.Xlsx.write(f, Seq(
      "Demo" -> Seq(
        Seq(s("start"), s("end")),
        Seq(s("1.2.2018"), s("28.2.2018")),
        Seq(s("site"), s("master_alias"), s("condition"), s("comment")),
        Seq(s("Testi"), s("A1"), s("s1120#keli_1 = 8"),
          s("wrapped\ncomment, with a quote \" inside")),
        Seq(s("Testi"), s("A2"), s("s1120#tie_1 < 0")))))
    val parsed = SheetParser.parse("Demo", WorkbookReader.sheets(f).head._2)
    assert(parsed.sheetErrors.isEmpty, parsed.sheetErrors.shortStr)
    // the multiline comment must not have split row 4 and eaten row 5
    assert(parsed.spec.get.conditions.map(_.idString) ==
      Vector("testi_a1", "testi_a2"))
  }

  test("serial/date edge cases and helpers") {
    // 1900 system: serial 1 = 1.1.1900; the phantom 29.2.1900 shifts
    // everything from serial 61 up; 25569 = the Unix epoch day
    assert(WorkbookReader.serialToDate(1, date1904 = false) == "1.1.1900")
    assert(WorkbookReader.serialToDate(59, date1904 = false) == "28.2.1900")
    assert(WorkbookReader.serialToDate(61, date1904 = false) == "1.3.1900")
    assert(WorkbookReader.serialToDate(25569, date1904 = false) == "1.1.1970")
    // 1904 system (legacy Mac Excel): serial 0 = 1.1.1904
    assert(WorkbookReader.serialToDate(0, date1904 = true) == "1.1.1904")
    assert(WorkbookReader.colIndex("A") == 0)
    assert(WorkbookReader.colIndex("Z") == 25)
    assert(WorkbookReader.colIndex("AA") == 26)
    assert(WorkbookReader.isDateCode("d.m.yyyy"))
    assert(WorkbookReader.isDateCode("[$-F400]h:mm:ss AM/PM"))
    assert(!WorkbookReader.isDateCode("0.00 %"))
    assert(!WorkbookReader.isDateCode("General"))
    // literal text must not trigger date detection
    assert(!WorkbookReader.isDateCode("0.0\" days\""))
  }

  test("property: random string cells round-trip writer → reader exactly") {
    // seeded-random cells over a hostile charset (quotes, commas, XML
    // markup, Finnish letters, tabs, newlines); expected value applies
    // the two documented normalizations — XML-illegal control chars
    // dropped by the writer, newlines flattened by the line-based
    // protocol renderer — everything else must survive byte-for-byte
    val rng = new scala.util.Random(7)
    val alphabet = "ab\"ز,&<>äö\t\n #=_09/()'".toCharArray
    def randCell() = String.valueOf(Array.fill(rng.nextInt(12))(
      alphabet(rng.nextInt(alphabet.length))))
    def expected(s: String) = s
      .filter(c => c >= 0x20 || c == '\t' || c == '\n' || c == '\r')
      .replace("\r\n", " ").replace('\n', ' ').replace('\r', ' ')
    val dir = Files.createTempDirectory("wb_prop")
    for (round <- 1 to 25) {
      val rows = Vector.fill(1 + rng.nextInt(5))(
        Vector.fill(1 + rng.nextInt(4))(randCell()))
      val f = dir.resolve(s"prop$round.xlsx")
      graft.cli.Xlsx.write(f,
        Seq(s"S$round" -> rows.map(_.map(c => graft.cli.Xlsx.Str(c)))))
      val csv = WorkbookReader.sheets(f).head._2
      val got = csv.stripLineEnd.split("\n", -1).toVector
        .map(SheetParser.splitCsvLine)
      val want = rows.map(_.map(expected))
      // trailing empty cells/rows are not round-tripped (sparse grid);
      // compare after right-trimming empties on both sides
      def trim(vs: Vector[Vector[String]]) =
        vs.map(r => r.reverse.dropWhile(_.isEmpty).reverse)
          .reverse.dropWhile(_.isEmpty).reverse
      assert(trim(got) == trim(want), s"round $round: $rows")
    }
  }

  test("TsaBatch --input accepts an .xlsx workbook, dropping info sheets") {
    val dir = Files.createTempDirectory("wb_input")
    val f = dir.resolve("analyysi.xlsx")
    def s(v: String) = graft.cli.Xlsx.Str(v)
    graft.cli.Xlsx.write(f, Seq(
      "info" -> Seq(Seq(s("free-form notes, ignored by the loader"))),
      "Demo" -> Seq(
        Seq(s("start"), s("end")),
        Seq(s("1.2.2018"), s("28.2.2018")),
        Seq(s("site"), s("master_alias"), s("condition")),
        Seq(s("Testi"), s("A1"), s("s1120#keli_1 = 8")))))
    val sheets = graft.cli.TsaBatch.readInput(f.toString)
    assert(sheets.map(_._1) == Vector("Demo"))
    val parsed = SheetParser.parse("Demo", sheets.head._2)
    assert(parsed.sheetErrors.isEmpty, parsed.sheetErrors.shortStr)
    assert(parsed.spec.get.conditions.map(_.idString) == Vector("testi_a1"))
  }
}
